package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stream-stream interval join (the streaming form of the as-of/
  * interval join J7, SURVEY.md §2.4): purchases join clicks of the same
  * user within a bounded look-back window; watermarks on both sides
  * bound the join state.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream interval join matches clicks within the window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user", "c_id")
      .withWatermark("c_ts", "1 minute")
    val p = purchases.toDF().toDF("p_ts", "p_user", "p_id")
      .withWatermark("p_ts", "1 minute")

    val joined = p.join(c,
      expr("""p_user = c_user AND
              c_ts BETWEEN p_ts - INTERVAL 10 MINUTES AND p_ts"""))
      .select(col("p_id"), col("c_id"))

    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").start()

    clicks.addData(
      (ts("2024-01-01 00:00:00"), 1L, 100L), // within window of purchase 500
      (ts("2024-01-01 00:08:00"), 1L, 101L), // within
      (ts("2024-01-01 00:20:00"), 2L, 102L)) // other user
    purchases.addData((ts("2024-01-01 00:09:00"), 1L, 500L))
    q.processAllAvailable()

    val rows = spark.sql("SELECT p_id, c_id FROM ssj_out ORDER BY c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === Seq((500L, 100L), (500L, 101L)))
    q.stop()
  }
}

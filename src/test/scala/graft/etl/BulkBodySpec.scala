package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BulkBody: the `_bulk` wire body parsed into the CDC frame and
  * applied through the ONE CdcMerge implementation.
  */
class BulkBodySpec extends SparkSpec {
  import spark.implicits._

  test("bulk body parses to the CDC frame and merges last-writer-wins") {
    val body =
      """{"index": {"_id": 1}}
        |{"title": "first", "n": 10}
        |{"create": {"_id": 2}}
        |{"title": "second", "n": 20}
        |{"index": {"_id": 1}}
        |{"title": "first-v2", "n": 11}
        |{"delete": {"_id": 2}}
        |""".stripMargin
    val batch = BulkBody.parse(spark, body)
    assert(batch.columns.toSet === Set("_doc_id", "_action", "_seq", "title", "n"))
    // body order IS the seq: the later index of id 1 wins, id 2 ends
    // as a tombstone
    val state = CdcMerge.initialState(batch)
    val live = state.filter(!col("_deleted"))
      .select("_doc_id", "title", "n").as[(Long, String, Long)]
      .collect().toSeq
    assert(live === Seq((1L, "first-v2", 11L)))
    assert(state.filter(col("_deleted")).select("_doc_id").as[Long]
      .collect().toSeq === Seq(2L))
    // a follow-up body applies on top; startSeq keeps seqs monotonic
    val batch2 = BulkBody.parse(spark,
      """{"index": {"_id": 2}}
        |{"title": "re", "n": 21}
        |""".stripMargin, startSeq = 10L)
    val live2 = CdcMerge.applyBatch(state, batch2)
      .filter(!col("_deleted"))
      .select("_doc_id", "title").as[(Long, String)].collect().toSet
    assert(live2 === Set((1L, "first-v2"), (2L, "re")))
  }

  test("bulk body fail-loud contract") {
    def bad(body: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](BulkBody.parse(spark, body))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"update": {"_id": 1}}
          |{"doc": {"x": 1}}""".stripMargin, "partial-document")
    bad("""{"index": {}}
          |{"x": 1}""".stripMargin, "needs _id")
    bad("""{"index": {"_id": 1}}
          |{"x": 1}
          |{"index": {"_id": "a"}}
          |{"x": 2}""".stripMargin, "mixes numeric and string")
    bad("""{"index": {"_id": 1}}
          |{"_seq": 5}""".stripMargin, "reserved column")
    bad("""{"index": {"_id": 1}}""", "no source line")
    bad("""{"upsert": {"_id": 1}}
          |{"x": 1}""".stripMargin, "must be one index|create|delete")
    bad("", "empty")
    bad("""{"index": {"_id": 1, "routing": "r"}}
          |{"x": 1}""".stripMargin, "unsupported _bulk index option")
  }
}

package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HammingDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("matches bit_count(xor) on interpreted and codegen paths") {
    val df = Seq(
      (0L, 0L), (1L, 0L), (-1L, 0L), (Long.MaxValue, Long.MinValue),
      (0x5555555555555555L, 0xAAAAAAAAAAAAAAAAL), (123456789L, 987654321L))
      .toDF("a", "b")
    val rows = df.select(
      HammingDistance(col("a"), col("b")).as("hd"),
      bit_count(col("a").bitwiseXOR(col("b"))).as("ref")).collect()
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("null propagates") {
    val r = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(HammingDistance(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(100).select(
      HammingDistance(col("id"), col("id") + 1).as("hd"))
    val codegenned = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(codegenned, df.queryExecution.executedPlan.toString)
    assert(df.agg(sum("hd")).head().getLong(0) > 0)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: content identical to the input, and a conjunctive
  * two-column range query over the z-clustered layout materializes far
  * fewer rows from the parquet reader (row groups pruned via footer
  * min/max) than the same query over a single-column-sorted layout.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(flatten) ++ (p match {
        case q: QueryStageExec => flatten(q.plan)
        case _ => Nil
      }))
    flatten(root).collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes row groups on both range dimensions") {
    val n = 200000
    // two independent uniform dims — the worst case for a linear sort
    val data = spark.range(n).select(
      col("id"),
      (col("id") * 48271 % 65521).as("x"),
      (col("id") * 16807 % 65497).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    // force small row groups so pruning granularity exists at test size
    spark.conf.set("parquet.block.size", (64 * 1024).toString)
    try {
      data.repartitionByRange(16, col("x"))
        .sortWithinPartitions(col("x"))
        .write.mode("overwrite").parquet(s"$dir/by_x")
      ZOrder.write(data, Seq("x", "y"), s"$dir/z", files = 16)
    } finally spark.conf.unset("parquet.block.size")

    val zDf = spark.read.parquet(s"$dir/z")
    val xDf = spark.read.parquet(s"$dir/by_x")
    // layout preserves content exactly
    assert(zDf.count() === n.toLong)
    assert(zDf.select(sum(col("x")), sum(col("y"))).head()
      === xDf.select(sum(col("x")), sum(col("y"))).head())

    def q(df: DataFrame) = df.filter(
      col("x").between(1000, 3000) && col("y").between(1000, 3000))
    val exact = q(xDf).count()
    assert(q(zDf).count() === exact, "same answer from both layouts")

    // the x-sorted layout prunes on x only; z-order prunes on both
    val zRows = scanRows(q(zDf))
    val xRows = scanRows(q(xDf))
    assert(zRows >= exact)
    assert(zRows * 2 < xRows,
      s"z-order should materialize <1/2 of the single-sort layout's rows " +
        s"(z=$zRows vs x=$xRows, exact=$exact)")
  }
}

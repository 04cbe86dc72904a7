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

  test("empty or all-null z-columns fail loud; date columns cluster by day number") {
    val dir = java.nio.file.Files.createTempDirectory("zorder2").toString

    val empty = spark.range(0).select(col("id").as("x"), col("id").as("y"))
    val e1 = intercept[IllegalArgumentException] {
      ZOrder.write(empty, Seq("x", "y"), s"$dir/e1")
    }
    assert(e1.getMessage.contains("no non-null values"))

    val allNull = spark.range(100).select(col("id").as("x"),
      lit(null).cast("long").as("y"))
    val e2 = intercept[IllegalArgumentException] {
      ZOrder.write(allNull, Seq("x", "y"), s"$dir/e2")
    }
    assert(e2.getMessage.contains("'y'"))

    // dates: cast-to-double is NULL in Spark, so the layout must route
    // through day numbers — verify real clustering happens (a date
    // range predicate prunes) instead of every row landing in bucket 0
    val n = 100000
    val dated = spark.range(n).select(
      col("id"),
      date_add(lit(java.sql.Date.valueOf("2020-01-01")),
        (col("id") * 48271 % 1461).cast("int")).as("d"),
      (col("id") * 16807 % 65497).as("y"))
    spark.conf.set("parquet.block.size", (64 * 1024).toString)
    try ZOrder.write(dated, Seq("d", "y"), s"$dir/z", files = 16)
    finally spark.conf.unset("parquet.block.size")
    val zDf = spark.read.parquet(s"$dir/z")
    assert(zDf.count() === n.toLong)
    val q = zDf.filter(col("d").between("2020-02-01", "2020-03-01") &&
      col("y").between(1000, 3000))
    val exact = dated.filter(col("d").between("2020-02-01", "2020-03-01") &&
      col("y").between(1000, 3000)).count()
    assert(q.count() === exact)
    val zRows = scanRows(q)
    assert(zRows < n / 2,
      s"date z-clustering should prune most row groups (scanned $zRows of $n)")
  }
}

package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFns

/** KnnJoin.withinGroups: block-pair decomposed exact kNN join. The
  * kernel path (replicate → per-task bounded heaps → per-row top-k
  * merge) must equal the declarative within-group self-join + window —
  * and must not change when the block count (physical layout) does.
  */
class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  private def embeddings(n: Int, groups: Int, dims: Int = 8) =
    (0 until n).map { i =>
      (i.toLong, (i % groups).toLong,
        Array.tabulate(dims)(d => ((i * 31 + d * 7) % 13 - 6).toFloat / 6f))
    }.toDF("vec_id", "label", "embedding")

  /** Declarative reference: quantized within-group all-pairs + window. */
  private def reference(n: Int, groups: Int, k: Int) = {
    val e = embeddings(n, groups)
      .select(col("vec_id"), col("label"), VectorFns.quantize(col("embedding")).as("q"))
    val a = e.select(col("label"), col("vec_id").as("a_id"), col("q").as("qa"))
    val b = e.select(col("label"), col("vec_id").as("b_id"), col("q").as("qb"))
    val dot = VectorFns.qdot(col("qa"), col("qb")).cast("double")
    val na = sqrt(VectorFns.qdot(col("qa"), col("qa")).cast("double"))
    val nb = sqrt(VectorFns.qdot(col("qb"), col("qb")).cast("double"))
    a.join(b, Seq("label")).filter(col("a_id") =!= col("b_id"))
      .select(col("label"), col("a_id"), col("b_id"), (dot / (na * nb)).as("sim"))
      .withColumn("rank", row_number()
        .over(Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id")))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("label").as("grp"), col("a_id").as("id"), col("rank"),
        col("b_id").as("neighbor_id"), col("sim"))
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id", "rank").collect().toSeq

  test("kernel path equals the declarative within-group join + window") {
    val got = KnnJoin.withinGroups(embeddings(60, 4), "vec_id", "embedding",
      "label", k = 3)
    assert(sortedRows(got) === sortedRows(reference(60, 4, 3)))
  }

  test("result is invariant to the block count (physical layout)") {
    val e = embeddings(60, 4)
    val b2 = KnnJoin.withinGroups(e, "vec_id", "embedding", "label", k = 3, blocks = 2)
    val b7 = KnnJoin.withinGroups(e, "vec_id", "embedding", "label", k = 3, blocks = 7)
    assert(sortedRows(b2) === sortedRows(b7))
  }

  test("groups smaller than k emit all their neighbors, no padding") {
    // 10 rows in 5 groups → each group has 2 rows → exactly 1 neighbor each
    val got = KnnJoin.withinGroups(embeddings(10, 5), "vec_id", "embedding",
      "label", k = 3)
    val rows = sortedRows(got)
    assert(rows.length === 10)
    assert(rows.forall(_.getAs[Long]("rank") === 1L))
  }
}

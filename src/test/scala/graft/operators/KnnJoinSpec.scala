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

  test("string group keys work and the original values come back out") {
    val names = Array("english", "french", "german", "dutch")
    val e = embeddings(60, 4)
      .withColumn("lang", element_at(
        array(names.toIndexedSeq.map(lit): _*), (col("label") + 1).cast("int")))
      .drop("label")
    val got = KnnJoin.withinGroups(e, "vec_id", "embedding", "lang", k = 3)
    val ref = reference(60, 4, 3).collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        (names(r.getLong(0).toInt), r.getLong(3), r.getDouble(4))).toMap
    val gotRows = got.collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        (r.getString(0), r.getLong(3), r.getDouble(4))).toMap
    assert(gotRows === ref)
  }

  test("zero-norm vectors are skipped: no output row, never a neighbor") {
    val e = embeddings(20, 2)
      .union(Seq(
        (100L, 0L, Array.fill(8)(0f)),
        (101L, 1L, Array.fill(8)(0f))).toDF("vec_id", "label", "embedding"))
    val got = KnnJoin.withinGroups(e, "vec_id", "embedding", "label", k = 3)
    val ids = got.select("id").as[Long].collect().toSet
    val nbrs = got.select("neighbor_id").as[Long].collect().toSet
    assert(!ids(100L) && !ids(101L), "zero-norm rows must emit nothing")
    assert(!nbrs(100L) && !nbrs(101L), "zero-norm rows must never be neighbors")
    // and the non-zero rows are unaffected
    assert(sortedRows(got) === sortedRows(
      KnnJoin.withinGroups(embeddings(20, 2), "vec_id", "embedding", "label", k = 3)))
  }

  test("approx join with every bucket probed equals the exact join") {
    // nprobe = 2^signDims probes ALL buckets: the approximation's only
    // deviation is probe coverage, so full coverage must reproduce the
    // exact kernel bit-for-bit (same quantize/dot/norm/tie contracts)
    val got = KnnJoin.approxWithinGroups(embeddings(60, 4), "vec_id",
      "embedding", "label", k = 3, signDims = 2, nprobe = 4)
    assert(sortedRows(got) === sortedRows(reference(60, 4, 3)))
  }

  test("approx join: measured recall, bounded output, skipped zero-norms") {
    val e = embeddings(120, 3)
    val exact = reference(120, 3, 3).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSet
    val approx = KnnJoin.approxWithinGroups(e, "vec_id", "embedding",
      "label", k = 3, signDims = 4, nprobe = 2)
    val gotPairs = approx.collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSet
    val recall = gotPairs.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.25, s"recall@3 vs exact = $recall")
    // every row emits at most k, ranks are 1..n dense
    val byId = approx.collect().groupBy(r => r.getLong(1))
    assert(byId.values.forall(_.length <= 3))
    assert(byId.values.forall(rs =>
      rs.map(_.getAs[Long]("rank")).sorted.toSeq ===
        (1L to rs.length).toSeq))
    // zero-norm rows: no output row, never a neighbor
    val withZero = e.union(Seq((200L, 0L, Array.fill(8)(0f)))
      .toDF("vec_id", "label", "embedding"))
    val gz = KnnJoin.approxWithinGroups(withZero, "vec_id", "embedding",
      "label", k = 3, signDims = 4, nprobe = 2)
    assert(!gz.select("id").as[Long].collect().toSet.contains(200L))
    assert(!gz.select("neighbor_id").as[Long].collect().toSet.contains(200L))
    // validation
    val bad = intercept[IllegalArgumentException](
      KnnJoin.approxWithinGroups(e, "vec_id", "embedding", "label",
        k = 3, signDims = 4, nprobe = 17))
    assert(bad.getMessage.contains("nprobe must be"))
  }

  test("approx join: string group keys restore original values") {
    val names = Array("english", "french", "german", "dutch")
    val e = embeddings(60, 4)
      .withColumn("lang", element_at(
        array(names.toIndexedSeq.map(lit): _*), (col("label") + 1).cast("int")))
      .drop("label")
    val got = KnnJoin.approxWithinGroups(e, "vec_id", "embedding", "lang",
      k = 3, signDims = 2, nprobe = 4)
    val ref = reference(60, 4, 3).collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        (names(r.getLong(0).toInt), r.getLong(3), r.getDouble(4))).toMap
    val gotRows = got.collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        (r.getString(0), r.getLong(3), r.getDouble(4))).toMap
    assert(gotRows === ref)
  }

  test("the same id in two groups keeps separate pools and correct group labels") {
    // ids 0..9 appear in BOTH groups with different vectors; an id-only
    // window or restore join would merge their candidate pools or
    // cross-label them
    def v(seed: Int) = Array.tabulate(8)(d => ((seed * 31 + d * 7) % 13 - 6).toFloat / 6f)
    val rows =
      (0 until 10).map(i => (i.toLong, "en", v(i))) ++
      (0 until 10).map(i => (i.toLong, "fr", v(i + 100)))
    val e = rows.toDF("vec_id", "lang", "embedding")
    val got = KnnJoin.withinGroups(e, "vec_id", "embedding", "lang", k = 3)

    // per (group, id): exactly k neighbors, ranks 1..k, neighbors from
    // the SAME group's id set and never itself
    val byGroup = got.collect().groupBy(r => (r.getString(0), r.getLong(1)))
    assert(byGroup.keySet === (0 until 10).flatMap(i =>
      Seq(("en", i.toLong), ("fr", i.toLong))).toSet)
    byGroup.foreach { case ((g, id), rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === Seq(1L, 2L, 3L),
        s"($g,$id) must have ranks 1..3")
      assert(rs.forall(_.getAs[Long]("neighbor_id") != id))
    }
    // and each group's result equals running that group alone
    for (g <- Seq("en", "fr")) {
      val alone = KnnJoin.withinGroups(
        e.filter(col("lang") === g), "vec_id", "embedding", "lang", k = 3)
      assert(sortedRows(got.filter(col("grp") === g)) === sortedRows(alone))
    }
  }
}

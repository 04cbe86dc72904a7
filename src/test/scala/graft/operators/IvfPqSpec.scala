package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** IVF-PQ contracts: the codes really are m bytes (the 16× compression
  * claim at m=16/dims=64), training is deterministic (same corpus,
  * same partitioning → same model, the property that makes index
  * rebuilds reproducible), and ADC serving over codes stays close to
  * the exact-vector IVF ceiling — PQ is lossy by design, so recall IS
  * its correctness metric.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
  private val p = IvfPq.Params(nlist = 16, nprobe = 4, iters = 3, k = 5,
    m = 16, codes = 256)

  test("encode emits one cluster id + m bytes per vector") {
    val model = IvfPq.trainModel(emb, "vec_id", "embedding", p)
    assert(model.cents.length === p.nlist)
    assert(model.books.length === p.m)
    assert(model.books.forall(_.length === p.codes))
    val enc = IvfPq.encode(emb, "vec_id", "embedding", model)
    val rows = enc.collect()
    assert(rows.length === emb.count())
    assert(rows.forall(_.getAs[Array[Byte]]("code").length === p.m))
    assert(rows.forall { r =>
      val c = r.getAs[Int]("cluster"); c >= 0 && c < p.nlist
    })
  }

  test("training is deterministic for a fixed input partitioning") {
    // NOT across repartitionings: float partial sums combine in fixed
    // pid order, so a different partition layout legitimately shifts
    // low-order bits — rebuild reproducibility is the real contract
    val m1 = IvfPq.trainModel(emb, "vec_id", "embedding", p)
    val m2 = IvfPq.trainModel(emb, "vec_id", "embedding", p)
    assert(m1.cents.map(_.toSeq).toSeq === m2.cents.map(_.toSeq).toSeq)
    assert(m1.books.map(_.map(_.toSeq).toSeq).toSeq ===
      m2.books.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("serving a partitionBy(cluster) code layout prunes unprobed clusters") {
    val model = IvfPq.trainModel(emb, "vec_id", "embedding", p)
    val enc = IvfPq.encode(emb, "vec_id", "embedding", model)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    enc.write.partitionBy("cluster").parquet(s"$dir/codes")
    val layout = spark.read.parquet(s"$dir/codes")
    val queries = emb.filter(col("vec_id") < 3)
    val served = IvfPq.topK(layout, queries, "vec_id", "embedding", model, p)
    val servedRows = served.collect().toSeq
    val memRows = IvfPq.topK(enc, queries, "vec_id", "embedding", model, p)
      .collect().toSeq
    assert(servedRows.nonEmpty)
    assert(servedRows === memRows,
      "layout serving must match in-memory encoded serving bit-for-bit")
    // the cluster IN (...) filter must prune at the parquet scan:
    // 3 queries × 4 probes touch ≤ 12 of the 16 cluster directories
    val root = served.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case pl => pl
    }
    def flatten(pl: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      pl +: (pl.children.flatMap(flatten) ++ (pl match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => flatten(q.plan)
        case _ => Nil
      }))
    val scans = flatten(root).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.exists(_.partitionFilters.nonEmpty),
      s"no partition filter on the code scan:\n${scans.headOption}")
  }

  test("ADC serving stays near the exact-vector IVF recall ceiling") {
    val model = IvfPq.trainModel(emb, "vec_id", "embedding", p)
    val enc = IvfPq.encode(emb, "vec_id", "embedding", model)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val got = IvfPq.topK(enc, queries, "vec_id", "embedding", model, p)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = AnnTopK.bruteForce(
        emb, "vec_id", "embedding", col("vec_id") % 50 === 0, p.k)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = IvfIndex.topK(emb, "vec_id", "embedding", col("vec_id") % 50 === 0,
        IvfIndex.Params(p.nlist, p.nprobe, p.iters, p.k))
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recallPq = (exact & got).size.toDouble / exact.size
    val recallIvf = (exact & ivf).size.toDouble / exact.size
    // measured: pq 0.50 vs ivf ceiling 0.56 — the coarse probe, not
    // the 8-bit code quantization, dominates the loss
    assert(recallPq >= 0.45, s"IVF-PQ recall@5 = $recallPq")
    assert(recallPq >= recallIvf - 0.15,
      s"code quantization cost too high: pq=$recallPq ivf=$recallIvf")
    assert(got.size === exact.size, "every query must return k rows")
  }
}

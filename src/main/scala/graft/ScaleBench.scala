package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve evidence for the dedup family: times the dedup
  * headline queries at sf0.1 and at a deterministic 10× replica,
  * reporting per-query growth factors and the skew-guard counters.
  * Sub-quadratic scaling = growth ≪ 100× at 10× the rows.
  *
  * The replica is an id-offset union of 10 PERTURBED copies — replica
  * k prefixes every token with `r<k>·` (documents) / rotates the
  * embedding dimensions by k (embeddings). Perturbation matters: a
  * verbatim 10× copy makes every document a 10-way exact duplicate,
  * so the requested pair OUTPUT itself grows ~100× and no engine
  * could show sub-quadratic time. Perturbed replicas share no
  * shingles (and no ε-balls) across copies, so the true output grows
  * ~10× and wall-time growth measures the ENGINE, not the task.
  * Replica 0 is pristine — the base workload is a strict subset.
  *
  * Usage: `runMain graft.ScaleBench [baseDir] [workDir]`; prints one
  * JSON line (also written to `scale_last.json`) with per-query
  * seconds (min of `SPARK_GRAFT_SCALE_PASSES`, default 2, after one
  * warm-up), the 10×/base growth ratio, and the hot-bucket guard
  * counters at 10×.
  */
object ScaleBench {

  private val queries =
    Seq("q71_dedup_ngram_jaccard", "q72_dedup_minhash_lsh",
      "q77_dedup_clusters", "q79_semantic_dedup", "q83_paragraph_dedup")

  private def buildReplica(spark: SparkSession, baseDir: String,
      workDir: String, copies: Int): Unit = {
    val off = 10000000L
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    (0 until copies).map { k =>
      if (k == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(k * off))
        .withColumn("text",
          array_join(transform(split(col("text"), " "),
            t => concat(lit(s"r${k}·"), t)), " "))
    }.reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$workDir/documents.parquet")

    val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
    (0 until copies).map { k =>
      if (k == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(k * off))
        .withColumn("embedding",
          transform(col("embedding"), (_, i) =>
            element_at(col("embedding"),
              pmod(i + lit(k), size(col("embedding"))) + 1)))
    }.reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$workDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft_scale10")
    val passes = sys.env.getOrElse("SPARK_GRAFT_SCALE_PASSES", "2").toInt
    val spark = GraftSession.get()

    if (!new java.io.File(s"$workDir/embeddings.parquet").exists())
      buildReplica(spark, baseDir, workDir, copies = 10)

    def time(q: GraftQuery, dir: String): Double = {
      val t0 = System.nanoTime()
      q.run(spark, dir).queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    def bench(dir: String): Map[String, Double] = {
      val qs = queries.map(Registry.byName)
      qs.foreach(time(_, dir)) // warm-up pass
      val samples = (1 to passes).map(_ => qs.map(time(_, dir)))
      queries.zipWithIndex.map { case (n, i) =>
        n -> samples.map(_(i)).min
      }.toMap
    }

    val base = bench(baseDir)
    val x10 = bench(workDir)

    // guard counters at 10×: non-empty means the caps are earning keep
    val docs10 = spark.read.parquet(s"$workDir/documents.parquet")
    val emb10 = spark.read.parquet(s"$workDir/embeddings.parquet")
    val lshHot = graft.operators.MinHashLsh.hotBuckets(
      docs10, "doc_id", "text", maxBucket = 4096).count()
    val semHot = graft.operators.SemanticDedup.hotBuckets(
      emb10, "vec_id", "embedding", threshold = 0.3).count()
    val semBuckets = graft.operators.SemanticDedup.bucketIds(
        emb10, "vec_id", "embedding")
      .groupBy(col("cid")).count()
      .agg(max(col("count"))).head().getLong(0)

    def fmt(m: Map[String, Double]): String =
      queries.map(n => s""""$n":${f"${m(n)}%.2f"}""").mkString("{", ",", "}")
    val growth = queries.map(n =>
      s""""$n":${f"${x10(n) / base(n)}%.1f"}""").mkString("{", ",", "}")
    val json =
      s"""{"metric":"scale10_dedup","unit":"sec","passes":$passes,""" +
      s""""base_sec":${fmt(base)},"x10_sec":${fmt(x10)},"growth_x":$growth,""" +
      s""""guards":{"lsh_hot_buckets":$lshHot,"sem_hot_buckets":$semHot,""" +
      s""""sem_max_bucket":$semBuckets}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("scale_last.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}

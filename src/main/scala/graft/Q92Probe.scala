package graft
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r16 watch-item 5 / next-round 8): q92's two
  * candidate shuffle shapes measured against the same corpus —
  * (a) the shipped shape: ONE doc-keyed exchange of the COMPACT
  * documents, explode + both aggregates fused post-shuffle;
  * (b) the partial-agg shape: explode at the scan, map-side partial
  * aggregation, shuffle (doc_id, tok_hash, c) triples, then a second
  * exchange for the per-doc fold. Prints min seconds of each over
  * SPARK_GRAFT_PROBE_PASSES (default 3). Honors SPARK_GRAFT_SF_DIR.
  */
object Q92Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3").toInt
    val d = graft.sources.Tables.load(spark, dir, "documents")
    def entropyAgg(c: org.apache.spark.sql.DataFrame) = c
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(round(col("c").cast("double") * log(col("c").cast("double")), 9)
          .cast("decimal(28,9)")).as("clogc"),
        sum(col("c") * (col("c") - 1L)).as("coll"))
    def shipped() = entropyAgg(
      d.select(col("doc_id"), col("text"))
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), xxhash64(col("tok")).as("tok"))
        .agg(count(lit(1)).as("c")))
    def partialAgg() = entropyAgg(
      d.select(col("doc_id"),
          explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), xxhash64(col("tok")).as("tok"))
        .agg(count(lit(1)).as("c")))
    def time(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    time(shipped()); time(partialAgg()) // warm-up
    val a = (1 to passes).map(_ => time(shipped())).min
    val b = (1 to passes).map(_ => time(partialAgg())).min
    println(f"[q92probe] dir=$dir compact_docs_shuffle=$a%.3f s partial_agg_triples=$b%.3f s")
    spark.stop()
  }
}

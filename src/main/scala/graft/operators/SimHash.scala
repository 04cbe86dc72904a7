package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** SimHash near-duplicate pairs — banded block join (pigeonhole-
  * complete for hamming ≤ 3), with the per-document fingerprint in a
  * primitive partition kernel.
  *
  * Why the kernel (same measured rationale as CosinePairs/MinHashLsh):
  * the declarative `TextFns.simhash60` unrolls 60 interpreted
  * `aggregate` HOFs that each re-evaluate the inline md5 array — at
  * sf0.1 that was 33 s of CPU for 5k docs. Here each document computes
  * its ~200 md5s exactly once and accumulates 60 counters in a tight
  * loop. The fingerprint is bit-identical to the declarative form and
  * to the DuckDB oracle: per token, the 60-bit value is the first 15
  * hex chars of md5(token) (`('0x' || substr(md5(s),1,15))::BIGINT`);
  * bit b of the fingerprint is the sign of the ±1 vote sum at bit b.
  *
  * Candidate generation stays declarative: explode 4×15-bit blocks,
  * equi-join on (block, value), verify with the codegen'd
  * `hamming_distance` POPCNT expression. Shuffle volume is
  * O(docs × 4 blocks) + O(block-sharing candidates) — never all pairs.
  */
object SimHash {

  /** First 60 bits of md5 (15 hex chars), matching
    * `TextFns.md5hash60` / the oracle's hex-substr parse.
    */
  private[operators] def md5hash60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  private[operators] def simhash60(md: java.security.MessageDigest,
      text: String): Long = {
    val tok = text.split(" ", -1)
    val votes = new Array[Int](60)
    var i = 0
    while (i < tok.length) {
      val h = md5hash60(md, tok(i))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) >= 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** (doc_id, fp) — one kernel pass over the corpus. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) => (id, simhash60(md, text)) }
      }
      .toDF("doc_id", "fp")
  }

  /** Near-dup pairs with hamming(fp_a, fp_b) ≤ maxDist (complete for
    * maxDist ≤ 3 via the 4-block pigeonhole).
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val f = fingerprints(docs, idCol, textCol)
    val blocks = f
      .select(col("doc_id"), col("fp"),
        explode(TextFns.simhashBlocks(col("fp"))).as("b"))
      .select(col("doc_id"), col("fp"), col("b.blk").as("blk"), col("b.v").as("v"))
      // one explicit exchange on the join key that BOTH sides of the
      // self-join share (AQE exchange reuse): without it the planner
      // broadcasts one side, neither side carries a shuffle, and the
      // md5 fingerprint kernel (~200 digests/doc — the dominant cost)
      // runs twice, scanning the corpus twice (r16 opt: final plan
      // showed 2 FileScans, 0 reuse). The shuffle moves 4 narrow rows
      // per doc — far cheaper than a second kernel pass at any scale.
      .repartition(col("blk"), col("v"))
    blocks.as("x").join(blocks.as("y"), Seq("blk", "v"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.fp").as("a_fp"), col("y.fp").as("b_fp"))
      .distinct()
      .withColumn("dist", TextFns.hamming(col("a_fp"), col("b_fp")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
  }
}

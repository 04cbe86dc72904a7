package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.SemanticDedup

/** Streaming SEMANTIC dedup — the embedding-space mirror of
  * [[StreamingDedup]]: each arriving microbatch of vectors is deduped
  * (a) within itself (SemDeDup greedy ε-ball, [[SemanticDedup]]) and
  * (b) against every previously-accepted vector, then survivors join
  * the accepted corpus. The accepted corpus doubles as the probe
  * index: it is written `partitionBy("cid")` on the same deterministic
  * sign-bucket ids the in-batch pass uses, so a probe reads ONLY the
  * (≤ 2^signDims) bucket partitions the batch actually touches — a
  * pruned parquet scan, not a corpus scan.
  *
  * Per epoch:
  *  1. intra-batch SemDeDup pass: drop any vector with a lower-id
  *     in-bucket neighbor at cosine ≥ `threshold`;
  *  2. replay guard: exact ids already accepted never re-enter (an
  *     at-least-once epoch replay converges to the same accepted set —
  *     same contract and reasoning as [[StreamingDedup]]);
  *  3. cross-batch probe: survivors join accepted rows of their own
  *     buckets; the cosine runs in the codegen'd
  *     [[graft.plans.CosineSim]] expression (bit-identical to the
  *     batch kernel's quantized-integer math), any hit ≥ `threshold`
  *     drops the newcomer — arrival order decides, as in any
  *     first-wins stream;
  *  4. append survivors (vector + cid) to the bucket-partitioned
  *     accepted corpus.
  *
  * Single append per epoch (the corpus IS the index), so unlike
  * [[StreamingDedup]] there is no two-write crash window; the
  * `localCheckpoint` below only pins the pre-append snapshot so the
  * write cannot recompute against its own output.
  *
  * Scale: per-epoch cost is the in-batch SemDeDup shape plus
  * |batch| × (probed-bucket rows) codegen'd cosines; nothing ever
  * shuffles or rescans the full accepted corpus. Degenerate buckets
  * are the same exposure as batch SemDeDup — raise signDims.
  */
object StreamingSemanticDedup {

  def start(vecs: DataFrame, idCol: String, embCol: String,
      acceptedPath: String, checkpoint: String,
      threshold: Double = 0.9, signDims: Int = 4): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, idCol, embCol, acceptedPath, threshold, signDims)
      }
      .start()

  /** One epoch — also the batch-mode backfill entry. `idCol` must be
    * LongType (it is the join/replay key).
    */
  def processBatch(batch: DataFrame, idCol: String, embCol: String,
      acceptedPath: String, threshold: Double, signDims: Int = 4): Unit = {
    val spark = batch.sparkSession
    // at-least-once sources can redeliver a row WITHIN one batch; two
    // copies of the same id would both survive the ε-ball pass (the
    // lower-id-wins rule never fires on equal ids) and double-append
    val b = batch.select(col(idCol).cast("long").as(idCol), col(embCol))
      .dropDuplicates(idCol)

    // 1. intra-batch SemDeDup greedy pass (kept = no lower-id in-bucket
    // neighbor within ε)
    val asg = SemanticDedup.assignments(b, idCol, embCol, threshold, signDims)
    val intra = b.join(
      asg.filter(col("kept") === 1L).select(col("vec_id").as(idCol)),
      Seq(idCol), "left_semi")

    // 2. replay guard: accepted ids never re-enter
    val exists = Files.exists(Paths.get(acceptedPath))
    val fresh =
      if (!exists) intra
      else intra.join(
        spark.read.parquet(acceptedPath).select(col(idCol)),
        Seq(idCol), "left_anti")

    // bucket ids: step 1's assignments already carry cid — reuse them
    // instead of a second quantize+cidOf pass. localCheckpoint: the
    // probe evaluates this plan three times (cid collect, hits join,
    // anti-join) — without it each evaluation would re-run the accepted
    // read + both joins above on every micro-batch
    val freshC = fresh.join(
        asg.select(col("vec_id").as(idCol), col("cid")), Seq(idCol))
      .localCheckpoint(true)
    try {
      // 3. cross-batch probe: pruned read of only the touched buckets
      // (cid is the partition column; ≤ 2^signDims literals by
      // construction, so this collect is bounded)
      val survivors =
        if (!exists) freshC
        else {
          val probeCids = freshC.select(col("cid")).distinct()
            .collect().map(_.getLong(0))
          if (probeCids.isEmpty) freshC
          else {
            val acc = spark.read.parquet(acceptedPath)
              .filter(col("cid").isin(probeCids.toIndexedSeq: _*))
              .select(col("cid"), col(embCol).as("_acc_emb"))
            val hits = freshC.join(acc, Seq("cid"))
              .filter(graft.plans.CosineSim(col(embCol), col("_acc_emb"))
                >= lit(threshold))
              .select(col(idCol)).distinct()
            freshC.join(hits, Seq(idCol), "left_anti")
          }
        }

      // 4. single append, bucket-partitioned; localCheckpoint pins the
      // pre-append snapshot (the plan reads acceptedPath it appends to)
      val out = survivors.localCheckpoint(true)
      try {
        if (!out.isEmpty)
          out.write.mode("append").partitionBy("cid").parquet(acceptedPath)
      } finally out.unpersist()
    } finally freshC.unpersist()
  }
}

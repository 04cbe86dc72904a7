package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
  * Data-efficient learning at web-scale through semantic
  * deduplication"): cluster the embedding space coarsely, then mark as
  * duplicates the documents that sit within a cosine ε-ball of an
  * earlier-kept document *in the same cluster*. Cross-cluster near-dups
  * are deliberately out of contract — that locality is what makes the
  * pass sub-quadratic, exactly as in the paper (k-means clusters there,
  * deterministic sign-hyperplane buckets here so the whole pass is
  * reproducible in portable SQL and DuckDB-oracle-checkable, q79).
  *
  * Marking rule (greedy keep-first, made order-deterministic by id):
  * a vector is removed iff some lower-id vector in its bucket has
  * cosine ≥ `threshold` to it; its representative is the *minimum*
  * such lower id, else itself. One rule, one pass — no iteration, so
  * unlike connected-components clustering ([[DedupClusters]]) the
  * output needs no convergence loop.
  *
  * Distribution shape: bucket ids are a scan-time projection (exact
  * integer group sums, [[SignIvf.cidOf]]); in-bucket pairs run through
  * [[CosinePairs.bucketedPairs]] — per-bucket block-pair decomposition,
  * so per-reduce-group memory is ≈ 2·|bucket|/blocks vectors regardless
  * of bucket size, and the only shuffles are the blocks× replication
  * and the final rep aggregation. At 100 TB: raise `signDims` (buckets
  * = 2^signDims, in-bucket pair work falls quadratically with bucket
  * size) and `blocks`; both knobs are independent of the data layout.
  */
object SemanticDedup {

  /** (idCol, cid) sign-bucket assignment per vector — the scan-time
    * projection [[assignments]] buckets by, exposed so callers (the
    * streaming dedup probe, partition-pruned accepted layouts) can
    * co-locate data on the identical bucket ids.
    */
  def bucketIds(e: DataFrame, idCol: String, embCol: String,
      signDims: Int = 4): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val sd = signDims
    e.select(col(idCol).cast("long"), VectorFns.quantize(col(embCol)))
      .as[(Long, Array[Long])]
      .map { case (id, v) => (id, SignIvf.cidOf(v, sd).toLong) }
      .toDF(idCol, "cid")
  }

  /** One row per input vector: (vec_id, cid, kept ∈ {0,1}, rep_id). */
  def assignments(e: DataFrame, idCol: String, embCol: String,
      threshold: Double, signDims: Int = 4, blocks: Int = 8): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val sd = signDims

    val bucketed = e
      .select(col(idCol).cast("long"), VectorFns.quantize(col(embCol)))
      .as[(Long, Array[Long])]
      .map { case (id, v) => (id, v, SignIvf.cidOf(v, sd)) }
      // both the pair kernel and the final assignment join read it
      .persist()

    val pairs = CosinePairs.bucketedPairs(bucketed, threshold, blocks)

    // rep(v) = min lower-id in-bucket near neighbor; pairs are already
    // oriented a_id < b_id, so only the b side can be removed
    val reps = pairs.groupBy(col("b_id").as("vec_id"))
      .agg(min(col("a_id")).as("rep"))

    val out = bucketed
      .map(t => (t._1, t._3))
      .toDF("vec_id", "cid")
      .join(reps, Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        col("cid").cast("long"),
        when(col("rep").isNull, 1L).otherwise(0L).as("kept"),
        coalesce(col("rep"), col("vec_id")).as("rep_id"))
      // corpus-cardinality but narrow (4 scalar longs/row, no vectors):
      // materializing it lets the far heavier quantized-vector cache be
      // released before returning
      .localCheckpoint(true)
    bucketed.unpersist()
    out
  }
}

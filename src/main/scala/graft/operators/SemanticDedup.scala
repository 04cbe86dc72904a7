package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
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
  * Skew hardening — the same two guards [[MinHashLsh.nearDupPairs]]
  * carries, transferred to the embedding side:
  *
  *  - '''Exact-duplicate collapse.''' Vectors with byte-identical
  *    quantized form ([[VectorFns.quantize]] is exact-integer, so
  *    "identical embedding" is a well-defined equality) are collapsed
  *    to their min-id representative before the pair kernel; a
  *    degenerate bucket of B identical crawl embeddings would
  *    otherwise score B²/2 pairs. The re-expansion is EXACT, not a
  *    recall trade: identical vectors have identical cosines to every
  *    candidate, and the output only needs the *minimum* qualifying
  *    lower id, so a member's answer is
  *    `coalesce(min neighbor-rep below own rep, own group rep)` — see
  *    [[assignments]]. Groups whose self-cosine falls below
  *    `threshold` (zero vectors → NaN; thresholds within 1 ulp of 1.0)
  *    are NOT collapsed — each member enters the kernel alone, so the
  *    fallback is the exact uncollapsed semantics.
  *  - '''Hot-bucket cap.''' A sign-bucket still holding more than
  *    `maxBucket` *distinct-vector* representatives (near-identical
  *    but not byte-identical embeddings) is dropped from the pair
  *    kernel — a counted recall cap, observable via [[hotBuckets]].
  *    Members of a capped bucket keep their exact-duplicate collapse
  *    (those removals are cosine-1.0-safe by construction) but skip
  *    cross-group ε-ball marking. Default 8192 reps bounds any
  *    bucket's pair fan-out at ~34M kernel pairs (~0.3 s of one core).
  *
  * Distribution shape: bucket ids are a scan-time projection (exact
  * integer group sums, [[SignIvf.cidOf]]); the collapse is one hash
  * aggregation on a 128-bit fingerprint (md5 of the quantized bytes —
  * collision ~2⁻¹²⁸ per pair, the same contract as the LSH collapse);
  * in-bucket rep pairs run through [[CosinePairs.bucketedPairs]] —
  * per-bucket block-pair decomposition, so per-reduce-group memory is
  * ≈ 2·|bucket reps|/blocks vectors regardless of bucket size, and the
  * only shuffles are the collapse, the blocks× rep replication and the
  * final assignment joins. At 100 TB: raise `signDims` (buckets =
  * 2^signDims, in-bucket pair work falls quadratically with bucket
  * size) and `blocks`; identical-vector floods are absorbed by the
  * collapse and near-identical floods by the cap — both knobs are
  * independent of the data layout.
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

  /** (vec_id, v, cid, fp, self_near) — quantized vectors with their
    * sign bucket and collapse fingerprint. `fp` is md5 of the quantized
    * bytes when the vector's self-cosine clears `threshold` (so equal
    * vectors are provable ε-duplicates of each other), else a unique
    * per-id tag that makes the group a singleton.
    */
  private def fingerprinted(e: DataFrame, idCol: String, embCol: String,
      threshold: Double, signDims: Int): Dataset[(Long, Array[Long], Int, String, Boolean)] = {
    val spark = e.sparkSession
    import spark.implicits._
    val sd = signDims
    val t = threshold
    e.select(col(idCol).cast("long"), VectorFns.quantize(col(embCol)))
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, v) =>
          var s = 0L
          var d = 0
          while (d < v.length) { s += v(d) * v(d); d += 1 }
          // the exact float the pair kernel would produce for this
          // vector against its own copy — collapse only when that
          // pair would fire
          val nrm = math.sqrt(s.toDouble)
          val selfNear = s > 0L && (s.toDouble / (nrm * nrm)) >= t
          val fp = if (!selfNear) "z:" + id
          else {
            md.reset()
            val bb = java.nio.ByteBuffer.allocate(v.length * 8)
            v.foreach(bb.putLong)
            val hex = md.digest(bb.array()).map("%02x".format(_)).mkString
            hex
          }
          (id, v, SignIvf.cidOf(v, sd), fp, selfNear)
        }
      }
  }

  /** One row per input vector: (vec_id, cid, kept ∈ {0,1}, rep_id). */
  def assignments(e: DataFrame, idCol: String, embCol: String,
      threshold: Double, signDims: Int = 4, blocks: Int = 8,
      maxBucket: Int = 8192): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._

    // read once — the group aggregate carries every member id in a
    // collect_list, so re-expansion is an explode over the (persisted)
    // groups instead of a second corpus scan + fp join (r16 opt: the
    // old shape scanned and re-quantized the corpus twice and paid an
    // fp-keyed join to hand members their rep — 2 of the 12 Spark jobs
    // a single q79 run fired). member ids cost 8 bytes/vector in the
    // one collapse shuffle the pass already makes.
    val fged = fingerprinted(e, idCol, embCol, threshold, signDims)
      .toDF("vec_id", "v", "cid", "fp", "self_near")

    // exact collapse: one representative (min id) per distinct
    // quantized vector; `first` is safe — every v in an fp group is
    // byte-identical (modulo an md5 collision, ~2^-128 per pair).
    // collect_list also moves the whole aggregate from the
    // SortAggregate fallback (array-typed `first` buffer is immutable
    // in UnsafeRow) to ObjectHashAggregate — no corpus sort.
    val groups = fged.groupBy(col("fp"))
      .agg(min(col("vec_id")).as("rep_id"), first(col("v")).as("v"),
        first(col("cid")).as("cid"),
        collect_list(col("vec_id")).as("member_ids"))
      // read up to three times: bucket sizes, the kernel, the member
      // re-expansion
      .persist()

    // hot-bucket cap on POST-collapse rep count: there are at most
    // 2^signDims buckets, so the size table is a 16-ish-row aggregate
    // broadcast into a semi-join — never a window sort over the
    // vectors, and no extra driver action
    val okBuckets = groups.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_reps"))
      .filter(col("n_reps") <= maxBucket)
      .select(col("cid"))
    val inKernel = groups.join(broadcast(okBuckets), Seq("cid"), "left_semi")

    val pairs = CosinePairs.bucketedPairs(
      inKernel.select(col("rep_id"), col("v"), col("cid"))
        .as[(Long, Array[Long], Int)],
      threshold, blocks)

    // low(G) = min neighbor-group rep BELOW G's own rep (pairs are
    // oriented a_id < b_id, so grouping the b side gives exactly that).
    // A member v of group G is removed iff some lower in-bucket id is
    // ε-near it; candidates are members of near groups and (when
    // self_near) own-group members, every group's min member is its
    // rep, and non-rep members only exist when self_near — so the
    // minimum qualifying lower id is always coalesce(low, rep_id),
    // and only the rep itself with null low is kept. This reproduces
    // the uncollapsed pass bit-for-bit.
    val low = pairs.groupBy(col("b_id").as("rep_id"))
      .agg(min(col("a_id")).as("low"))

    val out = groups
      .select(col("rep_id"), col("cid"), explode(col("member_ids")).as("vec_id"))
      .join(low, Seq("rep_id"), "left")
      .select(
        col("vec_id"),
        col("cid").cast("long"),
        when(col("vec_id") === col("rep_id") && col("low").isNull, 1L)
          .otherwise(0L).as("kept"),
        coalesce(col("low"), col("rep_id")).as("rep_id"))
      // corpus-cardinality but narrow (4 scalar longs/row, no vectors):
      // materializing it lets the far heavier quantized-vector cache be
      // released before returning
      .localCheckpoint(true)
    groups.unpersist()
    out
  }

  /** Diagnostic view of what [[assignments]]' hot-bucket cap drops:
    * (cid, n_reps) for every sign bucket holding more than `maxBucket`
    * distinct-vector representatives at this threshold. Empty on a
    * healthy corpus; non-empty means near-identical-but-not-equal
    * embeddings are slipping past exact collapse and costing recall —
    * raise signDims or maxBucket.
    */
  def hotBuckets(e: DataFrame, idCol: String, embCol: String,
      threshold: Double, signDims: Int = 4, maxBucket: Int = 8192): DataFrame =
    fingerprinted(e, idCol, embCol, threshold, signDims)
      .toDF("vec_id", "v", "cid", "fp", "self_near")
      .groupBy(col("cid")).agg(count_distinct(col("fp")).as("n_reps"))
      .filter(col("n_reps") > maxBucket)
}

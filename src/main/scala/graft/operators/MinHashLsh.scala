package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MinHash+LSH near-duplicate pairs with exact verification — the
  * 100 TB text-dedup path, with the per-document work (tokenize →
  * shingle → k-permutation MinHash → band buckets) in a primitive
  * partition kernel and the candidate generation/verification left
  * declarative (equi-join on (band, bucket), then exact Jaccard over
  * the candidate pairs only).
  *
  * Shuffle volume is O(docs × bands) band rows + O(candidates) pairs —
  * independent of how many shingle-sharing pairs exist. The kernel
  * exists for the same measured reason as CosinePairs: interpreted
  * higher-order functions cost ~50× on per-row signature math.
  *
  * Jaccard values are computed from distinct-shingle set sizes in
  * integer math (then one double divide), so they hash-match the exact
  * pairwise SQL oracle regardless of the engine-internal hash choices.
  */
object MinHashLsh {

  /** FNV-1a 64-bit over a string's chars — engine-internal shingle
    * hash (never compared across engines).
    */
  private def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  private val P = (1L << 31) - 1

  private[operators] def shingleSet(text: String): Set[String] = {
    val tok = text.split(" ", -1)
    if (tok.length < 3) Set(tok.mkString(" "))
    else (0 to tok.length - 3).iterator
      .map(i => s"${tok(i)} ${tok(i + 1)} ${tok(i + 2)}").toSet
  }

  /** Inverted-index postings for exact Jaccard: one row per distinct
    * shingle, keyed by its 64-bit hash, with the doc's shingle count
    * alongside (so the downstream pair-count join never revisits the
    * document). Same kernel rationale as [[bandRows]].
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val sh = shingleSet(text)
          val n = sh.size.toLong
          sh.iterator.map(x => (id, n, fnv1a64(x)))
        }
      }
      .toDF("doc_id", "nsh", "s")
  }

  /** Portable postings: one row per distinct 3-gram shingle, keyed by
    * the md5-derived 60-bit hash an SQL oracle can recompute
    * (`('0x'||substr(md5(sh),1,15))::BIGINT`), carrying a tag column
    * (e.g. source) for split-wise joins. Kernel form of the
    * declarative shingle→md5 pipeline — the HOF shingling alone cost
    * ~11 s at sf0.1.
    */
  def portablePostings(docs: DataFrame, idCol: String, tagCol: String,
      textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(tagCol).cast("string"), col(textCol))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, tag, text) =>
          shingleSet(text).iterator.map(sh => (id, tag, SimHash.md5hash60(md, sh)))
        }
      }
      .toDF("doc_id", "tag", "s")
  }

  /** (doc_id, band, bucket) rows: `bands`×`rows` MinHash permutations,
    * `rows` consecutive slots hashed per band.
    */
  def bandRows(docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rows: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = bands * rows
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val base = shingleSet(text).iterator
            .map(s => java.lang.Math.floorMod(fnv1a64(s), P)).toArray
          val sig = new Array[Long](k)
          var i = 0
          while (i < k) {
            val a = 2L * i + 1
            val b = (i.toLong * 2654435761L) % P
            var mn = Long.MaxValue
            var j = 0
            while (j < base.length) {
              val v = (a * base(j) + b) % P
              if (v < mn) mn = v
              j += 1
            }
            sig(i) = mn
            i += 1
          }
          (0 until bands).iterator.map { bnd =>
            var h = 0xcbf29ce484222325L
            var r = 0
            while (r < rows) { h ^= sig(bnd * rows + r); h *= 0x100000001b3L; r += 1 }
            (id, bnd, h)
          }
        }
      }
      .toDF("doc_id", "band", "bucket")
  }

  /** Persist the LSH band index for a corpus — bucketed by band so an
    * incremental probe co-locates without a shuffle of the index side,
    * with each row carrying its bucket's size (`bsize`, computed on the
    * write's own partitioning — no extra shuffle) so probes can apply
    * a hot-bucket cap as a plain scan filter. The production dedup
    * shape: index 100 TB once, probe each arriving batch against it.
    */
  def writeBandIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, bands: Int = 16, rows: Int = 2): Unit =
    bandRows(docs, idCol, textCol, bands, rows)
      .repartition(col("band"), col("bucket"))
      .withColumn("bsize",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .write.mode("overwrite").partitionBy("band").parquet(path)

  /** Probe new documents against a persisted band index: candidates =
    * band-bucket collisions between the batch and the index (batch side
    * is small → broadcast), verified by exact Jaccard against the
    * postings of only the colliding corpus docs. Returns
    * (new_id, corpus_id, jaccard ≥ threshold) — never touches
    * non-colliding corpus documents.
    *
    * `maxBucket` drops index buckets larger than the cap (sizes were
    * precomputed at write time, so this is a scan filter — the index is
    * never shuffled at probe time). Same recall caveat as
    * [[nearDupPairs]]' cap: a probe can still hit a capped document
    * through its other bands. Indexes written before `bsize` existed
    * probe uncapped.
    */
  def probeNew(newDocs: DataFrame, corpus: DataFrame, indexPath: String,
      idCol: String, textCol: String, threshold: Double,
      bands: Int = 16, rows: Int = 2, maxBucket: Int = 4096): DataFrame = {
    val spark = newDocs.sparkSession
    val raw = spark.read.parquet(indexPath)
    val idx =
      if (raw.columns.contains("bsize")) raw.filter(col("bsize") <= maxBucket)
      else raw
    val probe = bandRows(newDocs, idCol, textCol, bands, rows)
    val cand = idx.join(
        broadcast(probe.withColumnRenamed("doc_id", "new_id")),
        Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("new_id"))
      .select(col("new_id"), col("doc_id").as("corpus_id")).distinct()
    // exact verification over candidate pairs only: prune the corpus
    // ROWS to colliding docs before shingling them, so the big side is
    // never tokenized (let alone shuffled) beyond its candidates
    val candIds = cand.select(col("corpus_id")).distinct()
    val corpusHit = corpus.join(
      broadcast(candIds.withColumnRenamed("corpus_id", idCol)),
      Seq(idCol), "left_semi")
    val pNew = postings(newDocs, idCol, textCol)
      .withColumnsRenamed(Map("doc_id" -> "new_id", "nsh" -> "n_new"))
    val pOld = postings(corpusHit, idCol, textCol)
      .withColumnsRenamed(Map("doc_id" -> "corpus_id", "nsh" -> "n_old"))
    pNew.join(pOld, "s")
      .join(broadcast(cand), Seq("new_id", "corpus_id"), "left_semi")
      .groupBy(col("new_id"), col("corpus_id"), col("n_new"), col("n_old"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_new") + col("n_old") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), col("jaccard"))
  }

  /** Per-document sorted shingle-hash arrays: (doc_id, nsh, hs) with
    * `hs` ascending (signed order). ONE kernel pass feeds both
    * candidate generation (a prefix is a slice of the sorted array)
    * and exact verification (sorted-merge intersection) — same kernel
    * rationale as [[postings]].
    */
  private def shingleArrays(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val arr = shingleSet(text).iterator.map(fnv1a64).toArray
          java.util.Arrays.sort(arr)
          (id, arr.length.toLong, arr)
        }
      }.toDF("doc_id", "nsh", "hs")
  }

  /** Exact Jaccard over candidate pairs: each side joins its sorted
    * shingle-hash array from `sh` (so a doc is shingled exactly once
    * upstream, however many pairs it appears in), and the per-pair work
    * is a primitive sorted-merge intersection count.
    */
  private def verifyPairs(cand: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    cand
      .join(sh.toDF("a_id", "na", "ha"), Seq("a_id"))
      .join(sh.toDF("b_id", "nb", "hb"), Seq("b_id"))
      .select(col("a_id"), col("b_id"), col("na"), col("nb"), col("ha"), col("hb"))
      .as[(Long, Long, Long, Long, Array[Long], Array[Long])]
      .map { case (a, bId, na, nb, ha, hb) =>
        var i = 0; var j = 0; var inter = 0L
        while (i < ha.length && j < hb.length) {
          val c = java.lang.Long.compare(ha(i), hb(j))
          if (c == 0) { inter += 1; i += 1; j += 1 }
          else if (c < 0) i += 1
          else j += 1
        }
        (a, bId, inter.toDouble / (na + nb - inter))
      }
      .toDF("a_id", "b_id", "jaccard")
      .filter(col("jaccard") >= threshold)
  }

  /** One representative document (min doc_id) per distinct text —
    * exact duplicates collapse before banding. Grouping directly by
    * `text` (the key lives in the UnsafeRow grouping key, which takes
    * variable-length types) keeps the only aggregate buffer a LONG, so
    * this plans as whole-stage-codegen HashAggregate; the previous
    * md5-key + `first(text)` form put a string in the aggregation
    * buffer, which UnsafeRow buffers cannot mutate, and silently fell
    * back to SortAggregate — a full sort of the corpus on both sides
    * of the shuffle (r16 opt: measured in the q72 final plan). Shuffle
    * bytes are unchanged (text crossed the wire either way) and exact
    * text equality is the true collapse contract the md5 key only
    * approximated.
    */
  private def collapseExact(base: DataFrame): DataFrame =
    base.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"))

  /** Diagnostic view of what [[nearDupPairs]]' hot-bucket cap drops:
    * (band, bucket, n_reps) for every band bucket holding more than
    * `maxBucket` distinct-text representatives. Empty on a healthy
    * corpus; non-empty means near-identical-but-not-equal boilerplate
    * is slipping past exact collapse and costing recall.
    */
  def hotBuckets(docs: DataFrame, idCol: String, textCol: String,
      maxBucket: Int, bands: Int = 16, rows: Int = 2): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    bandRows(collapseExact(base), "doc_id", "text", bands, rows)
      .groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n_reps"))
      .filter(col("n_reps") > maxBucket)
  }

  /** Exact n-gram Jaccard pairs via a prefix-filtered inverted-index
    * join — never a cross join; candidate pairs exist only where one of
    * the ⌊(1−t)·n⌋+1 smallest shingle hashes (by the global hash order)
    * is shared, and survivors are verified exactly by a sorted-merge
    * intersection over the full per-doc arrays.
    *
    * `maxDf` is the stop-shingle guard: a shingle present in `df`
    * prefixes contributes ~df²/2 rows to the candidate join, so one
    * boilerplate trigram in 10⁶ docs would put 5·10¹¹ rows in one key's
    * tasks. Prefix entries with document frequency above the cap are
    * dropped before the join — a documented recall cap (pairs can only
    * be missed, never invented; pairs that are found verify on FULL
    * shingle sets, capped or not). The default cap is far above any
    * document frequency at test scale, where output is exact.
    */
  def exactJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxDf: Long = 1L << 20): DataFrame = {
    // one kernel pass; the explicit doc-keyed exchange is the anchor
    // all three consumers (prefix explode + both verify arms) share,
    // so the corpus is scanned and shingled exactly once (r17 opt —
    // the q73/q83 shared-exchange pattern)
    val sh = shingleArrays(docs, idCol, textCol).repartition(col("doc_id"))
    // prefix filtering (Bayardo et al. 2007 all-pairs / Xiao et al.
    // 2008 ppjoin, §3.2 reduce-before-shuffle): under ANY global total
    // order on shingles, two sets with jaccard ≥ t share one of the
    // FIRST p_x = n_x − ⌈t·n_x⌉ + 1 elements of each. (J ≥ t forces
    // I ≥ t·n_x for both sides since I ≤ n_y; the globally smallest of
    // the I common elements has ≥ I−1 common elements after it, so it
    // sits within the first n_x − I + 1 ≤ p_x of both sorted sets.)
    // The order here is the signed shingle-hash ascending — `hs` is
    // already sorted — so the prefix is a slice, and only ~(1−t) of
    // each document's postings enter the candidate self-join instead
    // of all of them. One extra slack element guards the ⌈t·n⌉ double
    // rounding (a flip can only ADD candidates, never drop one);
    // survivors are verified EXACTLY against the full arrays, so false
    // keeps cost work, never correctness.
    val p = least(col("nsh"), greatest(lit(1L),
      col("nsh") - ceil(lit(threshold) * col("nsh")).cast("long") + lit(2L)))
    // posexplode: `i` is the element's 0-based rank in the doc's FULL
    // sorted array (the slice starts at 1), feeding the positional
    // filter below
    val pfx = sh.select(col("doc_id"), col("nsh"),
      posexplode(slice(col("hs"), lit(1), p.cast("int"))).as(Seq("i", "s")))
    // stop-shingle guard, now over PREFIX occurrences: a boilerplate
    // shingle landing in `df` prefixes still fans out ~df²/2 candidate
    // rows, so the cap drops it from candidate generation (pairs can
    // only be missed, never invented — same documented recall cap as
    // before; the default cap is far above any df at test scale, where
    // output is exact). df via a window keyed like the join below, so
    // the self-join reuses the hash partitioning.
    val kept = pfx
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("df") <= maxDf).drop("df")
    val a = kept.select(col("doc_id").as("a_id"), col("nsh").as("na"),
      col("i").as("ia"), col("s"))
    val b = kept.select(col("doc_id").as("b_id"), col("nsh").as("nb"),
      col("i").as("ib"), col("s"))
    // length-ratio prune (the similarity-join size filter): jaccard ≤
    // min(na,nb)/max(na,nb), so a pair whose smaller shingle set is
    // under `threshold` × the larger can never clear the threshold —
    // drop it at pair-generation time. One full shingle-count unit of
    // slack (min ≥ t·max − 1) so no double-rounding boundary case can
    // ever drop a pair the exact verification would keep.
    val ratioOk = least(col("na"), col("nb")).cast("double") >=
      lit(threshold) * greatest(col("na"), col("nb")).cast("double") - 1.0d
    // positional filter (ppjoin): jaccard ≥ t needs overlap
    // I ≥ t/(1+t)·(na+nb), and a shared element at 0-based ranks
    // (ia, ib) of the two sorted arrays admits at most
    // 1 + min(na−ia−1, nb−ib−1) common elements when it is the pair's
    // SMALLEST common element. Every qualifying pair's smallest common
    // element sits in both prefixes and passes this test, so keeping a
    // pair when ANY of its shared prefix elements passes loses nothing;
    // one overlap unit of slack again makes double rounding harmless.
    val posOk = (lit(1L) + least(col("na") - col("ia") - 1L,
      col("nb") - col("ib") - 1L)).cast("double") >=
      lit(threshold / (1.0d + threshold)) * (col("na") + col("nb")).cast("double") - 1.0d
    val cand = a.join(b, Seq("s"))
      .filter(col("a_id") < col("b_id") && ratioOk && posOk)
      .select(col("a_id"), col("b_id"))
      .distinct()
    verifyPairs(cand, sh, threshold)
  }

  /** Near-dup pairs with Jaccard ≥ threshold (exact, given LSH recall —
    * 16×2 at j≥0.8 misses a pair with prob ~3e-8).
    *
    * Skew hardening — the two guards that keep the 100 TB path alive on
    * a real crawl:
    *
    *  - '''Exact-duplicate collapse.''' Identical texts have identical
    *    shingle sets, so only one representative per distinct text
    *    enters banding; a degenerate bucket of B byte-identical
    *    boilerplate pages would otherwise verify B²/2 candidate pairs
    *    inside one (band, bucket) task. Member pairs are re-expanded at
    *    the end — within-group pairs are Jaccard 1.0 by construction,
    *    cross-group pairs inherit their representatives' Jaccard — so
    *    the OUTPUT is identical to banding every document. (The
    *    within-group expansion is quadratic in group size because the
    *    requested output is; the keep-list form, [[DedupClusters]]
    *    assignments, avoids materializing it.)
    *  - '''Hot-bucket cap.''' A (band, bucket) group still holding more
    *    than `maxBucket` *distinct-text* representatives (near-identical
    *    templated pages) is dropped from candidate generation — a
    *    counted recall cap, observable via [[hotBuckets]]; pairs in a
    *    dropped bucket can still surface through their other bands.
    *    Default 4096 reps bounds any bucket's pair fan-out at ~8M.
    *
    * Verification intersects 64-bit FNV-1a shingle *hashes*, not the
    * shingle strings: a cross-document hash collision inflates a pair's
    * Jaccard by 1/|union|, with probability ≈ n_a·n_b/2^64 per pair
    * (~5e-12 even for 100k-shingle docs) — far below the LSH miss rate
    * above, but the result is exact *given* injective hashing, not
    * unconditionally. Pairs landing within ~1/|union| of the threshold
    * can re-verify on strings if that tail matters.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, bands: Int = 16, rows: Int = 2,
      maxBucket: Int = 4096): DataFrame = {
    require(threshold <= 1.0, s"jaccard threshold must be ≤ 1, got $threshold")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    // ONE text-keyed aggregate serves both the representative set and
    // the duplicate groups. The previous collapseExact/dupGroups pair
    // aggregated the same data with DIFFERENT partial aggregates (min
    // vs min+collect_list), so their canonical plans split below the
    // exchange and the corpus was scanned and shuffled twice (r17 opt:
    // q72 final plan FileScan 2 → 1). collect_list moves the aggregate
    // to ObjectHashAggregate (array-typed buffer, the q79 pattern) —
    // still hash-based partial aggregation, never a corpus sort; the
    // member ids cost 8 bytes/doc in the one collapse shuffle the pass
    // already makes.
    val g = base.groupBy(col("text"))
      .agg(min(col("doc_id")).as("rep_id"),
        sort_array(collect_list(col("doc_id"))).as("ids"))
    // `size(ids) >= 1` is vacuously true (every group has a member) but
    // keeps `ids` REFERENCED on the reps branch: column pruning would
    // otherwise drop collect_list from this branch's partial aggregate,
    // splitting the canonical exchange from the groups branch's and
    // re-scanning the corpus once per consumer (measured: ScanCount 2
    // scans without the guard, 1 with)
    val reps = g.filter(size(col("ids")) >= 1)
      .select(col("rep_id").as("doc_id"), col("text"))
    val groups = g.filter(size(col("ids")) > 1)
      .select(col("rep_id"), col("ids"))

    val b = bandRows(reps, "doc_id", "text", bands, rows)
    // hot-bucket cap: bucket sizes via a window keyed like the
    // candidate self-join, so the join reuses the partitioning
    val capped = b
      .withColumn("bsize",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("bsize") <= maxBucket).drop("bsize")
    val cand = capped.as("x").join(capped.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    // verify with per-doc sorted shingle-hash arrays: each
    // representative is shingled exactly once (a full-text pair join
    // would re-shingle a hot doc once per candidate pair), and the
    // per-pair work is a primitive sorted-merge intersection count.
    // All reps are hashed rather than semi-joining down to candidates
    // first — bandRows already makes that full pass, and skipping the
    // distinct+semi stages is cheaper than the pruning at any corpus
    // size
    val repPairs = verifyPairs(cand, shingleArrays(reps, "doc_id", "text"),
      threshold)

    // re-expand exact-duplicate members. Cross-group: every member pair
    // inherits its representatives' Jaccard (identical shingle sets);
    // most groups are singletons, so the left joins against the tiny
    // dup-group table pass pairs through untouched (AQE broadcasts it).
    // Within-group pairs (byte-identical docs, Jaccard exactly 1) ride
    // the SAME expansion as a self-pair (rep, rep, 1.0) per dup group:
    // both join arms hit the group, the double explode enumerates
    // ids × ids, and the da<db guard keeps each unordered member pair
    // once. One expansion instead of a separate `within` branch means
    // every consumer of `groups` shares one canonical aggregate — the
    // old branch pruned `rep_id` out of its copy, splitting the
    // canonical plan and re-scanning the corpus for a third time
    // (r16 opt: q72 final plan showed the extra FileScan).
    val selfPairs = groups.select(col("rep_id").as("a_id"),
      col("rep_id").as("b_id"), lit(1.0).as("jaccard"))
    val expanded = repPairs.union(selfPairs)
      .join(groups.withColumnsRenamed(Map("rep_id" -> "a_id", "ids" -> "ids_a")),
        Seq("a_id"), "left")
      .join(groups.withColumnsRenamed(Map("rep_id" -> "b_id", "ids" -> "ids_b")),
        Seq("b_id"), "left")
      .withColumn("da", explode(coalesce(col("ids_a"), array(col("a_id")))))
      .withColumn("db", explode(coalesce(col("ids_b"), array(col("b_id")))))
      .filter(col("a_id") =!= col("b_id") || col("da") < col("db"))
      .select(least(col("da"), col("db")).as("a_id"),
        greatest(col("da"), col("db")).as("b_id"), col("jaccard"))
    expanded
  }
}

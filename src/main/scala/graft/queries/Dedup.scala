package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.functions.{TextFns, VectorFns}
import graft.sources.Tables

/** Deduplication operators over `documents` / `embeddings` — the core
  * of a training-data curation pipeline at 100 TB:
  *
  *   - exact dedup: hash-groupBy on a canonical fingerprint (1 shuffle)
  *   - n-gram Jaccard: inverted-index join on shingles (never a cross
  *     join — candidate pairs are generated only where a shingle is
  *     shared, then grouped; skew guard = the stop-shingle df cap in
  *     `MinHashLsh.exactJaccardPairs`)
  *   - MinHash+LSH: signature → band buckets → equi-join within bucket
  *     → exact verification. The scale path: shuffle volume is
  *     O(docs × bands), independent of pair count; exact duplicates
  *     collapse before banding and hot buckets are capped
  *     (`MinHashLsh.nearDupPairs` scaladoc).
  *   - SimHash: 60-bit fingerprint, banded into 4×15-bit blocks; by
  *     pigeonhole any pair with hamming ≤ 3 shares a block, so an
  *     equi-join on (block, value) finds all candidates.
  *   - embedding near-dup: quantized-integer cosine over all pairs
  *     (the LSH-bucketed scale variant is in Similarity/q76's IVF
  *     machinery; at verify scale the exact form doubles as its oracle).
  *
  * MinHash/LSH verification makes q72's output *exactly* the ≥0.8
  * Jaccard pairs (recall of 16 bands × 2 rows at j≥0.8 is
  * 1-(1-0.64)^16 ≈ 1-3e-8), so q71 and q72 share one oracle.
  */
object Dedup {

  private val jaccardOracleSql = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
    s AS (SELECT doc_id,
            CASE WHEN len(tok) >= 3
                 THEN list_distinct([tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] for i in range(1, len(tok)-1)])
                 ELSE [array_to_string(tok, ' ')] END AS sh
          FROM t),
    p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(len(a.sh) AS BIGINT) AS na, CAST(len(b.sh) AS BIGINT) AS nb,
                 CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter
          FROM s a JOIN s b ON a.doc_id < b.doc_id)
    SELECT a_id, b_id, CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
    FROM p WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8
    ORDER BY a_id, b_id
  """.stripMargin.trim

  def queries: Seq[GraftQuery] = Seq(
    // Exact dedup: canonical fingerprint → min doc_id survives. One
    // hash-partitioned groupBy; survivors + dup counts per source.
    GraftQuery(
      "q70_dedup_exact",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .withColumn("fp", md5(TextFns.normalizeText(col("text"))))
        d.groupBy(col("source"), col("fp"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_unique"),
            sum(col("copies")).as("n_docs"),
            sum(col("copies") - 1).as("n_dupes"))
          .orderBy(col("source"))
      },
      Some("""
        WITH g AS (
          SELECT source, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
                 MIN(doc_id) AS keep_id, COUNT(*) AS copies
          FROM documents GROUP BY source, fp)
        SELECT source, COUNT(*) AS n_unique,
               CAST(SUM(copies) AS BIGINT) AS n_docs,
               CAST(SUM(copies - 1) AS BIGINT) AS n_dupes
        FROM g GROUP BY source ORDER BY source
      """.stripMargin.trim)),

    // Exact n-gram Jaccard via inverted index: explode distinct shingles,
    // equi-join postings, count shared shingles per pair — the join only
    // materializes pairs sharing ≥1 shingle, and the stop-shingle
    // document-frequency cap inside exactJaccardPairs drops ultra-
    // frequent boilerplate shingles (df² pair blow-up guard; the default
    // cap is never hit at test scale, so output stays exact).
    GraftQuery(
      "q71_dedup_ngram_jaccard",
      (s, dir) => {
        // postings keyed by a 64-bit shingle hash (collision odds
        // ~2^-64 per shingle pair), shingled in the MinHashLsh kernel —
        // the declarative HOF shingling was the measured bottleneck,
        // not the join (total shared-shingle pairs ≈ 1.3M at sf0.1)
        graft.operators.MinHashLsh.exactJaccardPairs(
            Tables.load(s, dir, "documents"), "doc_id", "text", 0.8)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some(jaccardOracleSql),
      headline = true),

    // MinHash(32) + LSH(16 bands × 2 rows) candidates, then exact
    // verification — output identical to q71 but with shuffle volume
    // O(docs × bands) instead of O(shared-shingle pairs). This is the
    // 100 TB dedup path; the per-doc signature math runs in the
    // operators.MinHashLsh partition kernel (same measured-HOF-overhead
    // rationale as CosinePairs), candidate join + verification stay
    // declarative.
    GraftQuery(
      "q72_dedup_minhash_lsh",
      (s, dir) => {
        graft.operators.MinHashLsh.nearDupPairs(
            Tables.load(s, dir, "documents"), "doc_id", "text", 0.8)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some(jaccardOracleSql),
      headline = true),

    // SimHash near-dup: 60-bit fingerprint in a partition kernel
    // (operators.SimHash — the declarative 60×aggregate form cost 33 s
    // at sf0.1 re-evaluating the inline md5 array per bit); banded
    // block join (pigeonhole-complete for hamming ≤ 3) instead of a
    // cross join. The oracle recomputes the identical md5-derived
    // fingerprint pairwise.
    GraftQuery(
      "q73_dedup_simhash",
      (s, dir) => {
        graft.operators.SimHash.nearDupPairs(
            Tables.load(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        h AS (SELECT doc_id, [(('0x' || substr(md5(x), 1, 15))::BIGINT) for x in tok] AS hs FROM t),
        bits AS (
          SELECT doc_id, b,
            CASE WHEN list_sum([CASE WHEN (hh >> b) & 1 = 1 THEN 1 ELSE -1 END for hh in hs]) >= 0
                 THEN (1::BIGINT << b) ELSE 0::BIGINT END AS bit
          FROM h CROSS JOIN unnest(range(0, 60)) AS t2(b)),
        f AS (SELECT doc_id, CAST(SUM(bit) AS BIGINT) AS fp FROM bits GROUP BY doc_id)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS dist
        FROM f a JOIN f b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= 3
        ORDER BY a_id, b_id
      """.stripMargin.trim),
      headline = true),

    // Embedding near-dup: quantized-integer cosine ≥ 0.42 over all
    // pairs, via the partition kernel (operators.CosinePairs) — the
    // declarative cross-join pays ~3µs/pair in interpreted HOF dot
    // products. Bit-identical math to the declarative form; at real
    // scale the pair generation moves into LSH/IVF buckets (q76) — the
    // threshold filter and cosine stay identical.
    GraftQuery(
      "q74_dedup_embedding",
      (s, dir) => {
        graft.operators.CosinePairs.exact(
            Tables.load(s, dir, "embeddings"), "vec_id", "embedding", 0.42)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)::DOUBLE) AS q
          FROM embeddings),
        n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
        p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                     list_dot_product(a.q, b.q) / (sqrt(a.n2) * sqrt(b.n2)) AS sim
              FROM n a JOIN n b ON a.vec_id < b.vec_id)
        SELECT a_id, b_id, sim FROM p WHERE sim >= 0.42 ORDER BY a_id, b_id
      """.stripMargin.trim),
      headline = true),

    // Dedup clustering: near-dup pairs → connected components → one
    // canonical representative (min doc_id) per cluster + size. Spark
    // side is Hash-to-Min label propagation (operators.DedupClusters);
    // the oracle computes the same components with a recursive CTE.
    GraftQuery(
      "q77_dedup_clusters",
      (s, dir) => {
        val pairs = graft.operators.MinHashLsh.nearDupPairs(
          Tables.load(s, dir, "documents"), "doc_id", "text", 0.8)
        graft.operators.DedupClusters.assignments(pairs, "a_id", "b_id")
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH RECURSIVE
        p AS ($jaccardOracleSql),
        e AS (SELECT a_id AS src, b_id AS dst FROM p
              UNION ALL SELECT b_id, a_id FROM p),
        n AS (SELECT DISTINCT src AS id FROM e),
        r AS (
          SELECT id, id AS label FROM n
          UNION
          SELECT e.dst AS id, r.label FROM r JOIN e ON e.src = r.id),
        c AS (SELECT id, MIN(label) AS rep FROM r GROUP BY id),
        sz AS (SELECT rep, COUNT(*) AS csize FROM c GROUP BY rep)
        SELECT c.id AS doc_id, c.rep AS rep_id, CAST(sz.csize AS BIGINT) AS csize
        FROM c JOIN sz ON c.rep = sz.rep ORDER BY doc_id
      """.stripMargin.trim),
      headline = true),

    // Benchmark-contamination check: training documents sharing ≥ 5
    // distinct 3-gram shingles with the held-out set (source src0
    // plays the benchmark here). Inverted-index semi-join on portable
    // md5-derived shingle hashes — same never-all-pairs shape as q71;
    // at 100 TB the eval side is tiny and broadcasts.
    GraftQuery(
      "q78_dedup_contamination",
      (s, dir) => {
        // split-filter BEFORE the shingling kernel: the mapPartitions
        // kernel is opaque, so a tag filter above it never pushed into
        // the scan and the whole corpus was shingled twice (once per
        // side). Filtering the input puts `source` in PushedFilters
        // and each document is shingled exactly once (r16 opt).
        val docs = Tables.load(s, dir, "documents")
        val train = graft.operators.MinHashLsh.portablePostings(
            docs.filter(col("source") =!= "src0"), "doc_id", "source", "text")
          .select(col("doc_id"), col("s"))
        val eval = graft.operators.MinHashLsh.portablePostings(
            docs.filter(col("source") === "src0"), "doc_id", "source", "text")
          .select(col("s")).distinct()
        train.join(broadcast(eval), "s")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 5)
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tok FROM documents),
        s AS (SELECT doc_id, source,
                CASE WHEN len(tok) >= 3
                     THEN list_distinct([tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] for i in range(1, len(tok)-1)])
                     ELSE [array_to_string(tok, ' ')] END AS sh
              FROM t),
        x AS (SELECT doc_id, source,
                ('0x' || substr(md5(unnest(sh)), 1, 15))::BIGINT AS s
              FROM s),
        train AS (SELECT doc_id, s FROM x WHERE source <> 'src0'),
        ev AS (SELECT DISTINCT s FROM x WHERE source = 'src0')
        SELECT doc_id, COUNT(*) AS n_shared
        FROM train JOIN ev USING (s)
        GROUP BY doc_id HAVING COUNT(*) >= 5 ORDER BY doc_id
      """.stripMargin.trim),
      headline = true),

    // SemDeDup-style semantic dedup: sign-bucket the embedding space
    // (q76's deterministic coarse quantizer), then greedily remove any
    // vector with a lower-id in-bucket neighbor at cosine ≥ 0.3. The
    // oracle replays the identical integer bucket ids and quantized
    // cosines in SQL; all output columns are integers.
    GraftQuery(
      "q79_semantic_dedup",
      (s, dir) => {
        graft.operators.SemanticDedup.assignments(
            Tables.load(s, dir, "embeddings"), "vec_id", "embedding", 0.3)
          .orderBy(col("vec_id"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)::DOUBLE) AS q
          FROM embeddings),
        n AS (
          SELECT vec_id, q, list_dot_product(q, q) AS n2,
                 (CASE WHEN list_sum(list_slice(q,  1, 16)) > 0 THEN 1 ELSE 0 END
                + CASE WHEN list_sum(list_slice(q, 17, 32)) > 0 THEN 2 ELSE 0 END
                + CASE WHEN list_sum(list_slice(q, 33, 48)) > 0 THEN 4 ELSE 0 END
                + CASE WHEN list_sum(list_slice(q, 49, 64)) > 0 THEN 8 ELSE 0 END) AS cid
          FROM e),
        p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
              FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id < b.vec_id
              WHERE list_dot_product(a.q, b.q) / (sqrt(a.n2) * sqrt(b.n2)) >= 0.3),
        d AS (SELECT b_id AS vec_id, MIN(a_id) AS rep FROM p GROUP BY b_id)
        SELECT n.vec_id, CAST(n.cid AS BIGINT) AS cid,
               CAST(CASE WHEN d.rep IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
               COALESCE(d.rep, n.vec_id) AS rep_id
        FROM n LEFT JOIN d ON d.vec_id = n.vec_id
        ORDER BY n.vec_id
      """.stripMargin.trim),
      headline = true),

    // Canonical-document selection — the step that turns q77's cluster
    // assignments into an actual dedup decision: within each near-dup
    // cluster keep the highest-quality member (longest doc, doc_id
    // tie-break), mark the rest as drops. The per-cluster argmax is a
    // window over one cluster (bounded by cluster size — the hot-bucket
    // cap upstream bounds that), never a global sort; the quality join
    // is key-partitioned on doc_id.
    GraftQuery(
      "q94_canonical_selection",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = graft.operators.MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.8)
        val asg = graft.operators.DedupClusters.assignments(pairs, "a_id", "b_id")
        val w = Window.partitionBy(col("rep_id"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        asg.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
          .withColumn("canonical_id", first(col("doc_id")).over(w))
          .select(col("doc_id"), col("canonical_id"),
            (col("doc_id") === col("canonical_id")).as("keep"), col("csize"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH RECURSIVE
        p AS ($jaccardOracleSql),
        e AS (SELECT a_id AS src, b_id AS dst FROM p
              UNION ALL SELECT b_id, a_id FROM p),
        n AS (SELECT DISTINCT src AS id FROM e),
        r AS (
          SELECT id, id AS label FROM n
          UNION
          SELECT e.dst AS id, r.label FROM r JOIN e ON e.src = r.id),
        c AS (SELECT id, MIN(label) AS rep FROM r GROUP BY id),
        sz AS (SELECT rep, COUNT(*) AS csize FROM c GROUP BY rep),
        q AS (SELECT c.id, c.rep, d.n_chars
              FROM c JOIN documents d ON d.doc_id = c.id),
        canon AS (SELECT rep, first(id ORDER BY n_chars DESC, id) AS canonical_id
                  FROM q GROUP BY rep)
        SELECT q.id AS doc_id, canon.canonical_id,
               q.id = canon.canonical_id AS keep,
               CAST(sz.csize AS BIGINT) AS csize
        FROM q JOIN canon ON q.rep = canon.rep JOIN sz ON q.rep = sz.rep
        ORDER BY doc_id
      """.stripMargin.trim)),

    // Leakage-safe train/val split: hash-splitting DOCUMENTS leaks —
    // two near-duplicate copies of one page routinely land on opposite
    // sides and the eval set scores memorization. The unit of
    // assignment must be the near-dup CLUSTER: every member inherits
    // its component representative's split bucket, so no ≥0.8-Jaccard
    // pair ever straddles the boundary. Composition of q77's
    // connected components with q67's deterministic md5 split —
    // singletons (most of the corpus) pass through keyed by their own
    // id.
    GraftQuery(
      "q109_leakage_safe_split",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val pairs = graft.operators.MinHashLsh.nearDupPairs(d, "doc_id", "text", 0.8)
        val asg = graft.operators.DedupClusters.assignments(pairs, "a_id", "b_id")
          .select(col("doc_id"), col("rep_id"))
        d.select(col("doc_id"))
          .join(asg, Seq("doc_id"), "left")
          .withColumn("rep_id", coalesce(col("rep_id"), col("doc_id")))
          .withColumn("split",
            when(TextFns.md5hash60(
              concat(lit("split:"), col("rep_id").cast("string"))) % 10L < 9L,
              "train").otherwise("val"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH RECURSIVE
        p AS ($jaccardOracleSql),
        e AS (SELECT a_id AS src, b_id AS dst FROM p
              UNION ALL SELECT b_id, a_id FROM p),
        n AS (SELECT DISTINCT src AS id FROM e),
        r AS (
          SELECT id, id AS label FROM n
          UNION
          SELECT e.dst AS id, r.label FROM r JOIN e ON e.src = r.id),
        c AS (SELECT id, MIN(label) AS rep FROM r GROUP BY id),
        m AS (SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS rep_id
              FROM documents d LEFT JOIN c ON c.id = d.doc_id)
        SELECT doc_id, rep_id,
               CASE WHEN ('0x' || substr(md5('split:' || CAST(rep_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 9
                    THEN 'train' ELSE 'val' END AS split
        FROM m ORDER BY doc_id
      """.stripMargin.trim))
  )
}

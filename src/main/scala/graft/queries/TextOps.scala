package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.functions.TextFns
import graft.sources.Tables

/** Text-analysis operators for training-data curation over the
  * `documents` table: language ID (stopword-overlap heuristic), quality
  * scoring, token counting (whitespace + BPE-ish regex), and document
  * fingerprinting. All per-row `Column` compositions (map-side only —
  * the single shuffle in each query is the final aggregate/sort), so
  * every one of these scales embarrassingly with input size.
  */
object TextOps {

  /** Deterministic per-"language" stopword sets for the heuristic
    * classifier. Arbitrary but fixed; scoring = total token hits.
    */
  private val langSets: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("table", "scan", "merge", "hash"),
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("join", "sort", "filter", "group"),
    "fr" -> Seq("row", "column", "line", "value"),
    "zh" -> Seq("spark", "stream", "batch", "window"))

  private def hitCount(tok: Column, words: Seq[String]): Column =
    size(filter(tok, t => t.isin(words: _*))).cast("long")

  def queries: Seq[GraftQuery] = Seq(
    // Language ID: argmax of stopword-set overlap, first-wins tie-break
    // in fixed lang order; confusion matrix against the labeled lang.
    GraftQuery(
      "q60_text_langid",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .withColumn("tok", TextFns.tokens(col("text")))
        val scored = langSets.foldLeft(d) { case (df, (l, ws)) =>
          df.withColumn(s"s_$l", hitCount(col("tok"), ws))
        }
        val langs = langSets.map(_._1)
        val pred = langs.foldRight(lit(langs.last)) { case (l, rest) =>
          val others = langs.filterNot(_ == l).map(o => col(s"s_$o"))
          if (l == langs.last) rest
          else when(col(s"s_$l") >= greatest(others: _*), lit(l)).otherwise(rest)
        }
        scored.withColumn("predicted", pred)
          .groupBy(col("lang"), col("predicted"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("predicted"))
      },
      Some("""
        WITH t AS (SELECT lang, string_split(text, ' ') AS tok FROM documents),
        s AS (SELECT lang,
          CAST(len(list_filter(tok, x -> list_contains(['table','scan','merge','hash'], x))) AS BIGINT) AS s_de,
          CAST(len(list_filter(tok, x -> list_contains(['the','a','fast','slow'], x))) AS BIGINT) AS s_en,
          CAST(len(list_filter(tok, x -> list_contains(['join','sort','filter','group'], x))) AS BIGINT) AS s_es,
          CAST(len(list_filter(tok, x -> list_contains(['row','column','line','value'], x))) AS BIGINT) AS s_fr,
          CAST(len(list_filter(tok, x -> list_contains(['spark','stream','batch','window'], x))) AS BIGINT) AS s_zh
        FROM t),
        p AS (SELECT lang,
          CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
               WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
               WHEN s_es >= greatest(s_de, s_en, s_fr, s_zh) THEN 'es'
               WHEN s_fr >= greatest(s_de, s_en, s_es, s_zh) THEN 'fr'
               ELSE 'zh' END AS predicted
        FROM s)
        SELECT lang, predicted, COUNT(*) AS n FROM p
        GROUP BY lang, predicted ORDER BY lang, predicted
      """.stripMargin.trim)),

    // Quality scoring: type-token ratio, stopword ratio, length factor —
    // weighted into one double score from exact integer inputs, so the
    // score is engine-identical. The shape of C4/Gopher-style filters.
    GraftQuery(
      "q61_text_quality",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .withColumn("tok", TextFns.tokens(col("text")))
        d.withColumn("n_tok", size(col("tok")).cast("long"))
          .withColumn("n_distinct", size(array_distinct(col("tok"))).cast("long"))
          .withColumn("n_stop", hitCount(col("tok"), Seq("the", "a")))
          .withColumn("ttr", col("n_distinct").cast("double") / col("n_tok").cast("double"))
          .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tok").cast("double"))
          .withColumn("len_factor",
            least(col("n_tok").cast("double") / lit(100.0), lit(1.0)))
          .withColumn("quality",
            col("ttr") * lit(0.3) + (lit(1.0) - col("stop_ratio")) * lit(0.4) +
              col("len_factor") * lit(0.3))
          .filter(col("quality") > 0.5)
          .select(col("doc_id"), col("n_tok"), col("ttr"), col("stop_ratio"), col("quality"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        m AS (SELECT doc_id,
          CAST(len(tok) AS BIGINT) AS n_tok,
          CAST(len(list_distinct(tok)) AS BIGINT) AS n_distinct,
          CAST(len(list_filter(tok, x -> list_contains(['the','a'], x))) AS BIGINT) AS n_stop
        FROM t),
        q AS (SELECT doc_id, n_tok,
          CAST(n_distinct AS DOUBLE) / CAST(n_tok AS DOUBLE) AS ttr,
          CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) AS stop_ratio,
          least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) AS len_factor
        FROM m)
        SELECT doc_id, n_tok, ttr, stop_ratio,
               ttr * 0.3 + (1.0 - stop_ratio) * 0.4 + len_factor * 0.3 AS quality
        FROM q WHERE ttr * 0.3 + (1.0 - stop_ratio) * 0.4 + len_factor * 0.3 > 0.5
        ORDER BY doc_id
      """.stripMargin.trim)),

    // Token counting: whitespace tokens + BPE-ish regex tokens + chars,
    // aggregated per source — the billing/budget pass of a data pipeline.
    GraftQuery(
      "q62_text_tokens",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.withColumn("n_ws", size(TextFns.tokens(col("text"))).cast("long"))
          .withColumn("n_bpe", size(TextFns.regexTokens(col("text"))).cast("long"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_ws")).as("ws_tokens"),
            sum(col("n_bpe")).as("bpe_tokens"),
            sum(length(col("text")).cast("long")).as("chars"))
          .orderBy(col("source"))
      },
      Some("""
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
               CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS bpe_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS chars
        FROM documents GROUP BY source ORDER BY source
      """.stripMargin.trim),
      headline = true),

    // Document fingerprinting: md5 over canonicalized text (the
    // portable form; the rolling-hash variant in TextFns is spec-checked)
    // + per-fingerprint group size = exact-dup detection at any scale.
    GraftQuery(
      "q63_text_fingerprint",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.withColumn("fp", substring(md5(TextFns.normalizeText(col("text"))), 1, 16))
          .select(col("doc_id"), col("fp"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, substr(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), 1, 16) AS fp
        FROM documents ORDER BY doc_id
      """.stripMargin.trim)),

    // PII redaction: regex-scrub emails/phones before training. The
    // corpus is synthetic words, so the PII is synthesized
    // deterministically from row data — the operator (match, count,
    // replace; identical regex dialect both engines) is what's under
    // test. Map-only; at 100 TB this fuses into the scan.
    GraftQuery(
      "q64_text_pii_redact",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val email = "[a-z0-9]+@[a-z0-9.]+"
        val phone = "555-[0-9]{4}"
        d.withColumn("contact",
            concat(substring(col("text"), 1, 40),
              lit(" reach user"), col("doc_id").cast("string"),
              lit("@mail.example or call 555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .withColumn("n_emails", regexp_count(col("contact"), lit(email)).cast("long"))
          .withColumn("n_phones", regexp_count(col("contact"), lit(phone)).cast("long"))
          .withColumn("masked",
            regexp_replace(regexp_replace(col("contact"), email, "<EMAIL>"),
              phone, "<PHONE>"))
          .select(col("doc_id"), col("n_emails"), col("n_phones"),
            substring(col("masked"), 41, 100).as("masked_tail"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH c AS (
          SELECT doc_id,
                 concat(substr(text, 1, 40), ' reach user', CAST(doc_id AS VARCHAR),
                   '@mail.example or call 555-',
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS contact
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(contact, '[a-z0-9]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(contact, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
               substr(regexp_replace(regexp_replace(contact, '[a-z0-9]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                 '555-[0-9]{4}', '<PHONE>', 'g'), 41, 100) AS masked_tail
        FROM c ORDER BY doc_id
      """.stripMargin.trim)),

    // Stopword pruning: drop stopwords from the token stream, report
    // exact integer token budgets per source (the ratio is derived from
    // exact ints, so it is engine-identical — per-row double averages
    // aggregated across rows would be summation-order-dependent).
    GraftQuery(
      "q65_text_stopword_prune",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .withColumn("tok", TextFns.tokens(col("text")))
        d.withColumn("n_tok", size(col("tok")).cast("long"))
          .withColumn("n_kept",
            size(filter(col("tok"), t => !t.isin("the", "a"))).cast("long"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("toks"),
            sum(col("n_kept")).as("kept"))
          .withColumn("keep_ratio",
            col("kept").cast("double") / col("toks").cast("double"))
          .orderBy(col("source"))
      },
      Some("""
        WITH t AS (
          SELECT source, string_split(text, ' ') AS tok FROM documents),
        m AS (
          SELECT source,
                 CAST(len(tok) AS BIGINT) AS n_tok,
                 CAST(len(list_filter(tok, x -> NOT list_contains(['the','a'], x))) AS BIGINT) AS n_kept
          FROM t)
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS toks,
               CAST(SUM(n_kept) AS BIGINT) AS kept,
               CAST(SUM(n_kept) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE) AS keep_ratio
        FROM m GROUP BY source ORDER BY source
      """.stripMargin.trim)),

    // TF-IDF-style term relevance, top-3 terms per document. The
    // inverse-document-frequency factor is the LOG-FREE rational form
    // tf·N/df: one exact integer product then one correctly-rounded
    // IEEE division, identical in any engine — ln() differs in the
    // last ulp across libm implementations and would break hash
    // comparison. Plan shape: explode → (doc,term) agg → term-level
    // df agg → equi-join back on term → per-doc window; every shuffle
    // is on a high-cardinality key.
    GraftQuery(
      "q66_text_tfidf",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val tok = d.select(col("doc_id"),
          explode(TextFns.tokens(col("text"))).as("term"))
        val tf = tok.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = d.agg(count(lit(1)).as("n"))
        // document-frequency table is vocabulary-bounded — pin it as
        // the build side so the static estimate can never broadcast
        // the corpus-sized (doc, term) stream instead
        val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(n))
          .withColumn("score", (col("tf") * col("n")) / col("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"),
            col("df"), col("score"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n FROM documents),
        s AS (
          SELECT doc_id, tf.term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
                 (CAST(tf AS BIGINT) * (SELECT n FROM n)) / CAST(df AS BIGINT) AS score
          FROM tf JOIN df ON tf.term = df.term),
        r AS (
          SELECT doc_id, term, tf, df, score,
                 CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rank
          FROM s)
        SELECT doc_id, rank, term, tf, df, score
        FROM r WHERE rank <= 3 ORDER BY doc_id, rank
      """.stripMargin.trim)),

    // Deterministic train/val split: hash the doc id (not a random()
    // call — reproducible across runs, engines, and cluster sizes;
    // adding documents never reshuffles existing assignments). 90/10 by
    // md5-derived bucket; per-split-and-source token budgets.
    GraftQuery(
      "q67_text_split",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.withColumn("bucket",
            pmod(TextFns.md5hash60(col("doc_id").cast("string")), lit(100L)))
          .withColumn("split",
            when(col("bucket") < 90, lit("train")).otherwise(lit("val")))
          .groupBy(col("split"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text")).cast("long")).as("chars"))
          .orderBy(col("split"), col("source"))
      },
      Some("""
        WITH b AS (
          SELECT source, text,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
          FROM documents)
        SELECT CASE WHEN bucket < 90 THEN 'train' ELSE 'val' END AS split,
               source, COUNT(*) AS n_docs,
               CAST(SUM(length(text)) AS BIGINT) AS chars
        FROM b GROUP BY 1, 2 ORDER BY split, source
      """.stripMargin.trim)),

    // Sequence packing for training shards: per source shard, in
    // deterministic doc order, a document goes to the bin its running
    // token offset falls in (target capacity 2000 tokens — boundary
    // docs overflow into their start bin, the pack-then-truncate
    // convention). Shard-local by construction: the only window is
    // partitioned by source, so shards pack in parallel and nothing is
    // a global sort — the property that matters at 100 TB, where
    // packing is always per output shard anyway.
    GraftQuery(
      "q68_text_pack",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        d.select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("bin", expr("(cum - n_tok) div 2000"))
          .groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("bin_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("source"), col("bin"))
      },
      Some("""
        WITH t AS (SELECT doc_id, source,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                   FROM documents),
        c AS (SELECT doc_id, source, n_tok,
                     CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
              FROM t)
        SELECT source, (cum - n_tok) // 2000 AS bin, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM c GROUP BY 1, 2 ORDER BY source, bin
      """.stripMargin.trim)),

    // Self-repetition score: 100 − (distinct 3-grams · 100 ÷ total
    // 3-grams), the boilerplate/loop detector quality filters use.
    // Integer percentage (exact in any engine); shingle counting runs
    // in the ShingleStats partition kernel — the declarative
    // `size(array_distinct(transform(...)))` form re-evaluated the
    // token split per shingle inside the interpreted lambda (measured
    // 6.7 s → 0.3 s at sf0.1, the round-1 interpreted-HOF tax class).
    GraftQuery(
      "q69_text_repetition",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        graft.operators.ShingleStats.withShingleStats(d, "text")
          .filter(col("n_tok") >= 3)
          .select(col("doc_id"), col("n_ngrams"), col("n_distinct"))
          .withColumn("rep_pct", expr("100 - (100 * n_distinct div n_ngrams)"))
          .orderBy(col("rep_pct").desc, col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        g AS (SELECT doc_id, CAST(len(tok) - 2 AS BIGINT) AS n_ngrams,
                     CAST(len(list_distinct([tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]
                                             for i in range(1, len(tok) - 1)])) AS BIGINT) AS n_distinct
              FROM t WHERE len(tok) >= 3)
        SELECT doc_id, n_ngrams, n_distinct,
               100 - (100 * n_distinct // n_ngrams) AS rep_pct
        FROM g ORDER BY rep_pct DESC, doc_id
      """.stripMargin.trim)),

    // Curation funnel: the per-source survival report of a staged
    // training-data filter chain — language allowlist → token-length
    // band → repetition cap → exact-dedup survivors. Cumulative stage
    // predicates are integer-exact (the repetition cap compares
    // integer-division results, no float thresholds), so the whole
    // funnel is portable; one scan, one aggregation.
    GraftQuery(
      "q85_curation_funnel",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("source"), col("lang"), col("text"))
        val staged = graft.operators.ShingleStats.withShingleStats(d, "text")
          .select(col("source"), col("text"),
            col("lang").isin("en", "fr", "de", "es").as("c1"),
            col("n_tok"), col("n_ngrams"), col("n_distinct"))
          .withColumn("c2", col("c1") && col("n_tok").between(40, 120))
          .withColumn("c3",
            col("c2") && expr("(100 * n_distinct) div n_ngrams >= 70"))
        staged.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_total"),
            sum(when(col("c1"), 1L).otherwise(0L)).as("n_lang"),
            sum(when(col("c2"), 1L).otherwise(0L)).as("n_len"),
            sum(when(col("c3"), 1L).otherwise(0L)).as("n_rep"),
            countDistinct(when(col("c3"), md5(col("text")))).as("n_unique"))
          .orderBy(col("source"))
      },
      Some("""
        WITH t AS (SELECT source, text, lang, string_split(text, ' ') AS tok
                   FROM documents),
        m AS (SELECT source, text,
                     lang IN ('en','fr','de','es') AS c1,
                     CAST(len(tok) AS BIGINT) AS n_tok,
                     CAST(len(tok) - 2 AS BIGINT) AS n_ngrams,
                     CAST(len(list_distinct([tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]
                                             for i in range(1, len(tok) - 1)])) AS BIGINT) AS n_distinct
              FROM t),
        c AS (SELECT source, text, c1,
                     c1 AND n_tok BETWEEN 40 AND 120 AS c2,
                     c1 AND n_tok BETWEEN 40 AND 120
                        AND (100 * n_distinct) // n_ngrams >= 70 AS c3
              FROM m)
        SELECT source, COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
               CAST(SUM(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
               CAST(SUM(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
               CAST(COUNT(DISTINCT CASE WHEN c3 THEN md5(text) END) AS BIGINT) AS n_unique
        FROM c GROUP BY source ORDER BY source
      """.stripMargin.trim)),

    // Context-window chunking: split each document into overlapping
    // token windows (size 64, stride 48) — the slicing step that turns
    // curated documents into model-ready training sequences. Map-only
    // (tokenize + sequence/explode + slice run inside one codegen
    // stage, no shuffle until the final presentation sort), so it
    // streams at scan speed over any corpus size; chunk identity is
    // carried as an md5 of the joined window so the result stays
    // narrow no matter how wide the documents are.
    GraftQuery(
      "q89_text_chunk",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
              lit(48))).as("start"))
          .select(col("doc_id"), expr("start div 48").cast("long").as("chunk_idx"),
            slice(col("toks"), col("start") + 1, lit(64)).as("chunk"))
          .select(col("doc_id"), col("chunk_idx"),
            size(col("chunk")).cast("long").as("n_tokens"),
            md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        s AS (SELECT doc_id, toks, unnest(range(0, greatest(len(toks), 1), 48)) AS start
              FROM t),
        c AS (SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
                     list_slice(toks, start + 1, start + 64) AS chunk
              FROM s)
        SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_tokens,
               md5(array_to_string(chunk, ' ')) AS chunk_md5
        FROM c ORDER BY doc_id, chunk_idx
      """.stripMargin.trim)),

    // Token-distribution quality signals per document: Shannon entropy
    // of the unigram distribution (low = repetitive/boilerplate, the
    // gibberish/spam detector perplexity filters approximate) plus the
    // exact-integer Simpson collision mass (probability two sampled
    // tokens collide, in ppm). Two keyed shuffles (doc×token counts,
    // then per-doc fold) — both partial-aggregated map-side.
    // Determinism: c·ln(c) terms are rounded to 9dp and summed as
    // DECIMAL so the fold is order-independent (ln() itself is ~1 ulp
    // cross-engine, far below the grain — the q44 contract); the
    // Simpson ratio is pure integer arithmetic (coll·1e6 stays under
    // Long.Max for documents up to ~3e6 tokens).
    GraftQuery(
      "q92_text_entropy",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        // one repartition on doc_id serves BOTH aggregates (hash(doc_id)
        // satisfies the (doc_id, tok) clustering too), and it moves the
        // compact documents rather than exploded token rows — the old
        // shape shuffled partial (doc, tok, c) triples and then
        // re-exchanged on doc_id (r16 opt: 3 exchanges → 2)
        d.select(col("doc_id"), col("text"))
          .repartition(col("doc_id"))
          .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
          // count by the token's 64-bit hash, not the string: the
          // distribution statistics only need COUNTS of distinct
          // tokens, and the 8-byte key shrinks the per-task aggregate
          // state ~5× (token strings dominated it — at 100× corpus the
          // explode+agg stage was GC-bound; measured 11.2 → 9.1 s at
          // 32 cores). Within-doc xxhash64 collision odds ~n²/2⁶⁴ ≈
          // 1e-13 even for million-token documents (same order as the
          // engine's other 64-bit-hash contracts, q71's FNV postings
          // included).
          .groupBy(col("doc_id"), xxhash64(col("tok")).as("tok"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(
            sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            sum(round(col("c").cast("double") * log(col("c").cast("double")), 9)
              .cast("decimal(28,9)")).as("clogc"),
            sum(col("c") * (col("c") - 1L)).as("coll"))
          .select(col("doc_id"),
            col("n_tokens").cast("long").as("n_tokens"),
            col("n_distinct").cast("long").as("n_distinct"),
            round(log(col("n_tokens").cast("double")) -
              col("clogc").cast("double") / col("n_tokens").cast("double"), 6)
              .as("entropy"),
            when(col("n_tokens") > 1L,
                expr("(coll * 1000000L) div (n_tokens * (n_tokens - 1L))"))
              .otherwise(lit(0L)).as("collision_ppm"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok),
        a AS (SELECT doc_id,
                     CAST(SUM(c) AS BIGINT) AS n_tokens,
                     CAST(COUNT(*) AS BIGINT) AS n_distinct,
                     SUM(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(28,9))) AS clogc,
                     CAST(SUM(c * (c - 1)) AS BIGINT) AS coll
              FROM c GROUP BY doc_id)
        SELECT doc_id, n_tokens, n_distinct,
               round(ln(CAST(n_tokens AS DOUBLE)) - CAST(clogc AS DOUBLE) / n_tokens, 6) AS entropy,
               CASE WHEN n_tokens > 1
                    THEN CAST((coll * 1000000) // (n_tokens * (n_tokens - 1)) AS BIGINT)
                    ELSE 0 END AS collision_ppm
        FROM a ORDER BY doc_id
      """.stripMargin.trim),
      headline = true),

    // BPE-style pair statistics — the first iteration of byte-pair
    // vocab induction at corpus scale: count adjacent character pairs
    // inside tokens, report the top merge candidates. Two row-level
    // explodes (token, then character position) keep everything inside
    // whole-stage codegen — no per-element lambdas — and the single
    // shuffle is the pair-count aggregate with map-side partials.
    GraftQuery(
      "q101_bpe_pairs",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.select(explode(TextFns.tokens(col("text"))).as("tok"))
          .filter(length(col("tok")) >= 2)
          .select(col("tok"),
            explode(sequence(lit(1), length(col("tok")) - 1)).as("i"))
          .select(col("tok").substr(col("i"), lit(2)).as("pair"))
          .groupBy(col("pair"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(30)
      },
      Some("""
        WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        p AS (SELECT tok, unnest(range(1, len(tok))) AS i
              FROM t WHERE len(tok) >= 2)
        SELECT substr(tok, i, 2) AS pair, COUNT(*) AS n
        FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 30
      """.stripMargin.trim)),

    // Count-min-sketch heavy hitters — the frequency member of the
    // sketch family (q7 HLL = cardinality, q87 Bloom = membership):
    // token counts estimated from a fixed 2×1024-cell sketch instead
    // of a full token groupBy, the streaming/mergeable shape (cells
    // sum across partitions and epochs; the exact table does not).
    // The estimate column sits next to the exact count, so the CMS
    // guarantee (cms_n ≥ exact_n, overcount bounded by collisions) is
    // visible in the output. Everything is integer arithmetic over
    // portable md5-derived bucket ids, so DuckDB replays the sketch
    // cell-for-cell — same doctrine as q87's bit-replayed Bloom.
    GraftQuery(
      "q107_cms_heavy_hitters",
      (s, dir) => {
        val W = 1024
        val toks = Tables.load(s, dir, "documents")
          .select(explode(TextFns.tokens(col("text"))).as("t"))
        def bucket(salt: String) =
          TextFns.md5hash60(concat(lit(salt), col("t"))) % W
        // the sketch: 2×W cells, one partial-agg shuffle of ≤ 2·W rows
        val cells = toks
          .select(explode(array(
            struct(lit(0).as("r"), bucket("cms0:").as("b")),
            struct(lit(1).as("r"), bucket("cms1:").as("b")))).as("rb"))
          .select(col("rb.r"), col("rb.b"))
          .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
        // point queries: each distinct token reads its 2 cells (tiny
        // broadcast), estimate = min over rows; exact count alongside
        val exact = toks.groupBy(col("t")).agg(count(lit(1)).as("exact_n"))
          .withColumn("b0", bucket("cms0:")).withColumn("b1", bucket("cms1:"))
        exact
          .join(broadcast(cells.filter(col("r") === 0)
            .select(col("b").as("b0"), col("c").as("c0"))), Seq("b0"))
          .join(broadcast(cells.filter(col("r") === 1)
            .select(col("b").as("b1"), col("c").as("c1"))), Seq("b1"))
          .select(col("t"), col("exact_n"),
            least(col("c0"), col("c1")).as("cms_n"))
          .withColumn("overcount", col("cms_n") - col("exact_n"))
          .orderBy(col("cms_n").desc, col("t"))
          .limit(20)
      },
      Some("""
        WITH toks AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        h AS (SELECT t,
                     ('0x' || substr(md5('cms0:' || t), 1, 15))::BIGINT % 1024 AS b0,
                     ('0x' || substr(md5('cms1:' || t), 1, 15))::BIGINT % 1024 AS b1
              FROM toks),
        c0 AS (SELECT b0, COUNT(*) AS c FROM h GROUP BY b0),
        c1 AS (SELECT b1, COUNT(*) AS c FROM h GROUP BY b1),
        exact AS (SELECT t, ANY_VALUE(b0) AS b0, ANY_VALUE(b1) AS b1,
                         COUNT(*) AS exact_n
                  FROM h GROUP BY t)
        SELECT e.t, e.exact_n, LEAST(c0.c, c1.c) AS cms_n,
               LEAST(c0.c, c1.c) - e.exact_n AS overcount
        FROM exact e JOIN c0 USING (b0) JOIN c1 USING (b1)
        ORDER BY cms_n DESC, t LIMIT 20
      """.stripMargin.trim))
  )
}

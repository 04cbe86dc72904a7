package graft.queries

import graft.GraftQuery
import graft.search.QueryDsl
import graft.sources.Tables

/** Search requests expressed as OpenSearch-style query-DSL JSON and
  * compiled by [[graft.search.QueryDsl]] — the reference's client
  * contract (request bodies against the SEARCH collection,
  * /root/reference/lib/opensearch-dynamodb-etl-cdk-stack.ts:91).
  * q135–q137 reuse the handwritten q40/q41/q43 oracles VERBATIM: the
  * compiled plan must be indistinguishable from the handwritten one.
  * q138/q139 exercise request shapes no handwritten query covers
  * (scored bool with should clauses + from/size; histogram buckets).
  * q140 reuses q123's keyset-paging oracle verbatim; q141–q144 gate
  * the scoring clauses (fuzzy, dis_max, boosting, pinned) and
  * q145–q147 the bucket aggs (range, significant_terms, top_hits)
  * against fresh DuckDB oracles in the exact-integer scoring model.
  * q148–q153 extend the sweep: multi_match, function_score,
  * simple_query_string, the filters bucket agg, ids+regexp under
  * bool, and distance_feature — same integer determinism.
  * q157–q166 complete it: nested (q120's flat-child oracle), discrete
  * percentiles, then the corpus-state request-level members gated by
  * their handwritten donors' oracles VERBATIM — more_like_this
  * (q118), span_near both orders (q126/q133), the term-suggest
  * section (q117), composite-with-after (q45) — plus rank_feature,
  * geo_distance (q125's recipe) and the highlight section (q46's).
  */
object DslSearch {

  /** DuckDB replay of `QueryDsl.geohashCol`'s exact bit arithmetic —
    * the SAME quantize → interleave → base-32 pipeline generated as
    * SQL (`>> & <<` + substr) so the q250 oracle can never drift from
    * the engine's formula by re-derivation. Returns (ixExpr, iyExpr,
    * codeExpr over ix/iy, hashExpr over code).
    */
  private def geohashSqlParts(p: Int): (String, String, String, String) = {
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    val total = 5 * p
    val xb = (total + 1) / 2
    val yb = total / 2
    def quant(v: String, off: String, span: String, bits: Int): String =
      s"CAST(least(greatest(floor((($v) + $off) / $span * ${1L << bits}.0), " +
        s"0.0), ${(1L << bits) - 1}.0) AS BIGINT)"
    val ix = quant("lon", "180.0", "360.0", xb)
    val iy = quant("lat", "90.0", "180.0", yb)
    val lonPos: Int => Int = j => if (total % 2 == 1) 2 * j else 2 * j + 1
    val latPos: Int => Int = j => if (total % 2 == 1) 2 * j + 1 else 2 * j
    val code = ((0 until xb).map(j => s"(((ix >> $j) & 1) << ${lonPos(j)})") ++
      (0 until yb).map(j => s"(((iy >> $j) & 1) << ${latPos(j)})"))
      .mkString(" + ")
    val hash = (0 until p).map(j =>
      s"substr('$alphabet', CAST((code >> ${5 * (p - 1 - j)}) & 31 AS INT) + 1, 1)")
      .mkString(" || ")
    (ix, iy, code, hash)
  }

  def queries: Seq[GraftQuery] = Seq(
    // q40 as a JSON request. Same oracle, same result — the compiler
    // emits the same pushable predicates (isin/between/startsWith).
    GraftQuery(
      "q135_dsl_bool",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {
             "must": [
               {"terms": {"lang": ["en", "fr"]}},
               {"range": {"n_chars": {"gte": 200, "lte": 400}}},
               {"prefix": {"text": "the "}}],
             "must_not": [{"term": {"source": "src0"}}]}},
           "sort": ["doc_id"],
           "_source": ["doc_id", "lang", "source", "n_chars"]}"""),
      Some("""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE lang IN ('en','fr') AND n_chars BETWEEN 200 AND 400
          AND source <> 'src0' AND text LIKE 'the %'
        ORDER BY doc_id
      """.stripMargin.trim)),

    // q41 as a JSON request: match scoring (distinct-term overlap,
    // LONG) with minimum_should_match gating the predicate.
    GraftQuery(
      "q136_dsl_match",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match": {"text":
             {"query": "spark join window", "minimum_should_match": 2}}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 50,
           "_source": ["doc_id", "score", "lang"]}"""),
      Some("""
        WITH scored AS (
          SELECT doc_id, lang,
                 CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                         ['spark','join','window'])) AS BIGINT) AS score
          FROM documents)
        SELECT doc_id, score, lang FROM scored
        WHERE score >= 2 ORDER BY score DESC, doc_id LIMIT 50
      """.stripMargin.trim)),

    // q43 as a JSON request: term query + terms bucket agg with three
    // metric sub-aggs — one groupBy shuffle, exact-sum/count average.
    GraftQuery(
      "q137_dsl_terms_stats",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"source": {"terms": {"field": "source"},
             "aggs": {
               "min_chars": {"min": {"field": "n_chars"}},
               "max_chars": {"max": {"field": "n_chars"}},
               "avg_chars": {"avg": {"field": "n_chars"}}}}}}"""),
      Some("""
        SELECT source, COUNT(*) AS doc_count,
               MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        FROM documents WHERE lang = 'en'
        GROUP BY source ORDER BY doc_count DESC, source
      """.stripMargin.trim)),

    // A request shape no handwritten query covers: scored bool (musts
    // contribute a constant 2, each matched should adds 1 — all LONG,
    // no float ties), _score-led sort, from/size paging.
    GraftQuery(
      "q138_dsl_scored_bool",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {
             "must": [
               {"terms": {"lang": ["en", "de"]}},
               {"range": {"n_chars": {"gte": 150, "lte": 450}}}],
             "must_not": [{"term": {"source": "src5"}}],
             "should": [
               {"match_phrase": {"text": "spark join"}},
               {"prefix": {"text": "data "}},
               {"wildcard": {"source": "src1*"}}]}},
           "sort": [{"_score": "desc"}, {"n_chars": "desc"}, "doc_id"],
           "from": 5, "size": 25,
           "_source": ["doc_id", "lang", "source", "n_chars", "score"]}"""),
      Some("""
        WITH hits AS (
          SELECT doc_id, lang, source, n_chars,
            CAST(2
              + CASE WHEN ' ' || text || ' ' LIKE '% spark join %' THEN 1 ELSE 0 END
              + CASE WHEN text LIKE 'data %' THEN 1 ELSE 0 END
              + CASE WHEN source LIKE 'src1%' THEN 1 ELSE 0 END AS BIGINT) AS score
          FROM documents
          WHERE lang IN ('en','de') AND n_chars BETWEEN 150 AND 450
            AND source <> 'src5')
        SELECT doc_id, lang, source, n_chars, score FROM hits
        ORDER BY score DESC, n_chars DESC, doc_id LIMIT 25 OFFSET 5
      """.stripMargin.trim)),

    // histogram bucket agg with a sum sub-agg: fixed-interval buckets
    // via integer floor-divide (LONG keys both engines).
    GraftQuery(
      "q139_dsl_histogram",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"bucket": {"histogram": {"field": "n_chars", "interval": 100},
             "aggs": {"sum_chars": {"sum": {"field": "n_chars"}}}}}}"""),
      Some("""
        SELECT CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS bucket,
               COUNT(*) AS doc_count, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE lang = 'en'
        GROUP BY 1 ORDER BY doc_count DESC, bucket
      """.stripMargin.trim)),

    // q123 as a JSON request: `search_after` keyset paging. The
    // compiled keyset predicate over the (n_chars desc, doc_id asc)
    // sort must be EXACTLY q123's handwritten filter — same oracle
    // verbatim. O(page) at any depth; `from` would sort the prefix.
    GraftQuery(
      "q140_dsl_search_after",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"sort": [{"n_chars": "desc"}, "doc_id"],
           "search_after": [300, 250],
           "size": 10,
           "_source": ["doc_id", "n_chars", "lang"]}"""),
      Some("""
        SELECT doc_id, n_chars, lang FROM documents
        WHERE n_chars < 300 OR (n_chars = 300 AND doc_id > 250)
        ORDER BY n_chars DESC, doc_id
        LIMIT 10
      """.stripMargin.trim)),

    // fuzzy as a JSON request: score = distinct tokens within 1 edit
    // of 'spark' whose first letter matches (prefix_length 1 — the
    // term-dictionary walk bound). Map-only, LONG scores.
    GraftQuery(
      "q141_dsl_fuzzy",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"fuzzy": {"text":
             {"value": "spark", "fuzziness": 1, "prefix_length": 1}}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 40,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(list_filter(list_distinct(string_split(text, ' ')),
                        x -> x LIKE 's%' AND levenshtein(x, 'spark') <= 1)) AS BIGINT) AS score
          FROM documents)
        SELECT doc_id, score FROM t
        WHERE score >= 1
        ORDER BY score DESC, doc_id
        LIMIT 40
      """.stripMargin.trim)),

    // dis_max as a JSON request: best-clause-wins over two match
    // clauses with tie_breaker 0.3 — ppm-scaled exact-integer score
    // (best·10⁶ + rest·3·10⁵), so cross-engine ordering is exact.
    GraftQuery(
      "q142_dsl_dis_max",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"dis_max": {
             "queries": [
               {"match": {"text": "spark join"}},
               {"match": {"text": "window merge data"}}],
             "tie_breaker": 0.3}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                    ['spark','join'])) AS BIGINT) AS s1,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                    ['window','merge','data'])) AS BIGINT) AS s2
          FROM documents)
        SELECT doc_id,
               greatest(s1, s2) * 1000000
                 + (s1 + s2 - greatest(s1, s2)) * 300000 AS score
        FROM t
        WHERE s1 >= 1 OR s2 >= 1
        ORDER BY score DESC, doc_id
        LIMIT 30
      """.stripMargin.trim)),

    // boosting as a JSON request: hits from src3 DEMOTED to ¼ of the
    // positive match score (not excluded — what must_not cannot say).
    // Exact ppm integers: score = overlap × 10⁶ or × 250 000.
    GraftQuery(
      "q143_dsl_boosting",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"boosting": {
             "positive": {"match": {"text": "spark join"}},
             "negative": {"term": {"source": "src3"}},
             "negative_boost": 0.25}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id, source,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                    ['spark','join'])) AS BIGINT) AS s
          FROM documents)
        SELECT doc_id,
               s * (CASE WHEN source = 'src3' THEN 250000 ELSE 1000000 END) AS score
        FROM t
        WHERE s >= 1
        ORDER BY score DESC, doc_id
        LIMIT 30
      """.stripMargin.trim)),

    // pinned as a JSON request: curated doc_ids rank above every
    // organic hit in the curators' order (pin scores 10¹² + n − pos,
    // clear of any organic score); organic hits keep their match
    // score. DuckDB's list_position yields NULL for "not pinned" —
    // the CASE collapses it exactly like Spark's 0.
    GraftQuery(
      "q144_dsl_pinned",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"pinned": {
             "ids": [42, 7, 123],
             "id_field": "doc_id",
             "organic": {"match": {"text": "spark"}}}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 15,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                    ['spark'])) AS BIGINT) AS s,
            CAST(list_position([42, 7, 123], doc_id) AS BIGINT) AS pin
          FROM documents)
        SELECT doc_id,
               CASE WHEN pin > 0 THEN 1000000000000 + (3 - pin) ELSE s END AS score
        FROM t
        WHERE s >= 1 OR pin > 0
        ORDER BY score DESC, doc_id
        LIMIT 15
      """.stripMargin.trim)),

    // range bucket agg: explicit [from, to) buckets that OVERLAP — a
    // doc lands in every range containing it, so this is one pass of
    // per-range filtered aggregates (a single partial-agg exchange,
    // never one scan per range) reshaped to request order.
    GraftQuery(
      "q145_dsl_range_agg",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"len": {"range": {"field": "n_chars",
               "ranges": [{"to": 200}, {"from": 150, "to": 350}, {"from": 300}]},
             "aggs": {
               "avg_chars": {"avg": {"field": "n_chars"}},
               "sum_chars": {"sum": {"field": "n_chars"}}}}}}"""),
      Some("""
        WITH en AS (SELECT n_chars FROM documents WHERE lang = 'en'),
        b AS (
          SELECT 0 AS ord, '*-200' AS len, COUNT(*) AS doc_count,
                 CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
                 CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM en WHERE n_chars < 200
          UNION ALL
          SELECT 1, '150-350', COUNT(*),
                 CAST(SUM(n_chars) AS DOUBLE) / COUNT(*),
                 CAST(SUM(n_chars) AS BIGINT)
          FROM en WHERE n_chars >= 150 AND n_chars < 350
          UNION ALL
          SELECT 2, '300-*', COUNT(*),
                 CAST(SUM(n_chars) AS DOUBLE) / COUNT(*),
                 CAST(SUM(n_chars) AS BIGINT)
          FROM en WHERE n_chars >= 300)
        SELECT len, doc_count, avg_chars, sum_chars FROM b ORDER BY ord
      """.stripMargin.trim)),

    // significant_terms as a JSON request: sources over-represented
    // among docs matching 'spark' vs the whole corpus, scored by the
    // exact-ppm doc-frequency ratio (the q49 model with keyword
    // whole-value semantics). One groupBy over the base table carries
    // both counts; totals ride along broadcast.
    GraftQuery(
      "q146_dsl_significant_terms",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match": {"text": "spark"}},
           "aggs": {"sig_src": {"significant_terms":
             {"field": "source", "min_doc_count": 2, "size": 8}}}}"""),
      Some("""
        WITH base AS (
          SELECT source,
                 CASE WHEN list_contains(list_distinct(string_split(text, ' ')), 'spark')
                      THEN 1 ELSE 0 END AS fg
          FROM documents),
        per AS (
          SELECT source AS sig_src, COUNT(*) AS bg_count,
                 CAST(SUM(fg) AS BIGINT) AS doc_count
          FROM base GROUP BY source),
        tot AS (SELECT COUNT(*) AS n_all, CAST(SUM(fg) AS BIGINT) AS n_fg FROM base)
        SELECT sig_src, doc_count, bg_count,
               (doc_count * n_all * 1000000) // (bg_count * n_fg) AS score_ppm
        FROM per, tot
        WHERE doc_count >= 2
        ORDER BY score_ppm DESC, sig_src
        LIMIT 8
      """.stripMargin.trim)),

    // terms bucket + top_hits sub-agg: the top-2 hit ROWS per source
    // (one window over the hits partitioned by the bucket key — never
    // a per-bucket re-scan), with a total per-bucket sort for
    // deterministic output.
    GraftQuery(
      "q147_dsl_top_hits",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"by_source": {"terms": {"field": "source"},
             "aggs": {"top": {"top_hits": {
               "size": 2,
               "sort": [{"n_chars": "desc"}, "doc_id"],
               "_source": ["doc_id", "n_chars"]}}}}}}"""),
      Some("""
        WITH ranked AS (
          SELECT source AS by_source,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank,
                 doc_id, n_chars
          FROM documents WHERE lang = 'en')
        SELECT by_source, rank, doc_id, n_chars FROM ranked
        WHERE rank <= 2
        ORDER BY by_source, rank
      """.stripMargin.trim)),

    // multi_match most_fields: one query text against text AND source,
    // matched per-field overlaps summed (plain LONG — no ppm needed
    // when fields add rather than compete). A hit is ANY field
    // reaching minimum_should_match.
    GraftQuery(
      "q148_dsl_multi_match",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"multi_match": {"query": "spark src3",
             "fields": ["text", "source"], "type": "most_fields"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 40,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                    ['spark','src3'])) AS BIGINT) AS st,
            CAST(len(list_intersect(list_distinct(string_split(source, ' ')),
                                    ['spark','src3'])) AS BIGINT) AS ss
          FROM documents)
        SELECT doc_id,
               (CASE WHEN st >= 1 THEN st ELSE 0 END
                + CASE WHEN ss >= 1 THEN ss ELSE 0 END) AS score
        FROM t WHERE st >= 1 OR ss >= 1
        ORDER BY score DESC, doc_id
        LIMIT 40
      """.stripMargin.trim)),

    // function_score: integer-weighted filter functions re-scoring a
    // match query — weights 3 (lang=en) and 2 (long docs) sum, then
    // MULTIPLY the query score; a hit matching no function keeps its
    // query score (neutral ×1). All-integer, so cross-engine exact.
    GraftQuery(
      "q149_dsl_function_score",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"function_score": {
             "query": {"match": {"text": "spark"}},
             "functions": [
               {"filter": {"term": {"lang": "en"}}, "weight": 3},
               {"filter": {"range": {"n_chars": {"gte": 400}}}, "weight": 2}],
             "score_mode": "sum", "boost_mode": "multiply"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id, lang, n_chars,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                    ['spark'])) AS BIGINT) AS q
          FROM documents)
        SELECT doc_id,
               q * (CASE WHEN lang = 'en' OR n_chars >= 400
                    THEN (CASE WHEN lang = 'en' THEN 3 ELSE 0 END
                          + CASE WHEN n_chars >= 400 THEN 2 ELSE 0 END)
                    ELSE 1 END) AS score
        FROM t WHERE q >= 1
        ORDER BY score DESC, doc_id
        LIMIT 30
      """.stripMargin.trim)),

    // simple_query_string: the human query syntax — `+join` pins a
    // must, `-merge` a must-not, bare `spark` and the quoted phrase
    // are shoulds that add to the score when matched (bool model).
    GraftQuery(
      "q150_dsl_simple_query_string",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"simple_query_string": {
             "query": "spark +join -merge \"data window\"",
             "fields": ["text"]}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 40,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id,
            list_contains(string_split(text, ' '), 'join') AS has_join,
            list_contains(string_split(text, ' '), 'merge') AS has_merge,
            list_contains(string_split(text, ' '), 'spark') AS has_spark,
            (' ' || text || ' ') LIKE '% data window %' AS has_phrase
          FROM documents)
        SELECT doc_id,
               CAST(1 + (CASE WHEN has_spark THEN 1 ELSE 0 END)
                      + (CASE WHEN has_phrase THEN 1 ELSE 0 END) AS BIGINT) AS score
        FROM t WHERE has_join AND NOT has_merge
        ORDER BY score DESC, doc_id
        LIMIT 40
      """.stripMargin.trim)),

    // filters bucket agg: named, overlapping buckets each defined by a
    // full sub-query, computed in ONE pass of filtered aggregates
    // (never a scan per bucket), rows in request order.
    GraftQuery(
      "q151_dsl_filters_agg",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"kind": {"filters": {"filters": {
               "short": {"range": {"n_chars": {"lt": 250}}},
               "sparky": {"match": {"text": "spark"}},
               "src_one": {"prefix": {"source": "src1"}}}},
             "aggs": {
               "avg_chars": {"avg": {"field": "n_chars"}},
               "sum_chars": {"sum": {"field": "n_chars"}}}}}}"""),
      Some("""
        WITH en AS (SELECT * FROM documents WHERE lang = 'en'),
        b AS (
          SELECT 0 AS ord, 'short' AS kind, COUNT(*) AS doc_count,
                 CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
                 CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM en WHERE n_chars < 250
          UNION ALL
          SELECT 1, 'sparky', COUNT(*),
                 CAST(SUM(n_chars) AS DOUBLE) / COUNT(*),
                 CAST(SUM(n_chars) AS BIGINT)
          FROM en WHERE list_contains(list_distinct(string_split(text, ' ')), 'spark')
          UNION ALL
          SELECT 2, 'src_one', COUNT(*),
                 CAST(SUM(n_chars) AS DOUBLE) / COUNT(*),
                 CAST(SUM(n_chars) AS BIGINT)
          FROM en WHERE source LIKE 'src1%')
        SELECT kind, doc_count, avg_chars, sum_chars FROM b ORDER BY ord
      """.stripMargin.trim)),

    // ids + regexp under bool: the whole-value-anchored regexp keeps
    // only single-digit sources (src0–src9, never src10+), and the
    // ids should-clause lifts three curated docs by +1 score.
    GraftQuery(
      "q152_dsl_ids_regexp",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {
             "must": [{"regexp": {"source": {"value": "src[0-9]"}}}],
             "should": [{"ids": {"values": [5, 10, 15], "field": "doc_id"}}]}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 50,
           "_source": ["doc_id", "source", "score"]}"""),
      Some("""
        SELECT doc_id, source,
               CAST(1 + CASE WHEN doc_id IN (5, 10, 15) THEN 1 ELSE 0 END
                    AS BIGINT) AS score
        FROM documents
        WHERE regexp_full_match(source, 'src[0-9]')
        ORDER BY score DESC, doc_id
        LIMIT 50
      """.stripMargin.trim)),

    // distance_feature: proximity decay toward 300 chars with pivot 50
    // — boost = pivot×10⁶ div (pivot + distance), exact integer ppm,
    // so the decay ordering is engine-portable with zero float ties.
    GraftQuery(
      "q153_dsl_distance_feature",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"distance_feature":
             {"field": "n_chars", "origin": 300, "pivot": 50}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 25,
           "_source": ["doc_id", "n_chars", "score"]}"""),
      Some("""
        SELECT doc_id, n_chars,
               CAST(50000000 AS BIGINT) // (50 + abs(n_chars - 300)) AS score
        FROM documents
        WHERE n_chars IS NOT NULL
        ORDER BY score DESC, doc_id
        LIMIT 25
      """.stripMargin.trim)),

    // nested as a JSON request: q120's same-element conjunction
    // (qty ≥ 48 AND disc ≤ 0.02 on the SAME line item — a flattened
    // field would match across different items) over the orders-with-
    // line-items layout, score_mode sum = matching-element count. The
    // oracle evaluates the same-row conjunction on the flat child
    // table; equal results IS the nested-semantics contract.
    GraftQuery(
      "q157_dsl_nested",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val li = Tables.load(s, dir, "lineitem")
        val nested = li.groupBy(col("l_orderkey").as("order_key"))
          .agg(array_sort(collect_list(struct(
            col("l_linenumber").as("ln"),
            col("l_quantity").as("qty"),
            col("l_discount").as("disc")))).as("items"))
        QueryDsl.search(nested,
          """{"query": {"nested": {"path": "items",
               "query": {"bool": {"must": [
                 {"range": {"items.qty": {"gte": 48.0}}},
                 {"range": {"items.disc": {"lte": 0.02}}}]}},
               "score_mode": "sum"}},
             "sort": [{"_score": "desc"}, "order_key"],
             "size": 20,
             "_source": ["order_key", "score"]}""")
      },
      Some("""
        SELECT l_orderkey AS order_key,
               CAST(SUM(CASE WHEN l_quantity >= 48.0 AND l_discount <= 0.02
                             THEN 1 ELSE 0 END) AS BIGINT) AS score
        FROM lineitem
        GROUP BY 1
        HAVING SUM(CASE WHEN l_quantity >= 48.0 AND l_discount <= 0.02
                        THEN 1 ELSE 0 END) >= 1
        ORDER BY score DESC, order_key
        LIMIT 20
      """.stripMargin.trim)),

    // percentiles metric agg: DISCRETE percentiles (percentile_disc —
    // an actual data value, engine-exact with no interpolation, where
    // OpenSearch itself would serve a t-digest approximation) beside
    // plain metrics in one global aggregate row.
    GraftQuery(
      "q158_dsl_percentiles",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {
             "len": {"percentiles": {"field": "n_chars",
                                     "percents": [25, 50, 75, 90]}},
             "n": {"value_count": {"field": "n_chars"}}}}"""),
      Some("""
        SELECT CAST(quantile_disc(n_chars, 0.25) AS DOUBLE) AS len_p25,
               CAST(quantile_disc(n_chars, 0.50) AS DOUBLE) AS len_p50,
               CAST(quantile_disc(n_chars, 0.75) AS DOUBLE) AS len_p75,
               CAST(quantile_disc(n_chars, 0.90) AS DOUBLE) AS len_p90,
               COUNT(n_chars) AS n
        FROM documents WHERE lang = 'en'
      """.stripMargin.trim)),

    // more_like_this as a JSON request — q118's oracle VERBATIM: the
    // request-level compile must be indistinguishable from the
    // handwritten facade pipeline (seed tf·idf terms broadcast into
    // the postings, integer idf-weight scoring, request-ranked).
    GraftQuery(
      "q159_dsl_more_like_this",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"more_like_this": {
             "fields": ["text"],
             "like": {"doc_id": 7},
             "max_query_terms": 10}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 15,
           "_source": ["doc_id", "n_shared", "score"]}"""),
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        seed AS (
          SELECT tf.term,
                 (CAST(tf.tf AS BIGINT) * (SELECT n FROM n)) / CAST(df.df AS BIGINT) AS sel,
                 ((SELECT n FROM n) * 1000000) // CAST(df.df AS BIGINT) AS weight
          FROM tf JOIN df USING (term) WHERE tf.doc_id = 7),
        qt AS (SELECT term, weight,
                 ROW_NUMBER() OVER (ORDER BY sel DESC, term) AS r FROM seed),
        top AS (SELECT term, weight FROM qt WHERE r <= 10)
        SELECT tf.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared,
               CAST(SUM(weight) AS BIGINT) AS score
        FROM tf JOIN top USING (term)
        WHERE tf.doc_id <> 7
        GROUP BY tf.doc_id
        ORDER BY score DESC, doc_id
        LIMIT 15
      """.stripMargin.trim)),

    // span_near as a JSON request — q126's oracle VERBATIM (unordered
    // proximity, slop 3): score = pair count, so the request's
    // _score-led sort reproduces the handwritten ranking exactly.
    GraftQuery(
      "q160_dsl_span_near",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"span_near": {
             "clauses": [
               {"span_term": {"text": "spark"}},
               {"span_term": {"text": "join"}}],
             "slop": 3, "in_order": false, "id_field": "doc_id"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 25,
           "_source": ["doc_id", "n_pairs", "min_gap"]}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        pos AS (
          SELECT doc_id, unnest(a) AS tok,
                 unnest(range(1, len(a) + 1)) AS p
          FROM arr),
        p1 AS (SELECT doc_id, p FROM pos WHERE tok = 'spark'),
        p2 AS (SELECT doc_id, p FROM pos WHERE tok = 'join'),
        g AS (
          SELECT p1.doc_id, CAST(abs(p1.p - p2.p) - 1 AS BIGINT) AS gap
          FROM p1 JOIN p2 USING (doc_id)
          WHERE abs(p1.p - p2.p) - 1 <= 3)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs, MIN(gap) AS min_gap
        FROM g GROUP BY 1
        ORDER BY n_pairs DESC, doc_id
        LIMIT 25
      """.stripMargin.trim)),

    // ordered span as a JSON request — q133's oracle VERBATIM
    // (in_order: true fixes the direction, gap = p2 − p1 − 1).
    GraftQuery(
      "q161_dsl_span_ordered",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"span_near": {
             "clauses": [
               {"span_term": {"text": "stream"}},
               {"span_term": {"text": "merge"}}],
             "slop": 3, "in_order": true, "id_field": "doc_id"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 25,
           "_source": ["doc_id", "n_pairs", "min_gap"]}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        pos AS (
          SELECT doc_id, unnest(a) AS tok,
                 unnest(range(1, len(a) + 1)) AS p
          FROM arr),
        p1 AS (SELECT doc_id, p FROM pos WHERE tok = 'stream'),
        p2 AS (SELECT doc_id, p FROM pos WHERE tok = 'merge'),
        g AS (
          SELECT p1.doc_id, CAST(p2.p - p1.p - 1 AS BIGINT) AS gap
          FROM p1 JOIN p2 USING (doc_id)
          WHERE p2.p > p1.p AND p2.p - p1.p - 1 <= 3)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs, MIN(gap) AS min_gap
        FROM g GROUP BY 1
        ORDER BY n_pairs DESC, doc_id
        LIMIT 25
      """.stripMargin.trim)),

    // the suggest request section, term suggester — q117's oracle
    // VERBATIM: per input token the top-3 in-vocabulary corrections
    // within 2 edits, ranked (distance, frequency desc, term).
    GraftQuery(
      "q162_dsl_term_suggest",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"suggest": {"spelling": {
             "text": "sprk windoow joinn merg",
             "term": {"field": "text", "max_edits": 2, "size": 3}}}}"""),
      Some("""
        WITH v AS (
          SELECT tok AS term, COUNT(*) AS freq
          FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                FROM documents)
          GROUP BY 1),
        inputs(q) AS (VALUES ('sprk'), ('windoow'), ('joinn'), ('merg')),
        cand AS (
          SELECT q, term, CAST(levenshtein(q, term) AS BIGINT) AS dist, freq
          FROM inputs, v
          WHERE abs(len(term) - len(q)) <= 2 AND term <> q
            AND levenshtein(q, term) <= 2),
        r AS (
          SELECT q, term, dist, freq,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q ORDER BY dist, freq DESC, term) AS BIGINT) AS rank
          FROM cand)
        SELECT q, rank, term, dist, freq FROM r WHERE rank <= 3
        ORDER BY q, rank
      """.stripMargin.trim)),

    // rank_feature: static-signal saturation boost x/(x+pivot) in
    // exact integer ppm, composed under bool with a term filter — the
    // popularity-boost shape, float-free.
    GraftQuery(
      "q163_dsl_rank_feature",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {
             "filter": [{"term": {"lang": "en"}}],
             "must": [{"rank_feature": {"field": "n_chars",
                       "saturation": {"pivot": 300}}}]}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30,
           "_source": ["doc_id", "n_chars", "score"]}"""),
      Some("""
        SELECT doc_id, n_chars,
               (CAST(n_chars AS BIGINT) * 1000000) // (n_chars + 300) AS score
        FROM documents
        WHERE lang = 'en' AND n_chars IS NOT NULL AND n_chars >= 0
        ORDER BY score DESC, doc_id
        LIMIT 30
      """.stripMargin.trim)),

    // geo_distance as a JSON request over q125's deterministic
    // synthetic points: haversine rounded to 6 dp BEFORE the radius
    // comparison (one IEEE expression, fixed operand order), so the
    // boundary set is engine-portable. Filter context — map-only.
    GraftQuery(
      "q164_dsl_geo_distance",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val pts = GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer"))
        QueryDsl.search(pts,
          """{"query": {"geo_distance": {
               "distance_km": 5000.0,
               "lat_field": "lat", "lon_field": "lon",
               "origin": {"lat": 40.0, "lon": -74.0}}},
             "sort": ["c_custkey"],
             "size": 100,
             "_source": ["c_custkey", "lat", "lon"]}""")
      },
      Some("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer),
        d AS (
          SELECT c_custkey, lat, lon,
                 round(CAST(12742.0176 AS DOUBLE) * asin(sqrt(
                   sin((lat - 40.0) * pi() / 180.0 / 2.0) * sin((lat - 40.0) * pi() / 180.0 / 2.0)
                   + cos(40.0 * pi() / 180.0) * cos(lat * pi() / 180.0)
                     * sin((lon + 74.0) * pi() / 180.0 / 2.0) * sin((lon + 74.0) * pi() / 180.0 / 2.0))), 6) AS dist_km
          FROM pts)
        SELECT c_custkey, lat, lon FROM d
        WHERE dist_km <= 5000.0
        ORDER BY c_custkey
        LIMIT 100
      """.stripMargin.trim)),

    // composite agg with after — q45's oracle VERBATIM: multi-source
    // buckets in source-key order, the cursor compiled to a
    // lexicographic strictly-after predicate BEFORE the groupBy so
    // deep bucket pages prune at the scan.
    GraftQuery(
      "q165_dsl_composite_after",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"aggs": {"pages": {"composite": {
             "sources": [
               {"lang": {"terms": {"field": "lang"}}},
               {"source": {"terms": {"field": "source"}}}],
             "size": 5,
             "after": {"lang": "en", "source": "src3"}},
           "aggs": {"sum_chars": {"sum": {"field": "n_chars"}}}}}}"""),
      Some("""
        SELECT lang, source, COUNT(*) AS doc_count,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE (lang, source) > ('en', 'src3')
        GROUP BY lang, source ORDER BY lang, source LIMIT 5
      """.stripMargin.trim)),

    // highlight section: fragment + tag-wrapped occurrences around the
    // first hit of the query literal (the q46 contract), riding the
    // ordinary hit pipeline so sort/size/_source all apply.
    GraftQuery(
      "q166_dsl_highlight",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match_phrase": {"text": "window"}},
           "highlight": {"fields": {"text": {"fragment_size": 60}}},
           "sort": ["doc_id"],
           "size": 100,
           "_source": ["doc_id", "highlight"]}"""),
      Some("""
        WITH hits AS (
          SELECT doc_id, text, strpos(text, 'window') AS pos
          FROM documents
          WHERE ' ' || text || ' ' LIKE '% window %'),
        f AS (
          SELECT doc_id,
                 substr(text, CAST(greatest(pos - 20, 1) AS INT), 60) AS frag
          FROM hits)
        SELECT doc_id,
               regexp_replace(frag, 'window', '<em>window</em>', 'g') AS highlight
        FROM f ORDER BY doc_id LIMIT 100
      """.stripMargin.trim)),

    // the suggest section, phrase suggester — q121's oracle VERBATIM:
    // per-position banded candidates re-ranked by corpus bigram
    // evidence, the collate/LM idea in exact integers.
    GraftQuery(
      "q167_dsl_phrase_suggest",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"suggest": {"spelling": {
             "text": "park low",
             "phrase": {"field": "text", "max_edits": 1,
                        "per_position": 5, "size": 5}}}}"""),
      Some("""
        WITH v AS (
          SELECT tok AS term, COUNT(*) AS freq
          FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                FROM documents)
          GROUP BY 1),
        inputs(pos, q) AS (VALUES (1, 'park'), (2, 'low')),
        cand AS (
          SELECT pos, term, CAST(levenshtein(q, term) AS BIGINT) AS dist, freq
          FROM inputs, v
          WHERE abs(len(term) - len(q)) <= 1 AND levenshtein(q, term) <= 1),
        ranked AS (
          SELECT pos, term, dist, freq,
                 ROW_NUMBER() OVER (PARTITION BY pos ORDER BY dist, freq DESC, term) AS r
          FROM cand),
        p1 AS (SELECT term AS w1, dist AS d1 FROM ranked WHERE pos = 1 AND r <= 5),
        p2 AS (SELECT term AS w2, dist AS d2 FROM ranked WHERE pos = 2 AND r <= 5),
        pairs AS (SELECT w1, d1, w2, d2 FROM p1, p2),
        big AS (
          SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS bcount
          FROM (SELECT unnest(list_zip(a, a[2:])) AS p
                FROM (SELECT string_split(text, ' ') AS a FROM documents))
          WHERE p[2] IS NOT NULL
          GROUP BY 1, 2),
        scored AS (
          SELECT pairs.w1, pairs.w2,
                 CAST(COALESCE(big.bcount, 0) AS BIGINT) AS bcount,
                 d1 + d2 AS dist
          FROM pairs LEFT JOIN big USING (w1, w2)),
        r AS (
          SELECT w1, w2, bcount, dist,
                 CAST(ROW_NUMBER() OVER (ORDER BY bcount DESC, dist, w1, w2) AS BIGINT) AS rank
          FROM scored)
        SELECT rank, w1, w2, bcount, dist FROM r WHERE rank <= 5 ORDER BY rank
      """.stripMargin.trim)),

    // knn as a request: exact cosine top-10 of an inline query vector
    // (deterministic formula (i%7-3)/10, same doubles both engines)
    // over the label=1 slice — OpenSearch's filtered vector search,
    // scored by the established integer-quantize recipe.
    GraftQuery(
      "q168_dsl_knn",
      (s, dir) => {
        val vec = (0 until 64).map(i => (i % 7 - 3) / 10.0)
        QueryDsl.search(
          Tables.load(s, dir, "embeddings"),
          s"""{"knn": {
               "field": "embedding", "id_field": "vec_id",
               "query_vector": [${vec.mkString(",")}],
               "k": 10,
               "filter": {"term": {"label": 1}}}}""")
      },
      Some("""
        WITH qv AS (
          SELECT list_transform(range(0, 64),
                   i -> CAST(round(((i % 7) - 3) / 10.0 * 1e7) AS BIGINT)::DOUBLE) AS qq),
        qn AS (SELECT qq, list_dot_product(qq, qq) AS qn2 FROM qv),
        e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)::DOUBLE) AS q
          FROM embeddings WHERE label = 1),
        n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
        scored AS (
          SELECT vec_id, list_dot_product(qq, q) / (sqrt(qn2) * sqrt(n2)) AS sim
          FROM n CROSS JOIN qn),
        ranked AS (
          SELECT vec_id, sim,
                 CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
          FROM scored)
        SELECT vec_id, rank, sim FROM ranked WHERE rank <= 10 ORDER BY rank
      """.stripMargin.trim)),

    // the exact knn arm again, unfiltered and at a different k/vector —
    // the small-scale parity contract the index-served arm (KnnIndexServe
    // Spec) measures its recall against. Same integer-quantize recipe.
    GraftQuery(
      "q169_dsl_knn_exact",
      (s, dir) => {
        val vec = (0 until 64).map(i => ((i * 3) % 11 - 5) / 20.0)
        QueryDsl.search(
          Tables.load(s, dir, "embeddings"),
          s"""{"knn": {
               "field": "embedding", "id_field": "vec_id",
               "query_vector": [${vec.mkString(",")}],
               "k": 12}}""")
      },
      Some("""
        WITH qv AS (
          SELECT list_transform(range(0, 64),
                   i -> CAST(round((((i * 3) % 11) - 5) / 20.0 * 1e7) AS BIGINT)::DOUBLE) AS qq),
        qn AS (SELECT qq, list_dot_product(qq, qq) AS qn2 FROM qv),
        e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)::DOUBLE) AS q
          FROM embeddings),
        n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
        scored AS (
          SELECT vec_id, list_dot_product(qq, q) / (sqrt(qn2) * sqrt(n2)) AS sim
          FROM n CROSS JOIN qn),
        ranked AS (
          SELECT vec_id, sim,
                 CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
          FROM scored)
        SELECT vec_id, rank, sim FROM ranked WHERE rank <= 12 ORDER BY rank
      """.stripMargin.trim)),

    // query_string: the full Lucene grammar — fielded terms, grouping,
    // AND/OR/NOT precedence, an integer phrase boost, and prohibit
    // semantics (`NOT source:src4` ANDs in, per Lucene). Score: AND
    // sums both sides, OR sums the matched branches, the ^2 phrase
    // scores 2, NOT contributes predicate only.
    GraftQuery(
      "q170_dsl_query_string",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"query_string": {
             "query": "text:spark AND (join OR \"data window\"^2) NOT source:src4",
             "default_field": "text"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 40,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id, source,
            list_contains(string_split(text, ' '), 'spark') AS has_spark,
            list_contains(string_split(text, ' '), 'join') AS has_join,
            (' ' || text || ' ') LIKE '% data window %' AS has_phrase
          FROM documents)
        SELECT doc_id,
               CAST(1 + (CASE WHEN has_join THEN 1 ELSE 0 END)
                      + (CASE WHEN has_phrase THEN 2 ELSE 0 END) AS BIGINT) AS score
        FROM t
        WHERE has_spark AND (has_join OR has_phrase)
          AND NOT list_contains(string_split(source, ' '), 'src4')
        ORDER BY score DESC, doc_id
        LIMIT 40
      """.stripMargin.trim)),

    // collapse: one window over the hit set keeps the top-2 hits per
    // source (inner_hits size 2) in the request's sort order — the
    // result-dedup feature, q94's canonical-selection shape applied
    // to the hit list. Never a self-join.
    GraftQuery(
      "q171_dsl_collapse",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match": {"text": "spark join"}},
           "collapse": {"field": "source", "inner_hits": {"size": 2}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30,
           "_source": ["source", "collapse_rank", "doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id, source,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                    ['spark','join'])) AS BIGINT) AS score
          FROM documents),
        r AS (
          SELECT source, doc_id, score,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY score DESC, doc_id) AS BIGINT) AS collapse_rank
          FROM t WHERE score >= 1)
        SELECT source, collapse_rank, doc_id, score FROM r
        WHERE collapse_rank <= 2
        ORDER BY score DESC, doc_id
        LIMIT 30
      """.stripMargin.trim)),

    // date_range bucket agg: calendar-anchored, OVERLAPPING [from, to)
    // buckets over orders.o_orderdate — one pass of filtered
    // aggregates in request order (the range-agg machinery with ISO
    // date bounds). Sub-aggs are min/max (order-independent, so
    // double-safe cross-engine).
    GraftQuery(
      "q172_dsl_date_range",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "orders"),
        """{"query": {"term": {"o_orderstatus": "F"}},
           "aggs": {"period": {"date_range": {"field": "o_orderdate",
               "ranges": [{"to": "1994-01-01"},
                          {"from": "1993-06-01", "to": "1995-06-01"},
                          {"from": "1995-01-01"}]},
             "aggs": {
               "min_price": {"min": {"field": "o_totalprice"}},
               "max_price": {"max": {"field": "o_totalprice"}}}}}}"""),
      Some("""
        WITH f AS (SELECT * FROM orders WHERE o_orderstatus = 'F'),
        b AS (
          SELECT 0 AS ord, '*-1994-01-01' AS period, COUNT(*) AS doc_count,
                 MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
          FROM f WHERE o_orderdate < DATE '1994-01-01'
          UNION ALL
          SELECT 1, '1993-06-01-1995-06-01', COUNT(*),
                 MIN(o_totalprice), MAX(o_totalprice)
          FROM f WHERE o_orderdate >= DATE '1993-06-01'
            AND o_orderdate < DATE '1995-06-01'
          UNION ALL
          SELECT 2, '1995-01-01-*', COUNT(*),
                 MIN(o_totalprice), MAX(o_totalprice)
          FROM f WHERE o_orderdate >= DATE '1995-01-01')
        SELECT period, doc_count, min_price, max_price FROM b ORDER BY ord
      """.stripMargin.trim)),

    // geo_bounding_box over q164's deterministic synthetic points:
    // four plain band comparisons (the whole clause pushes to the scan
    // when the fields are physical columns — plan-pinned in
    // QueryDslSpec). Filter context, map-only.
    GraftQuery(
      "q173_dsl_geo_bounding_box",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val pts = GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer"))
        QueryDsl.search(pts,
          """{"query": {"geo_bounding_box": {
               "lat_field": "lat", "lon_field": "lon",
               "top_left": {"lat": 60.0, "lon": -100.0},
               "bottom_right": {"lat": 20.0, "lon": -40.0}}},
             "sort": ["c_custkey"],
             "size": 120,
             "_source": ["c_custkey", "lat", "lon"]}""")
      },
      Some("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer)
        SELECT c_custkey, lat, lon FROM pts
        WHERE lat <= 60.0 AND lat >= 20.0 AND lon >= -100.0 AND lon <= -40.0
        ORDER BY c_custkey
        LIMIT 120
      """.stripMargin.trim)),

    // percolate as a JSON request — q98's oracle VERBATIM: the six
    // stored queries re-expressed as DSL bool clauses (two single-term
    // matches + an n_chars range each), compiled to map-side
    // predicates. No join at all: each document probes the inline
    // registry in one codegen'd projection.
    GraftQuery(
      "q174_dsl_percolate",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"percolate": {
             "id_field": "doc_id",
             "queries": [
               {"id": 1, "query": {"bool": {"must": [
                 {"match": {"text": "spark"}}, {"match": {"text": "join"}},
                 {"range": {"n_chars": {"gte": 0, "lte": 400}}}]}}},
               {"id": 2, "query": {"bool": {"must": [
                 {"match": {"text": "the"}}, {"match": {"text": "row"}},
                 {"range": {"n_chars": {"gte": 100, "lte": 500}}}]}}},
               {"id": 3, "query": {"bool": {"must": [
                 {"match": {"text": "filter"}}, {"match": {"text": "group"}},
                 {"range": {"n_chars": {"gte": 0, "lte": 1000}}}]}}},
               {"id": 4, "query": {"bool": {"must": [
                 {"match": {"text": "stream"}}, {"match": {"text": "batch"}},
                 {"range": {"n_chars": {"gte": 200, "lte": 600}}}]}}},
               {"id": 5, "query": {"bool": {"must": [
                 {"match": {"text": "table"}}, {"match": {"text": "scan"}},
                 {"range": {"n_chars": {"gte": 0, "lte": 1000}}}]}}},
               {"id": 6, "query": {"bool": {"must": [
                 {"match": {"text": "fast"}}, {"match": {"text": "slow"}},
                 {"range": {"n_chars": {"gte": 0, "lte": 300}}}]}}}]}},
           "sort": ["doc_id", "qid"]}"""),
      Some("""
        WITH q(qid, t1, t2, lo, hi) AS (VALUES
          (1, 'spark', 'join', 0, 400),
          (2, 'the', 'row', 100, 500),
          (3, 'filter', 'group', 0, 1000),
          (4, 'stream', 'batch', 200, 600),
          (5, 'table', 'scan', 0, 1000),
          (6, 'fast', 'slow', 0, 300)),
        d AS (SELECT doc_id, n_chars, string_split(text, ' ') AS tok FROM documents)
        SELECT doc_id, CAST(qid AS BIGINT) AS qid
        FROM d CROSS JOIN q
        WHERE list_contains(tok, t1) AND list_contains(tok, t2)
          AND n_chars BETWEEN lo AND hi
        ORDER BY doc_id, qid
      """.stripMargin.trim)),

    // pipeline aggs over a date_histogram series (the q57 shape via
    // the wire contract): daily event counts, then cumulative_sum,
    // derivative (day-over-day delta, NULL on the first bucket) and a
    // 3-bucket moving_avg — windows over the BOUNDED bucket table in
    // key order, never over the corpus; the heavy lifting stays the
    // parallel date_trunc groupBy.
    GraftQuery(
      "q175_dsl_pipeline_agg",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"match_all": {}},
           "aggs": {"day": {"date_histogram":
               {"field": "ts", "calendar_interval": "day"},
             "aggs": {
               "cum_n": {"cumulative_sum": {"buckets_path": "_count"}},
               "delta": {"derivative": {"buckets_path": "_count"}},
               "ma3": {"moving_avg": {"buckets_path": "_count", "window": 3}}}}}}"""),
      Some("""
        WITH d AS (
          SELECT date_trunc('day', ts) AS day, COUNT(*) AS doc_count
          FROM events GROUP BY 1)
        SELECT day, doc_count,
               CAST(SUM(doc_count) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
               doc_count - lag(doc_count, 1) OVER (ORDER BY day) AS delta,
               CAST(SUM(doc_count) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST(COUNT(*) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS ma3
        FROM d ORDER BY day
      """.stripMargin.trim)),

    // rare_terms: the long tail — (lang|source) combinations with at
    // most 3 documents, ascending count (q99's rare half via the wire
    // contract). One partial-aggregated shuffle; the ceiling filter
    // runs on the aggregated counts.
    GraftQuery(
      "q176_dsl_rare_terms",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir, "documents")
          .withColumn("lang_src", concat_ws("|", col("lang"), col("source")))
        QueryDsl.search(d,
          """{"query": {"match_all": {}},
             "aggs": {"combo": {"rare_terms":
               {"field": "lang_src", "max_doc_count": 3}}}}""")
      },
      Some("""
        SELECT lang || '|' || source AS combo, COUNT(*) AS doc_count
        FROM documents
        GROUP BY 1 HAVING COUNT(*) <= 3
        ORDER BY doc_count, combo
      """.stripMargin.trim)),

    // adjacency_matrix: named filters + every pairwise intersection
    // count (q110's co-occurrence matrix as cell ROWS, OpenSearch's
    // bucket shape) — one conditional-aggregate pass, one row
    // reshaped, cells in alphabetical key order.
    GraftQuery(
      "q177_dsl_adjacency_matrix",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match_all": {}},
           "aggs": {"m": {"adjacency_matrix": {"filters": {
             "en": {"term": {"lang": "en"}},
             "long": {"range": {"n_chars": {"gte": 300}}},
             "the": {"prefix": {"text": "the "}}}}}}}"""),
      Some("""
        WITH b AS (
          SELECT 0 AS ord, 'en' AS m,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS doc_count
          FROM documents
          UNION ALL SELECT 1, 'en&long',
                 CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT)
          FROM documents
          UNION ALL SELECT 2, 'en&the',
                 CAST(SUM(CASE WHEN lang = 'en' AND text LIKE 'the %' THEN 1 ELSE 0 END) AS BIGINT)
          FROM documents
          UNION ALL SELECT 3, 'long',
                 CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT)
          FROM documents
          UNION ALL SELECT 4, 'long&the',
                 CAST(SUM(CASE WHEN n_chars >= 300 AND text LIKE 'the %' THEN 1 ELSE 0 END) AS BIGINT)
          FROM documents
          UNION ALL SELECT 5, 'the',
                 CAST(SUM(CASE WHEN text LIKE 'the %' THEN 1 ELSE 0 END) AS BIGINT)
          FROM documents)
        SELECT m, doc_count FROM b ORDER BY ord
      """.stripMargin.trim)),

    // matrix_stats: exact-moment mean/variance/covariance/correlation
    // of two integral fields (q111's recipe on the wire contract) —
    // the float finishers divide ORDER-FREE integer sums, so the
    // result is engine-exact after the 6-dp round.
    GraftQuery(
      "q178_dsl_matrix_stats",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir, "documents")
          .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        QueryDsl.search(d,
          """{"query": {"match_all": {}},
             "aggs": {"ms": {"matrix_stats":
               {"fields": ["n_chars", "n_tokens"]}}}}""")
      },
      Some("""
        WITH d AS (SELECT CAST(n_chars AS BIGINT) AS x,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS y
                   FROM documents),
        m AS (SELECT COUNT(*) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * x) AS BIGINT) AS sxx,
                     CAST(SUM(y * y) AS BIGINT) AS syy,
                     CAST(SUM(x * y) AS BIGINT) AS sxy
              FROM d)
        SELECT n,
               round(sx / CAST(n AS DOUBLE), 6) AS mean_n_chars,
               round(sy / CAST(n AS DOUBLE), 6) AS mean_n_tokens,
               round((sxx - sx * sx / CAST(n AS DOUBLE)) / n, 6) AS var_n_chars,
               round((syy - sy * sy / CAST(n AS DOUBLE)) / n, 6) AS var_n_tokens,
               round((sxy - sx * sy / CAST(n AS DOUBLE)) / n, 6) AS covariance,
               round(((sxy - sx * sy / CAST(n AS DOUBLE)) / n)
                 / (sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / n)
                  * sqrt((syy - sy * sy / CAST(n AS DOUBLE)) / n)), 6) AS correlation
        FROM m
      """.stripMargin.trim)),

    // completion suggester: prefix autocomplete ranked by corpus
    // frequency (q115's shape through the suggest section) — map-side
    // explode+filter, one partial-agg shuffle of prefix-matching
    // tokens only, bounded top-k.
    GraftQuery(
      "q179_dsl_completion_suggest",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"suggest": {"autocomplete": {
             "prefix": "c",
             "completion": {"field": "text", "size": 10, "min_length": 3}}}}"""),
      Some("""
        WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        SELECT term, COUNT(*) AS freq FROM t
        WHERE term LIKE 'c%' AND len(term) >= 3
        GROUP BY term ORDER BY freq DESC, term LIMIT 10
      """.stripMargin.trim)),

    // match_bool_prefix: bag-of-terms type-ahead — 'spark' and 'join'
    // as full terms, 'win' as a token prefix; score = full-term
    // overlap + prefix hit, or-semantics gate (msm 1). Pure codegen.
    GraftQuery(
      "q180_dsl_match_bool_prefix",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match_bool_prefix": {"text": "spark join win"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 40,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                    ['spark','join']))
              + CASE WHEN len(list_filter(string_split(text, ' '),
                       x -> x LIKE 'win%')) > 0 THEN 1 ELSE 0 END AS BIGINT) AS score
          FROM documents)
        SELECT doc_id, score FROM t
        WHERE score >= 1
        ORDER BY score DESC, doc_id
        LIMIT 40
      """.stripMargin.trim)),

    // geo_grid agg under a geo_distance query — q125's 15°-cell grid
    // over the deterministic synthetic points, via the wire contract:
    // radius filter first (map-only), then one partial-aggregated
    // groupBy on the two floor-divided cell keys.
    GraftQuery(
      "q181_dsl_geo_grid",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val pts = GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer"))
        QueryDsl.search(pts,
          """{"query": {"geo_distance": {
               "distance_km": 5000.0,
               "lat_field": "lat", "lon_field": "lon",
               "origin": {"lat": 40.0, "lon": -74.0}}},
             "aggs": {"cell": {"geo_grid": {
                 "lat_field": "lat", "lon_field": "lon", "cell_deg": 15.0},
               "aggs": {"min_key": {"min": {"field": "c_custkey"}}}}}}""")
      },
      Some("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer),
        d AS (
          SELECT c_custkey, lat, lon,
                 round(CAST(12742.0176 AS DOUBLE) * asin(sqrt(
                   sin((lat - 40.0) * pi() / 180.0 / 2.0) * sin((lat - 40.0) * pi() / 180.0 / 2.0)
                   + cos(40.0 * pi() / 180.0) * cos(lat * pi() / 180.0)
                     * sin((lon + 74.0) * pi() / 180.0 / 2.0) * sin((lon + 74.0) * pi() / 180.0 / 2.0))), 6) AS dist_km
          FROM pts)
        SELECT CAST(floor(lat / 15.0) AS BIGINT) AS cell_lat,
               CAST(floor(lon / 15.0) AS BIGINT) AS cell_lon,
               CAST(COUNT(*) AS BIGINT) AS doc_count,
               MIN(c_custkey) AS min_key
        FROM d
        WHERE dist_km <= 5000.0
        GROUP BY 1, 2
        ORDER BY cell_lat, cell_lon
      """.stripMargin.trim)),

    // _geo_distance sort: nearest-first over the deterministic
    // synthetic points (the 6-dp haversine recipe shared with the
    // geo_distance query, so query and sort can never drift),
    // c_custkey tie-break for totality.
    GraftQuery(
      "q182_dsl_geo_sort",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val pts = GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer"))
        QueryDsl.search(pts,
          """{"query": {"match_all": {}},
             "sort": [
               {"_geo_distance": {"lat_field": "lat", "lon_field": "lon",
                 "origin": {"lat": 40.0, "lon": -74.0}, "order": "asc"}},
               "c_custkey"],
             "size": 20,
             "_source": ["c_custkey", "lat", "lon"]}""")
      },
      Some("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer),
        d AS (
          SELECT c_custkey, lat, lon,
                 round(CAST(12742.0176 AS DOUBLE) * asin(sqrt(
                   sin((lat - 40.0) * pi() / 180.0 / 2.0) * sin((lat - 40.0) * pi() / 180.0 / 2.0)
                   + cos(40.0 * pi() / 180.0) * cos(lat * pi() / 180.0)
                     * sin((lon + 74.0) * pi() / 180.0 / 2.0) * sin((lon + 74.0) * pi() / 180.0 / 2.0))), 6) AS dist_km
          FROM pts)
        SELECT c_custkey, lat, lon FROM d
        ORDER BY dist_km, c_custkey
        LIMIT 20
      """.stripMargin.trim)),

    // min_score + term-level boosts: should clauses where en counts
    // double and src3 triple (integer boosts in the expanded term
    // form), gated by the integer relevance floor — hits under score
    // 3 drop even though they matched the bool.
    GraftQuery(
      "q183_dsl_min_score_boost",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {"should": [
             {"term": {"lang": {"value": "en", "boost": 2}}},
             {"match": {"text": "spark"}},
             {"term": {"source": {"value": "src3", "boost": 3}}}],
             "minimum_should_match": 1}},
           "min_score": 3,
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 50,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id,
            CAST((CASE WHEN lang = 'en' THEN 2 ELSE 0 END)
               + (CASE WHEN list_contains(list_distinct(string_split(text, ' ')), 'spark')
                       THEN 1 ELSE 0 END)
               + (CASE WHEN source = 'src3' THEN 3 ELSE 0 END) AS BIGINT) AS score,
            (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              + (CASE WHEN list_contains(list_distinct(string_split(text, ' ')), 'spark')
                      THEN 1 ELSE 0 END)
              + (CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS matched
          FROM documents)
        SELECT doc_id, score FROM t
        WHERE matched >= 1 AND score >= 3
        ORDER BY score DESC, doc_id
        LIMIT 50
      """.stripMargin.trim)),

    // query_string multi-term expansions: a trailing-wildcard stem
    // (any token starting with 'spar', boosted ×2) OR a ~1 fuzzy term
    // — the grammar's term-dictionary expansions in the token model,
    // still one codegen'd Column.
    GraftQuery(
      "q184_dsl_query_string_expansions",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"query_string": {"query": "spar*^2 OR windw~1",
             "default_field": "text"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 50,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id,
            len(list_filter(string_split(text, ' '),
                x -> x LIKE 'spar%')) > 0 AS has_prefix,
            len(list_filter(list_distinct(string_split(text, ' ')),
                x -> levenshtein(x, 'windw') <= 1)) > 0 AS has_fuzzy
          FROM documents)
        SELECT doc_id,
               CAST((CASE WHEN has_prefix THEN 2 ELSE 0 END)
                  + (CASE WHEN has_fuzzy THEN 1 ELSE 0 END) AS BIGINT) AS score
        FROM t
        WHERE has_prefix OR has_fuzzy
        ORDER BY score DESC, doc_id
        LIMIT 50
      """.stripMargin.trim)),

    // the _count endpoint: the question clients ask most, as the
    // cheapest possible plan — pushed predicate into one global
    // aggregate, no sort, no score materialization.
    GraftQuery(
      "q185_dsl_count",
      (s, dir) => QueryDsl.countRequest(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {"must": [
             {"term": {"lang": "en"}},
             {"match": {"text": "spark"}}]}}}"""),
      Some("""
        SELECT COUNT(*) AS count FROM documents
        WHERE lang = 'en'
          AND list_contains(list_distinct(string_split(text, ' ')), 'spark')
      """.stripMargin.trim)),

    // terms-in-terms sub-bucketing: each language bucket broken down
    // by source (top-3 each level, max_chars on the inner buckets) —
    // ONE (outer, inner) groupBy shuffle, ranks as windows over the
    // bounded bucket table, OpenSearch response order made total.
    GraftQuery(
      "q186_dsl_terms_in_terms",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"range": {"n_chars": {"gte": 100}}},
           "aggs": {"by_lang": {"terms": {"field": "lang", "size": 3},
             "aggs": {"by_source": {"terms": {"field": "source", "size": 3},
               "aggs": {"max_chars": {"max": {"field": "n_chars"}}}}}}}}"""),
      Some("""
        WITH h AS (SELECT * FROM documents WHERE n_chars >= 100),
        g AS (
          SELECT lang AS by_lang, source AS by_source,
                 COUNT(*) AS doc_count, MAX(n_chars) AS max_chars
          FROM h WHERE lang IS NOT NULL AND source IS NOT NULL
          GROUP BY 1, 2),
        t AS (
          SELECT *, CAST(SUM(doc_count) OVER (PARTITION BY by_lang) AS BIGINT)
                      AS by_lang_doc_count,
                 ROW_NUMBER() OVER (PARTITION BY by_lang
                   ORDER BY doc_count DESC, by_source) AS ir
          FROM g),
        f AS (SELECT * FROM t WHERE ir <= 3),
        r AS (SELECT *, DENSE_RANK() OVER
                (ORDER BY by_lang_doc_count DESC, by_lang) AS orr FROM f)
        SELECT by_lang, by_lang_doc_count, by_source, doc_count, max_chars
        FROM r WHERE orr <= 3
        ORDER BY by_lang_doc_count DESC, by_lang, doc_count DESC, by_source
      """.stripMargin.trim)),

    // extended_stats: stats + exact second moment. Variance is
    // computed FROM THE EXACT INTEGER MOMENTS — (n·Σx² − (Σx)²)/n² in
    // one IEEE divide — so the doubles are bit-identical across
    // engines (a running-mean variance would be partition-order-
    // dependent). One global aggregate row, one partial-agg exchange.
    GraftQuery(
      "q187_dsl_extended_stats",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"chars": {"extended_stats": {"field": "n_chars"}}}}"""),
      Some("""
        WITH h AS (SELECT n_chars FROM documents WHERE lang = 'en'),
        m AS (SELECT COUNT(n_chars) AS c, CAST(MIN(n_chars) AS BIGINT) AS mn,
                     CAST(MAX(n_chars) AS BIGINT) AS mx,
                     CAST(SUM(n_chars) AS BIGINT) AS s,
                     CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
              FROM h)
        SELECT c AS chars_count, mn AS chars_min, mx AS chars_max,
               CAST(s AS DOUBLE) / c AS chars_avg, s AS chars_sum,
               ss AS chars_sum_of_squares,
               CAST(c * ss - s * s AS DOUBLE) / CAST(c * c AS DOUBLE)
                 AS chars_variance,
               sqrt(CAST(c * ss - s * s AS DOUBLE) / CAST(c * c AS DOUBLE))
                 AS chars_std_deviation
        FROM m
      """.stripMargin.trim)),

    // weighted_avg under a terms bucket: Σ(v·w)/Σ(w) from two exact
    // integer sums and ONE IEEE divide (engine-portable double). The
    // weight is a derived integer column, mirrored in the oracle.
    GraftQuery(
      "q188_dsl_weighted_avg",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        QueryDsl.search(
          Tables.load(s, dir, "documents")
            .withColumn("w", col("doc_id") % 5 + 1),
          """{"aggs": {"by_lang": {"terms": {"field": "lang", "size": 10},
               "aggs": {"wavg_chars": {"weighted_avg": {
                 "value": {"field": "n_chars"},
                 "weight": {"field": "w"}}}}}}}""")
      },
      Some("""
        SELECT lang AS by_lang, COUNT(*) AS doc_count,
               CAST(SUM(n_chars * ((doc_id % 5) + 1)) AS DOUBLE) /
               CAST(SUM((doc_id % 5) + 1) AS DOUBLE) AS wavg_chars
        FROM documents
        GROUP BY 1 ORDER BY doc_count DESC, by_lang LIMIT 10
      """.stripMargin.trim)),

    // top_metrics: the metric's value on the top row under the sort,
    // ties broken by the metric itself (struct max — deterministic,
    // never partition-order-dependent). One aggregate, no sort of
    // the corpus.
    GraftQuery(
      "q189_dsl_top_metrics",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"longest_doc": {"top_metrics": {
             "metrics": {"field": "doc_id"},
             "sort": {"n_chars": {"order": "desc"}}}}}}"""),
      Some("""
        SELECT CAST((max(struct_pack(s := n_chars, m := doc_id))).m AS BIGINT)
                 AS longest_doc
        FROM documents WHERE lang = 'en'
      """.stripMargin.trim)),

    // missing agg: docs with NO value for a field — one conditional
    // global aggregate (doc_count + IS-NULL-gated sub-metric), no
    // keyed shuffle. The nullable column is derived identically on
    // both sides (the GeoFixtures pattern).
    GraftQuery(
      "q190_dsl_missing",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        QueryDsl.search(
          Tables.load(s, dir, "documents")
            .withColumn("opt_source",
              when(col("n_chars") % 7 === 0, lit(null).cast("string"))
                .otherwise(col("source"))),
          """{"aggs": {"no_source": {"missing": {"field": "opt_source"},
               "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}}}""")
      },
      Some("""
        WITH d AS (SELECT n_chars,
                     CASE WHEN n_chars % 7 = 0 THEN NULL ELSE source END
                       AS opt_source
                   FROM documents)
        SELECT COUNT(CASE WHEN opt_source IS NULL THEN 1 END) AS doc_count,
               CAST(SUM(CASE WHEN opt_source IS NULL THEN n_chars END) AS DOUBLE)
                 / COUNT(CASE WHEN opt_source IS NULL THEN n_chars END)
                 AS avg_chars
        FROM d
      """.stripMargin.trim)),

    // multi_terms: terms over a composite key — ONE groupBy shuffle
    // on both fields together, docs missing either key skipped (the
    // OpenSearch rule), top size by doc_count with a total tiebreak.
    GraftQuery(
      "q191_dsl_multi_terms",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"range": {"n_chars": {"gte": 150}}},
           "aggs": {"by_pair": {"multi_terms": {
             "terms": [{"field": "lang"}, {"field": "source"}], "size": 12},
             "aggs": {"max_chars": {"max": {"field": "n_chars"}}}}}}"""),
      Some("""
        SELECT lang, source, COUNT(*) AS doc_count,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars
        FROM documents
        WHERE n_chars >= 150 AND lang IS NOT NULL AND source IS NOT NULL
        GROUP BY 1, 2 ORDER BY doc_count DESC, lang, source LIMIT 12
      """.stripMargin.trim)),

    // bucket_selector + bucket_sort: the OpenSearch HAVING / ORDER BY
    // idiom over the bucket table. The selector's mini-script compiles
    // to a Catalyst predicate; both run on the BOUNDED bucket series,
    // never the corpus.
    GraftQuery(
      "q192_dsl_bucket_selector_sort",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"aggs": {"hist": {"histogram": {"field": "n_chars", "interval": 50},
             "aggs": {
               "sum_chars": {"sum": {"field": "n_chars"}},
               "big": {"bucket_selector": {
                 "buckets_path": {"dc": "_count"},
                 "script": "params.dc >= 20"}},
               "top": {"bucket_sort": {
                 "sort": [{"sum_chars": {"order": "desc"}}], "size": 5}}}}}}"""),
      Some("""
        WITH g AS (
          SELECT CAST(FLOOR(n_chars / 50) * 50 AS BIGINT) AS hist,
                 COUNT(*) AS doc_count, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM documents GROUP BY 1)
        SELECT hist, doc_count, sum_chars FROM g
        WHERE doc_count >= 20
        ORDER BY sum_chars DESC, hist LIMIT 5
      """.stripMargin.trim)),

    // serial_diff: lag-n difference over the key-ordered histogram
    // series (NULL while the lag window is short, where OpenSearch
    // omits the value) — a window over the bounded bucket table.
    GraftQuery(
      "q193_dsl_serial_diff",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"aggs": {"hist": {"histogram": {"field": "n_chars", "interval": 100},
             "aggs": {"d2": {"serial_diff": {
               "buckets_path": "_count", "lag": 2}}}}}}"""),
      Some("""
        WITH g AS (
          SELECT CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS hist,
                 COUNT(*) AS doc_count
          FROM documents GROUP BY 1)
        SELECT hist, doc_count,
               doc_count - LAG(doc_count, 2) OVER (ORDER BY hist) AS d2
        FROM g ORDER BY hist
      """.stripMargin.trim)),

    // sibling *_bucket aggs: scalars over a sibling bucket series —
    // the ONE-ROW sibling table, computed by aggregating the bounded
    // bucket table (no second corpus pass).
    GraftQuery(
      "q194_dsl_sibling_bucket",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"aggs": {
             "hist": {"histogram": {"field": "n_chars", "interval": 50}},
             "total_docs": {"sum_bucket": {"buckets_path": "hist>_count"}},
             "avg_docs": {"avg_bucket": {"buckets_path": "hist>_count"}},
             "peak_docs": {"max_bucket": {"buckets_path": "hist>_count"}}}}"""),
      Some("""
        WITH g AS (
          SELECT CAST(FLOOR(n_chars / 50) * 50 AS BIGINT) AS k,
                 COUNT(*) AS dc
          FROM documents GROUP BY 1)
        SELECT CAST(SUM(dc) AS BIGINT) AS total_docs,
               CAST(SUM(dc) AS DOUBLE) / COUNT(dc) AS avg_docs,
               CAST(MAX(dc) AS BIGINT) AS peak_docs
        FROM g
      """.stripMargin.trim)),

    // script_score: the request's script parsed ONCE on the driver and
    // compiled to codegen'd Catalyst arithmetic — zero row-time
    // interpretation (the anti-UDF rule) — re-scoring the wrapped
    // match query in the exact-LONG model.
    GraftQuery(
      "q195_dsl_script_score",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"script_score": {
             "query": {"match": {"text": "spark"}},
             "script": {
               "source": "params.w * _score + min(doc['n_chars'].value, params.cap)",
               "params": {"w": 10, "cap": 500}}}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 40,
           "_source": ["doc_id", "n_chars", "score"]}"""),
      Some("""
        SELECT doc_id, n_chars,
               CAST(10 * 1 + (CASE WHEN n_chars < 500 THEN n_chars ELSE 500 END)
                 AS BIGINT) AS score
        FROM documents
        WHERE list_contains(list_distinct(string_split(text, ' ')), 'spark')
        ORDER BY score DESC, doc_id LIMIT 40
      """.stripMargin.trim)),

    // intervals: k-term ordered proximity with a total gap budget —
    // span_near's postings shape generalized to a k−1-step equi-join
    // chain on the document key (blow-up Π tfᵢ per document, never
    // corpus²).
    GraftQuery(
      "q196_dsl_intervals",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"intervals": {
             "text": {"match": {"query": "spark join window",
                                "max_gaps": 6, "ordered": true}},
             "id_field": "doc_id"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30,
           "_source": ["doc_id", "n_spans", "min_gaps"]}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        pos AS (
          SELECT doc_id, unnest(a) AS tok,
                 unnest(range(1, len(a) + 1)) AS p
          FROM arr),
        p1 AS (SELECT doc_id, p FROM pos WHERE tok = 'spark'),
        p2 AS (SELECT doc_id, p FROM pos WHERE tok = 'join'),
        p3 AS (SELECT doc_id, p FROM pos WHERE tok = 'window'),
        g AS (
          SELECT p1.doc_id, CAST(p3.p - p1.p - 2 AS BIGINT) AS gaps
          FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.p > p1.p
               JOIN p3 ON p2.doc_id = p3.doc_id AND p3.p > p2.p
          WHERE p3.p - p1.p - 2 <= 6)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, MIN(gaps) AS min_gaps
        FROM g GROUP BY 1
        ORDER BY n_spans DESC, doc_id
        LIMIT 30
      """.stripMargin.trim)),

    // _msearch batched counts: FOUR requests, ONE corpus scan — every
    // predicate becomes a conditional count in a single global
    // aggregate (the multi-query-optimization shape; a dashboard's 50
    // filters cost one pass over 100 TB, not 50). Plan-pinned in
    // QueryDslSpec.
    GraftQuery(
      "q197_dsl_msearch_counts",
      (s, dir) => QueryDsl.msearchCounts(
        Tables.load(s, dir, "documents"),
        Seq(
          """{"query": {"term": {"lang": "en"}}}""",
          """{"query": {"match": {"text": "spark join"}}}""",
          """{"query": {"range": {"n_chars": {"gte": 300}}}}""",
          """{"query": {"bool": {"must": [
               {"term": {"source": "src1"}},
               {"prefix": {"text": "the "}}]}}}""")),
      Some("""
        SELECT * FROM (
          SELECT CAST(0 AS BIGINT) AS req, COUNT(*) AS count
          FROM documents WHERE lang = 'en'
          UNION ALL
          SELECT 1, COUNT(*) FROM documents
          WHERE len(list_intersect(list_distinct(string_split(text, ' ')),
                                   ['spark', 'join'])) >= 1
          UNION ALL
          SELECT 2, COUNT(*) FROM documents WHERE n_chars >= 300
          UNION ALL
          SELECT 3, COUNT(*) FROM documents
          WHERE source = 'src1' AND text LIKE 'the %')
        ORDER BY req
      """.stripMargin.trim)),

    // wrapper: a base64-shipped query object decoded ONCE on the
    // driver and compiled like the inline clause it is (here: the
    // bool from q135's family) — the JSON-hostile-channel escape
    // hatch, with zero row-time cost.
    GraftQuery(
      "q198_dsl_wrapper",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"wrapper": {"query":
             "eyJib29sIjogeyJtdXN0IjogW3sidGVybSI6IHsibGFuZyI6ICJlbiJ9fSwgeyJyYW5nZSI6IHsibl9jaGFycyI6IHsiZ3RlIjogMjAwfX19XX19"}},
           "sort": ["doc_id"],
           "_source": ["doc_id", "lang", "n_chars"]}"""),
      Some("""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE lang = 'en' AND n_chars >= 200
        ORDER BY doc_id
      """.stripMargin.trim)),

    // combined_fields: term-centric multi-field match — each query
    // term counts once if present in ANY field (vs multi_match's
    // field-centric scoring). Pure codegen OR over token-set
    // membership per field.
    GraftQuery(
      "q199_dsl_combined_fields",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"combined_fields": {
             "query": "spark src1 window",
             "fields": ["text", "source"],
             "minimum_should_match": 2}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 50,
           "_source": ["doc_id", "source", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id, source,
            CAST((CASE WHEN list_contains(list_distinct(string_split(text, ' ')), 'spark')
                    OR list_contains(list_distinct(string_split(source, ' ')), 'spark')
                   THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_distinct(string_split(text, ' ')), 'src1')
                    OR list_contains(list_distinct(string_split(source, ' ')), 'src1')
                   THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(list_distinct(string_split(text, ' ')), 'window')
                    OR list_contains(list_distinct(string_split(source, ' ')), 'window')
                   THEN 1 ELSE 0 END) AS BIGINT) AS score
          FROM documents)
        SELECT doc_id, source, score FROM t WHERE score >= 2
        ORDER BY score DESC, doc_id LIMIT 50
      """.stripMargin.trim)),

    // span_first: the term within the first `end` token positions of
    // its own document — per-row computable, so a plain codegen
    // clause (prefix-slice membership), no postings machinery.
    GraftQuery(
      "q200_dsl_span_first",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"span_first": {
             "match": {"span_term": {"text": "the"}}, "end": 3}},
           "sort": ["doc_id"],
           "size": 60,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        SELECT doc_id, CAST(1 AS BIGINT) AS score FROM documents
        WHERE list_contains((string_split(text, ' '))[1:3], 'the')
        ORDER BY doc_id LIMIT 60
      """.stripMargin.trim)),

    // scripted_metric (deterministic shape): a ScoreScript map
    // expression compiled to codegen'd arithmetic INSIDE the partial
    // aggregate, combined by a named monoid (sum) — distributable by
    // construction, zero row-time interpretation. Under a terms
    // bucket to exercise the sub-agg path.
    GraftQuery(
      "q201_dsl_scripted_metric",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"range": {"n_chars": {"gte": 100}}},
           "aggs": {"by_lang": {"terms": {"field": "lang"},
             "aggs": {"capped_chars": {"scripted_metric": {
               "map_script": "min(doc['n_chars'].value, params.cap) * params.w",
               "params": {"cap": 400, "w": 3},
               "reduce": "sum"}}}}}}"""),
      Some("""
        SELECT lang AS by_lang, COUNT(*) AS doc_count,
               CAST(SUM((CASE WHEN n_chars < 400 THEN n_chars ELSE 400 END) * 3)
                 AS BIGINT) AS capped_chars
        FROM documents WHERE n_chars >= 100
        GROUP BY 1 ORDER BY doc_count DESC, by_lang
      """.stripMargin.trim)),

    // auto_date_histogram: the finest calendar unit (day→month→year)
    // with at most `buckets` buckets — the choice costs 3 bounded
    // distinct-trunc counts; the work stays ONE date_trunc groupBy.
    // The oracle replicates the selection rule, so parity holds at
    // any sf regardless of which unit wins.
    GraftQuery(
      "q202_dsl_auto_date_histogram",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"match_all": {}},
           "aggs": {"auto_hist": {"auto_date_histogram":
               {"field": "ts", "buckets": 40},
             "aggs": {"n_typed": {"value_count": {"field": "event_type"}}}}}}"""),
      Some("""
        WITH c AS (
          SELECT date_diff('day', date_trunc('day', min(ts)),
                           date_trunc('day', max(ts))) + 1 AS cd,
                 date_diff('month', date_trunc('month', min(ts)),
                           date_trunc('month', max(ts))) + 1 AS cm
          FROM events),
        g AS (
          SELECT (CASE WHEN (SELECT cd FROM c) <= 40 THEN date_trunc('day', ts)
                       WHEN (SELECT cm FROM c) <= 40 THEN date_trunc('month', ts)
                       ELSE date_trunc('year', ts) END) AS auto_hist,
                 COUNT(*) AS doc_count,
                 COUNT(event_type) AS n_typed
          FROM events GROUP BY 1)
        SELECT auto_hist, doc_count, n_typed,
               (CASE WHEN (SELECT cd FROM c) <= 40 THEN 'day'
                     WHEN (SELECT cm FROM c) <= 40 THEN 'month'
                     ELSE 'year' END) AS interval
        FROM g ORDER BY auto_hist
      """.stripMargin.trim)),

    // global agg: sub-aggs over the WHOLE corpus regardless of the
    // query (the background-stats idiom — foreground hits vs corpus
    // baseline in one request family). One unfiltered global
    // aggregate.
    GraftQuery(
      "q203_dsl_global",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"bg": {"global": {},
             "aggs": {"avg_chars": {"avg": {"field": "n_chars"}},
                      "max_chars": {"max": {"field": "n_chars"}}}}}}"""),
      Some("""
        SELECT COUNT(*) AS doc_count,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars
        FROM documents
      """.stripMargin.trim)),

    // singular filter bucket: one named sub-query gating the
    // sub-aggs — a conditional global aggregate over the hit set (the
    // commonest single-bucket request shape), no keyed shuffle.
    GraftQuery(
      "q204_dsl_filter_agg",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"range": {"n_chars": {"gte": 100}}},
           "aggs": {"en_docs": {"filter": {"term": {"lang": "en"}},
             "aggs": {"sum_chars": {"sum": {"field": "n_chars"}}}}}}"""),
      Some("""
        SELECT COUNT(CASE WHEN lang = 'en' THEN 1 END) AS doc_count,
               CAST(SUM(CASE WHEN lang = 'en' THEN n_chars END) AS BIGINT)
                 AS sum_chars
        FROM documents WHERE n_chars >= 100
      """.stripMargin.trim)),

    // geo_polygon (convex, CCW): inside = on the left of every edge,
    // one cross-product sign test per edge — no division, no trig,
    // fixed operand order, so the boundary set is engine-portable and
    // the whole clause is a pushed codegen conjunction over q164's
    // synthetic points.
    GraftQuery(
      "q206_dsl_geo_polygon",
      (s, dir) => {
        val pts = GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer"))
        QueryDsl.search(pts,
          """{"query": {"geo_polygon": {
               "lat_field": "lat", "lon_field": "lon",
               "points": [
                 {"lat": -60.0, "lon": -120.0},
                 {"lat": -60.0, "lon": 120.0},
                 {"lat": 60.0, "lon": 150.0},
                 {"lat": 60.0, "lon": -150.0}]}},
             "sort": ["c_custkey"],
             "size": 200,
             "_source": ["c_custkey", "lat", "lon"]}""")
      },
      Some("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer)
        SELECT c_custkey, lat, lon FROM pts
        WHERE (120.0 - (-120.0)) * (lat - (-60.0)) - ((-60.0) - (-60.0)) * (lon - (-120.0)) >= 0.0
          AND (150.0 - 120.0) * (lat - (-60.0)) - (60.0 - (-60.0)) * (lon - 120.0) >= 0.0
          AND ((-150.0) - 150.0) * (lat - 60.0) - (60.0 - 60.0) * (lon - 150.0) >= 0.0
          AND ((-120.0) - (-150.0)) * (lat - 60.0) - ((-60.0) - 60.0) * (lon - (-150.0)) >= 0.0
        ORDER BY c_custkey
        LIMIT 200
      """.stripMargin.trim)),

    // terms agg ordered by a sub-metric (the OpenSearch `order`
    // option): buckets ranked by avg_chars desc instead of the
    // doc_count default — still ONE groupBy shuffle, the re-rank runs
    // on the bounded bucket table.
    GraftQuery(
      "q207_dsl_terms_order_metric",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"range": {"n_chars": {"gte": 50}}},
           "aggs": {"by_source": {"terms": {"field": "source", "size": 6,
               "order": {"avg_chars": "desc"}},
             "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}}}"""),
      Some("""
        WITH g AS (
          SELECT source AS by_source, COUNT(*) AS doc_count,
                 CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars
          FROM documents WHERE n_chars >= 50
          GROUP BY 1)
        SELECT by_source, doc_count, avg_chars FROM g
        ORDER BY avg_chars DESC, by_source LIMIT 6
      """.stripMargin.trim)),

    // date_histogram with fixed_interval: epoch-second bucketing
    // ("7d" weeks anchored at the epoch) — one pmod-floor key, the
    // same single groupBy as the calendar path, engine-portable
    // through exact integer epoch arithmetic.
    GraftQuery(
      "q208_dsl_fixed_interval",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"match_all": {}},
           "aggs": {"wk": {"date_histogram":
               {"field": "ts", "fixed_interval": "7d"},
             "aggs": {"cum_n": {"cumulative_sum": {"buckets_path": "_count"}}}}}}"""),
      Some("""
        WITH g AS (
          SELECT make_timestamp(epoch_us(ts)
                   - ((epoch_us(ts) % 604800000000 + 604800000000)
                      % 604800000000)) AS wk,
                 COUNT(*) AS doc_count
          FROM events GROUP BY 1)
        SELECT wk, doc_count,
               CAST(SUM(doc_count) OVER (ORDER BY wk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_n
        FROM g ORDER BY wk
      """.stripMargin.trim)),

    // terms with a `missing` bucket label: NULL-keyed docs land in a
    // named bucket instead of being dropped — one coalesce, still one
    // groupBy shuffle. The nullable column is derived identically on
    // both sides.
    GraftQuery(
      "q209_dsl_terms_missing",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        QueryDsl.search(
          Tables.load(s, dir, "documents")
            .withColumn("opt_source",
              when(col("n_chars") % 7 === 0, lit(null).cast("string"))
                .otherwise(col("source"))),
          """{"aggs": {"by_src": {"terms": {"field": "opt_source",
               "missing": "(none)", "size": 8}}}}""")
      },
      Some("""
        WITH d AS (SELECT COALESCE(
                     CASE WHEN n_chars % 7 = 0 THEN NULL ELSE source END,
                     '(none)') AS by_src
                   FROM documents)
        SELECT by_src, COUNT(*) AS doc_count FROM d
        GROUP BY 1 ORDER BY doc_count DESC, by_src LIMIT 8
      """.stripMargin.trim)),

    // _mget: the requested documents in REQUEST ORDER (the wire
    // contract) — one pushed isin filter + an array_position rank
    // over the matched handful, never a sort of the corpus. 9003 is
    // absent at every sf: missing ids are simply absent rows.
    GraftQuery(
      "q210_dsl_mget",
      (s, dir) => QueryDsl.mget(
        Tables.load(s, dir, "documents"),
        """{"id_field": "doc_id",
           "ids": [17, 3, 9003, 42, 1]}"""),
      Some("""
        SELECT * FROM documents
        WHERE doc_id IN (17, 3, 9003, 42, 1)
        ORDER BY list_position([17, 3, 9003, 42, 1], doc_id)
      """.stripMargin.trim)),

    // histogram with min_doc_count: 0 + extended_bounds: EMPTY
    // BUCKETS APPEAR (doc_count 0, metric sub-aggs NULL), so the
    // series is dense and the derivative over it is CORRECT — over a
    // sparse series a bucket-to-bucket delta silently skips the gaps.
    // The dense key range is a generated series full-outer-joined to
    // the one-shuffle bucket table.
    GraftQuery(
      "q211_dsl_histogram_empty_buckets",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"hist": {"histogram": {"field": "n_chars",
               "interval": 50, "min_doc_count": 0,
               "extended_bounds": {"min": 0, "max": 1200}},
             "aggs": {
               "sum_chars": {"sum": {"field": "n_chars"}},
               "delta": {"derivative": {"buckets_path": "_count"}}}}}}"""),
      Some("""
        WITH b AS (SELECT unnest(range(0, 1250, 50)) AS hist),
        g AS (
          SELECT CAST(FLOOR(n_chars / 50) * 50 AS BIGINT) AS hist,
                 COUNT(*) AS doc_count, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM documents WHERE lang = 'en' GROUP BY 1),
        f AS (
          SELECT COALESCE(b.hist, g.hist) AS hist,
                 COALESCE(g.doc_count, 0) AS doc_count, g.sum_chars
          FROM b FULL OUTER JOIN g ON b.hist = g.hist)
        SELECT hist, doc_count, sum_chars,
               doc_count - LAG(doc_count, 1) OVER (ORDER BY hist) AS delta
        FROM f ORDER BY hist
      """.stripMargin.trim)),

    // significant_text: tokens over-represented in the hits vs the
    // corpus — the doc-frequency model over free text (tokens deduped
    // per document), one token groupBy with both counts + broadcast
    // totals, exact integer ppm score.
    GraftQuery(
      "q212_dsl_significant_text",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "de"}},
           "aggs": {"sig": {"significant_text": {"field": "text",
               "min_doc_count": 5, "size": 12}}}}"""),
      Some("""
        WITH d AS (SELECT *, (lang = 'de') AS fg FROM documents),
        toks AS (SELECT fg, unnest(list_distinct(string_split(text, ' '))) AS sig
                 FROM d),
        per AS (
          SELECT sig, COUNT(*) AS bg_count,
                 CAST(COUNT(CASE WHEN fg THEN 1 END) AS BIGINT) AS doc_count
          FROM toks GROUP BY 1),
        t AS (SELECT COUNT(*) AS n_all,
                     CAST(COUNT(CASE WHEN fg THEN 1 END) AS BIGINT) AS n_fg
              FROM d)
        SELECT sig, doc_count, bg_count,
               (doc_count * n_all * 1000000) // (bg_count * n_fg) AS score_ppm
        FROM per, t
        WHERE doc_count >= 5
        ORDER BY score_ppm DESC, sig
        LIMIT 12
      """.stripMargin.trim)),

    // composite with DERIVED sources: a date_histogram day source x a
    // terms source — the OpenSearch time+key pagination shape. The
    // derived key is projected once; everything else (NULL filter,
    // groupBy, source-key order, size) is the plain composite path.
    GraftQuery(
      "q213_dsl_composite_derived",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"match_all": {}},
           "aggs": {"page": {"composite": {
             "size": 25,
             "sources": [
               {"day": {"date_histogram": {"field": "ts",
                        "calendar_interval": "day"}}},
               {"event_type": {"terms": {"field": "event_type"}}}]},
             "aggs": {"n_users": {"cardinality": {"field": "user_id"}}}}}}"""),
      Some("""
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*) AS doc_count,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY day, event_type LIMIT 25
      """.stripMargin.trim)),

    // _terms_enum: index terms under a prefix in term order — one
    // distinct aggregation with the prefix pushed below it (the
    // autocomplete/discovery endpoint).
    GraftQuery(
      "q214_dsl_terms_enum",
      (s, dir) => QueryDsl.termsEnum(
        Tables.load(s, dir, "documents"),
        """{"field": "text", "string": "s", "tokens": true, "size": 20}"""),
      Some("""
        SELECT DISTINCT tok AS term
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok LIKE 's%' AND tok <> ''
        ORDER BY term LIMIT 20
      """.stripMargin.trim)),

    // _field_caps: schema introspection as rows — zero data reads,
    // the oracle is the table's static schema.
    GraftQuery(
      "q215_dsl_field_caps",
      (s, dir) => QueryDsl.fieldCaps(Tables.load(s, dir, "documents")),
      Some("""
        SELECT * FROM (VALUES
          ('doc_id', 'bigint', true),
          ('lang', 'string', true),
          ('n_chars', 'bigint', true),
          ('source', 'string', true),
          ('text', 'string', true)) AS t(field, type, nullable)
        ORDER BY field
      """.stripMargin.trim)),

    // sampler (deterministic contract): sub-aggs over the top
    // shard_size hits ranked (score desc, tiebreak asc) — an explicit
    // tiebreak replaces OpenSearch's nondeterministic per-shard
    // sample, making the sample a pure function of the request.
    GraftQuery(
      "q216_dsl_sampler",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match": {"text": "spark join window"}},
           "aggs": {"top_sample": {"sampler":
               {"shard_size": 50, "tiebreak": "doc_id"},
             "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}}}"""),
      Some("""
        WITH scored AS (
          SELECT doc_id, n_chars,
                 CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                          ['spark','join','window'])) AS BIGINT) AS score
          FROM documents),
        sampled AS (
          SELECT * FROM scored WHERE score >= 1
          ORDER BY score DESC, doc_id LIMIT 50)
        SELECT COUNT(*) AS doc_count,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars
        FROM sampled
      """.stripMargin.trim)),

    // boxplot: the five-number summary from DISCRETE percentiles —
    // actual data values, engine-exact, no interpolation.
    GraftQuery(
      "q217_dsl_boxplot",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"chars": {"boxplot": {"field": "n_chars"}}}}"""),
      Some("""
        SELECT CAST(MIN(n_chars) AS BIGINT) AS chars_min,
               CAST(quantile_disc(n_chars, 0.25) AS DOUBLE) AS chars_q1,
               CAST(quantile_disc(n_chars, 0.50) AS DOUBLE) AS chars_q2,
               CAST(quantile_disc(n_chars, 0.75) AS DOUBLE) AS chars_q3,
               CAST(MAX(n_chars) AS BIGINT) AS chars_max
        FROM documents WHERE lang = 'en'
      """.stripMargin.trim)),

    // string_stats: lengths + the Shannon entropy of the GLOBAL
    // character distribution — the q92 determinism recipe (9-dp
    // rounded c·ln c summed as DECIMAL, final 6-dp round).
    GraftQuery(
      "q218_dsl_string_stats",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "fr"}},
           "aggs": {"txt": {"string_stats": {"field": "text"}}}}"""),
      Some("""
        WITH h AS (SELECT text FROM documents WHERE lang = 'fr' AND text IS NOT NULL),
        lens AS (
          SELECT COUNT(*) AS count,
                 CAST(MIN(len(text)) AS BIGINT) AS min_length,
                 CAST(MAX(len(text)) AS BIGINT) AS max_length,
                 CAST(SUM(len(text)) AS DOUBLE) / COUNT(*) AS avg_length
          FROM h),
        cc AS (
          SELECT ch, COUNT(*) AS c
          FROM (SELECT unnest(string_split(text, '')) AS ch FROM h)
          WHERE ch <> '' GROUP BY 1),
        ent AS (
          SELECT round(ln(CAST(SUM(c) AS DOUBLE)) -
                   CAST(SUM(CAST(round(c * ln(CAST(c AS DOUBLE)), 9)
                     AS DECIMAL(28,9))) AS DOUBLE)
                     / CAST(SUM(c) AS DOUBLE), 6) AS entropy
          FROM cc)
        SELECT count, min_length, max_length, avg_length, entropy
        FROM lens, ent
      """.stripMargin.trim)),

    // _search/template: {{var}} placeholders bound ON THE DRIVER (the
    // mustache subset templates actually use), then compiled like any
    // request — the saved-query idiom with zero row-time cost.
    GraftQuery(
      "q219_dsl_search_template",
      (s, dir) => QueryDsl.searchTemplate(
        Tables.load(s, dir, "documents"),
        // the source is a JSON STRING, so it must be one line (raw
        // newlines are invalid inside JSON string literals)
        """{"source": "{\"query\": {\"bool\": {\"must\": [{\"term\": {\"lang\": \"{{l}}\"}}, {\"range\": {\"n_chars\": {\"gte\": {{lo}}}}}]}}, \"sort\": [\"doc_id\"], \"size\": {{n}}, \"_source\": [\"doc_id\", \"lang\", \"n_chars\"]}",
           "params": {"l": "es", "lo": 250, "n": 40}}"""),
      Some("""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE lang = 'es' AND n_chars >= 250
        ORDER BY doc_id LIMIT 40
      """.stripMargin.trim)),

    // intervals with a STEM term: a trailing `*` turns a term into a
    // prefix-postings filter (the intervals `prefix` rule folded into
    // the match terms) — same k−1-step ordered chain, the stem's
    // postings just match more positions.
    GraftQuery(
      "q220_dsl_intervals_stem",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"intervals": {
             "text": {"match": {"query": "spark jo*",
                                "max_gaps": 4, "ordered": true}},
             "id_field": "doc_id"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30,
           "_source": ["doc_id", "n_spans", "min_gaps"]}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        pos AS (
          SELECT doc_id, unnest(a) AS tok,
                 unnest(range(1, len(a) + 1)) AS p
          FROM arr),
        p1 AS (SELECT doc_id, p FROM pos WHERE tok = 'spark'),
        p2 AS (SELECT doc_id, p FROM pos WHERE tok LIKE 'jo%'),
        g AS (
          SELECT p1.doc_id, CAST(p2.p - p1.p - 1 AS BIGINT) AS gaps
          FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.p > p1.p
          WHERE p2.p - p1.p - 1 <= 4)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, MIN(gaps) AS min_gaps
        FROM g GROUP BY 1
        ORDER BY n_spans DESC, doc_id
        LIMIT 30
      """.stripMargin.trim)),

    // The analyzer chain (VERDICT r7 #1): all three match kinds with
    // "analyzer": "standard" (lowercase + split on non-alphanumerics)
    // over a mixed-case, punctuated corpus variant derived IN-QUERY
    // (prefix uppercased, every space turned into ", ") — raw
    // whitespace matching over `body` would miss every clause here
    // ("Spark," vs "spark"); the analyzer restores OpenSearch's
    // default-analyzer behavior. The oracle replicates the exact
    // normalization (trim + regexp_replace(lower, '[^a-z0-9]+', ' ')),
    // never assumes it inverts the corpus mangling.
    GraftQuery(
      "q221_dsl_match_analyzed",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val mixed = Tables.load(s, dir, "documents").withColumn("body",
          expr("replace(concat(upper(substring(text, 1, 20)), " +
            "substring(text, 21)), ' ', ', ')"))
        QueryDsl.search(mixed,
          """{"query": {"bool": {
               "must": [{"match": {"body":
                 {"query": "Spark, JOIN window!", "analyzer": "standard",
                  "minimum_should_match": 2}}}],
               "should": [
                 {"match_phrase": {"body":
                   {"query": "Spark JOIN", "analyzer": "standard"}}},
                 {"match_phrase_prefix": {"body":
                   {"query": "Table, SC", "analyzer": "standard"}}}]}},
             "sort": [{"_score": "desc"}, "doc_id"],
             "size": 60,
             "_source": ["doc_id", "score"]}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 replace(upper(substr(text, 1, 20)) || substr(text, 21),
                         ' ', ', ') AS body
          FROM documents),
        norm AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(body), '[^a-z0-9]+', ' ', 'g')) AS nb
          FROM mixed),
        scored AS (
          SELECT doc_id,
            CAST(len(list_intersect(list_distinct(string_split(nb, ' ')),
                     ['spark','join','window'])) AS BIGINT) AS mscore,
            CASE WHEN ' ' || nb || ' ' LIKE '% spark join %' THEN 1 ELSE 0 END AS ph,
            CASE WHEN ' ' || nb || ' ' LIKE '% table sc%' THEN 1 ELSE 0 END AS pp
          FROM norm)
        SELECT doc_id, CAST(mscore + ph + pp AS BIGINT) AS score
        FROM scored WHERE mscore >= 2
        ORDER BY score DESC, doc_id LIMIT 60
      """.stripMargin.trim)),

    // range date math (VERDICT r7 #2): "now-7d/d" resolved ON THE
    // DRIVER against the request-supplied deterministic "now" (the
    // engine bans wall-clock reads), plus an absolute "||" anchor with
    // the gt beyond-the-unit rounding rule — the compiled predicate is
    // two literal timestamp comparisons that push to the parquet scan.
    // The oracle replays the same calendar arithmetic in DuckDB.
    GraftQuery(
      "q223_dsl_range_date_math",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"bool": {"must": [
             {"range": {"ts": {"gte": "now-7d/d", "lt": "now/d",
                               "now": "2024-01-25T13:47:11"}}},
             {"range": {"ts": {"gt": "2024-01-20||/d"}}}]}},
           "sort": ["event_id"],
           "_source": ["event_id", "user_id", "event_type"]}"""),
      Some("""
        SELECT event_id, user_id, event_type FROM events
        WHERE ts >= date_trunc('day', TIMESTAMP '2024-01-25 13:47:11' - INTERVAL 7 DAY)
          AND ts < date_trunc('day', TIMESTAMP '2024-01-25 13:47:11')
          AND ts >= date_trunc('day', TIMESTAMP '2024-01-20 00:00:00') + INTERVAL 1 DAY
        ORDER BY event_id
      """.stripMargin.trim)),

    // named queries (VERDICT r7 #3): `_name` on three clauses, per-hit
    // `matched_queries` as the stringified SORTED name list (the q131
    // no-bare-array rule). Names from every bool section ride up; the
    // must clause's name appears on every hit, each should's only when
    // it matched — the relevance-debugging surface as plain data.
    GraftQuery(
      "q224_dsl_named_queries",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {
             "must": [{"range": {"n_chars": {"gte": 100, "_name": "long_enough"}}}],
             "should": [
               {"match": {"text": {"query": "spark join", "_name": "sj"}}},
               {"prefix": {"text": {"value": "the ", "_name": "the_start"}}},
               {"term": {"lang": {"value": "en", "_name": "english"}}}]}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 80,
           "_source": ["doc_id", "score", "matched_queries"]}"""),
      Some("""
        WITH s AS (
          SELECT doc_id, n_chars,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                     ['spark','join'])) AS BIGINT) AS ms,
            CASE WHEN text LIKE 'the %' THEN 1 ELSE 0 END AS pf,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
          FROM documents)
        SELECT doc_id,
          CAST(1 + CASE WHEN ms >= 1 THEN ms ELSE 0 END + pf + en AS BIGINT) AS score,
          array_to_string(list_sort(list_filter(
            ['long_enough',
             CASE WHEN ms >= 1 THEN 'sj' END,
             CASE WHEN pf = 1 THEN 'the_start' END,
             CASE WHEN en = 1 THEN 'english' END], x -> x IS NOT NULL)), ',')
            AS matched_queries
        FROM s WHERE n_chars >= 100
        ORDER BY score DESC, doc_id LIMIT 80
      """.stripMargin.trim)),

    // _delete_by_query (VERDICT r7 #4): the maintenance write op as
    // DATA — matching docs become CDC delete events for the existing
    // merge machinery (CdcMerge / SearchIndex.mergeCdcBatch /
    // IvfIndex.mergeCdcBatch, all touched-bucket-only). The event
    // table itself is the oracle surface; ByQuerySpec gates the apply
    // half (post-op serve parity with a from-scratch rebuild).
    GraftQuery(
      "q225_dsl_delete_by_query",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        QueryDsl.deleteByQuery(
          Tables.load(s, dir, "documents"),
          """{"query": {"bool": {
               "must": [{"term": {"lang": "fr"}},
                        {"range": {"n_chars": {"lt": 250}}}]}}}""")
          .select(col("doc_id"), col("_action"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, 'delete' AS _action FROM documents
        WHERE lang = 'fr' AND n_chars < 250
        ORDER BY doc_id
      """.stripMargin.trim)),

    // _update_by_query: the Painless assignment shape compiled to
    // codegen'd arithmetic — matching docs re-emitted as upsert events
    // with the mutation applied (here an integer re-score; the string
    // params.<p> replacement form is ByQuerySpec's re-index case).
    GraftQuery(
      "q226_dsl_update_by_query",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        QueryDsl.updateByQuery(
          Tables.load(s, dir, "documents"),
          """{"query": {"term": {"lang": "en"}},
             "script": {"source":
               "ctx._source.n_chars = doc['n_chars'].value * params.scale + params.base",
               "params": {"scale": 2, "base": 7}}}""")
          .select(col("doc_id"), col("n_chars"), col("_action"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, CAST(n_chars * 2 + 7 AS BIGINT) AS n_chars,
               'upsert' AS _action
        FROM documents WHERE lang = 'en'
        ORDER BY doc_id
      """.stripMargin.trim)),

    // histogram `offset` (VERDICT r8 #1): every bucket boundary shifts
    // by the offset — key = floor((x − offset)/interval)·interval +
    // offset — and the min_doc_count:0 dense series aligns to the SAME
    // shifted boundaries (lo/hi re-floored against the offset), so a
    // derivative over the filled series stays correct. extended_bounds
    // exercises the widened fill; the oracle replays the shifted floor
    // and the shifted dense range in DuckDB.
    GraftQuery(
      "q227_dsl_histogram_offset",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"hist": {"histogram": {"field": "n_chars",
               "interval": 50, "offset": 30, "min_doc_count": 0,
               "extended_bounds": {"min": 10, "max": 1200}},
             "aggs": {
               "sum_chars": {"sum": {"field": "n_chars"}},
               "delta": {"derivative": {"buckets_path": "_count"}}}}}}"""),
      Some("""
        WITH b AS (SELECT unnest(range(-20, 1181, 50)) AS hist),
        g AS (
          SELECT CAST(FLOOR((n_chars - 30) / 50.0) * 50 + 30 AS BIGINT) AS hist,
                 COUNT(*) AS doc_count, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM documents WHERE lang = 'en' GROUP BY 1),
        f AS (
          SELECT COALESCE(b.hist, g.hist) AS hist,
                 COALESCE(g.doc_count, 0) AS doc_count, g.sum_chars
          FROM b FULL OUTER JOIN g ON b.hist = g.hist)
        SELECT hist, doc_count, sum_chars,
               doc_count - LAG(doc_count, 1) OVER (ORDER BY hist) AS delta
        FROM f ORDER BY hist
      """.stripMargin.trim)),

    // ------------------------------------------------------------------
    // Analyzer coverage beyond the match family (VERDICT r8 #2): every
    // remaining tokenizing surface takes the per-clause `analyzer` and
    // normalizes FIELD and QUERY through the same twin pair, so one
    // request mixing match and any of these over an analyzed corpus
    // agrees. All seven run over the q221 mixed-case corpus variant
    // (prefix uppercased, spaces turned into ", ") where raw whitespace
    // matching finds nothing; each oracle replays the normalization
    // (strip non-alnum BEFORE lower — the locale-proof order) and the
    // family's existing contract in DuckDB.

    // simple_query_string + analyzer: grammar first (+/-/quotes), then
    // per-token normalization — must spark, must-not merge, phrase
    // should "Data Window".
    GraftQuery(
      "q228_dsl_sqs_analyzed",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val mixed = Tables.load(s, dir, "documents").withColumn("body",
          expr("replace(concat(upper(substring(text, 1, 20)), " +
            "substring(text, 21)), ' ', ', ')"))
        QueryDsl.search(mixed,
          """{"query": {"simple_query_string": {
               "query": "+Spark -Merge \"Data Window\"",
               "fields": ["body"], "analyzer": "standard"}},
             "sort": [{"_score": "desc"}, "doc_id"],
             "size": 40,
             "_source": ["doc_id", "score"]}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 replace(upper(substr(text, 1, 20)) || substr(text, 21),
                         ' ', ', ') AS body
          FROM documents),
        norm AS (
          SELECT doc_id,
                 trim(lower(regexp_replace(body, '[^A-Za-z0-9]+', ' ', 'g'))) AS nb
          FROM mixed),
        t AS (
          SELECT doc_id,
            list_contains(string_split(nb, ' '), 'spark') AS has_spark,
            list_contains(string_split(nb, ' '), 'merge') AS has_merge,
            (' ' || nb || ' ') LIKE '% data window %' AS has_phrase
          FROM norm)
        SELECT doc_id,
               CAST(1 + (CASE WHEN has_phrase THEN 1 ELSE 0 END) AS BIGINT) AS score
        FROM t WHERE has_spark AND NOT has_merge
        ORDER BY score DESC, doc_id
        LIMIT 40
      """.stripMargin.trim)),

    // query_string + analyzer: the Lucene grammar parses first, each
    // LEAF normalizes — fielded term, boosted term, prefix stem.
    GraftQuery(
      "q229_dsl_query_string_analyzed",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val mixed = Tables.load(s, dir, "documents").withColumn("body",
          expr("replace(concat(upper(substring(text, 1, 20)), " +
            "substring(text, 21)), ' ', ', ')"))
        QueryDsl.search(mixed,
          """{"query": {"query_string": {
               "query": "body:Spark AND (Join^2 OR windo*)",
               "default_field": "body", "analyzer": "standard"}},
             "sort": [{"_score": "desc"}, "doc_id"],
             "size": 40,
             "_source": ["doc_id", "score"]}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 replace(upper(substr(text, 1, 20)) || substr(text, 21),
                         ' ', ', ') AS body
          FROM documents),
        norm AS (
          SELECT doc_id,
                 trim(lower(regexp_replace(body, '[^A-Za-z0-9]+', ' ', 'g'))) AS nb
          FROM mixed),
        t AS (
          SELECT doc_id,
            list_contains(string_split(nb, ' '), 'spark') AS has_spark,
            list_contains(string_split(nb, ' '), 'join') AS has_join,
            len(list_filter(string_split(nb, ' '), x -> x LIKE 'windo%')) > 0
              AS has_windo
          FROM norm)
        SELECT doc_id,
               CAST(1 + (CASE WHEN has_join THEN 2 ELSE 0 END)
                      + (CASE WHEN has_windo THEN 1 ELSE 0 END) AS BIGINT) AS score
        FROM t WHERE has_spark AND (has_join OR has_windo)
        ORDER BY score DESC, doc_id
        LIMIT 40
      """.stripMargin.trim)),

    // intervals + analyzer: the position stream comes from the
    // normalized tokens; the stem keeps its `*` and normalizes its
    // text (q220's ordered-subsequence contract over the mixed corpus).
    GraftQuery(
      "q230_dsl_intervals_analyzed",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val mixed = Tables.load(s, dir, "documents").withColumn("body",
          expr("replace(concat(upper(substring(text, 1, 20)), " +
            "substring(text, 21)), ' ', ', ')"))
        QueryDsl.search(mixed,
          """{"query": {"intervals": {
               "body": {"match": {"query": "Spark jo*",
                                  "max_gaps": 4, "ordered": true,
                                  "analyzer": "standard"}},
               "id_field": "doc_id"}},
             "sort": [{"_score": "desc"}, "doc_id"],
             "size": 30,
             "_source": ["doc_id", "n_spans", "min_gaps"]}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 replace(upper(substr(text, 1, 20)) || substr(text, 21),
                         ' ', ', ') AS body
          FROM documents),
        norm AS (
          SELECT doc_id,
                 trim(lower(regexp_replace(body, '[^A-Za-z0-9]+', ' ', 'g'))) AS nb
          FROM mixed),
        arr AS (SELECT doc_id, string_split(nb, ' ') AS a FROM norm),
        pos AS (
          SELECT doc_id, unnest(a) AS tok,
                 unnest(range(1, len(a) + 1)) AS p
          FROM arr),
        p1 AS (SELECT doc_id, p FROM pos WHERE tok = 'spark'),
        p2 AS (SELECT doc_id, p FROM pos WHERE tok LIKE 'jo%'),
        g AS (
          SELECT p1.doc_id, CAST(p2.p - p1.p - 1 AS BIGINT) AS gaps
          FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.p > p1.p
          WHERE p2.p - p1.p - 1 <= 4)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, MIN(gaps) AS min_gaps
        FROM g GROUP BY 1
        ORDER BY n_spans DESC, doc_id
        LIMIT 30
      """.stripMargin.trim)),

    // span_near + analyzer: q160's unordered-proximity contract, the
    // span_term values normalized through the twin ("Join!" → join).
    GraftQuery(
      "q231_dsl_span_near_analyzed",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val mixed = Tables.load(s, dir, "documents").withColumn("body",
          expr("replace(concat(upper(substring(text, 1, 20)), " +
            "substring(text, 21)), ' ', ', ')"))
        QueryDsl.search(mixed,
          """{"query": {"span_near": {
               "clauses": [
                 {"span_term": {"body": "Spark"}},
                 {"span_term": {"body": "Join!"}}],
               "slop": 3, "in_order": false, "id_field": "doc_id",
               "analyzer": "standard"}},
             "sort": [{"_score": "desc"}, "doc_id"],
             "size": 25,
             "_source": ["doc_id", "n_pairs", "min_gap"]}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 replace(upper(substr(text, 1, 20)) || substr(text, 21),
                         ' ', ', ') AS body
          FROM documents),
        norm AS (
          SELECT doc_id,
                 trim(lower(regexp_replace(body, '[^A-Za-z0-9]+', ' ', 'g'))) AS nb
          FROM mixed),
        arr AS (SELECT doc_id, string_split(nb, ' ') AS a FROM norm),
        pos AS (
          SELECT doc_id, unnest(a) AS tok,
                 unnest(range(1, len(a) + 1)) AS p
          FROM arr),
        p1 AS (SELECT doc_id, p FROM pos WHERE tok = 'spark'),
        p2 AS (SELECT doc_id, p FROM pos WHERE tok = 'join'),
        g AS (
          SELECT p1.doc_id, CAST(abs(p1.p - p2.p) - 1 AS BIGINT) AS gap
          FROM p1 JOIN p2 USING (doc_id)
          WHERE abs(p1.p - p2.p) - 1 <= 3)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs, MIN(gap) AS min_gap
        FROM g GROUP BY 1
        ORDER BY n_pairs DESC, doc_id
        LIMIT 25
      """.stripMargin.trim)),

    // significant_text + analyzer: the over-representation table over
    // the normalized token stream (q212's doc-frequency model).
    GraftQuery(
      "q232_dsl_significant_text_analyzed",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val mixed = Tables.load(s, dir, "documents").withColumn("body",
          expr("replace(concat(upper(substring(text, 1, 20)), " +
            "substring(text, 21)), ' ', ', ')"))
        QueryDsl.search(mixed,
          """{"query": {"term": {"lang": "de"}},
             "aggs": {"sig": {"significant_text": {"field": "body",
                 "min_doc_count": 5, "size": 12,
                 "analyzer": "standard"}}}}""")
      },
      Some("""
        WITH mixed AS (
          SELECT *, replace(upper(substr(text, 1, 20)) || substr(text, 21),
                            ' ', ', ') AS body
          FROM documents),
        d AS (SELECT *,
                     trim(lower(regexp_replace(body, '[^A-Za-z0-9]+', ' ', 'g'))) AS nb,
                     (lang = 'de') AS fg
              FROM mixed),
        toks AS (SELECT fg, unnest(list_distinct(string_split(nb, ' '))) AS sig
                 FROM d),
        per AS (
          SELECT sig, COUNT(*) AS bg_count,
                 CAST(COUNT(CASE WHEN fg THEN 1 END) AS BIGINT) AS doc_count
          FROM toks WHERE sig <> '' GROUP BY 1),
        t AS (SELECT COUNT(*) AS n_all,
                     CAST(COUNT(CASE WHEN fg THEN 1 END) AS BIGINT) AS n_fg
              FROM d)
        SELECT sig, doc_count, bg_count,
               (doc_count * n_all * 1000000) // (bg_count * n_fg) AS score_ppm
        FROM per, t
        WHERE doc_count >= 5
        ORDER BY score_ppm DESC, sig
        LIMIT 12
      """.stripMargin.trim),
      // headline: the analyzed-scan family's sentinel (round-9 verdict
      // #9) - an analyzer/normalizer regression (the AsciiFold path)
      // must surface in BENCH_rN, not only in ScaleBench
      headline = true),

    // term suggester + analyzer: corrections come from the normalized
    // vocabulary, the input text normalizes through the twin
    // ("Sprk, Windoow!" → sprk windoow) — q162's ranking contract.
    GraftQuery(
      "q233_dsl_suggest_analyzed",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val mixed = Tables.load(s, dir, "documents").withColumn("body",
          expr("replace(concat(upper(substring(text, 1, 20)), " +
            "substring(text, 21)), ' ', ', ')"))
        QueryDsl.search(mixed,
          """{"suggest": {"spelling": {
               "text": "Sprk, Windoow!",
               "term": {"field": "body", "max_edits": 2, "size": 3,
                        "analyzer": "standard"}}}}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 replace(upper(substr(text, 1, 20)) || substr(text, 21),
                         ' ', ', ') AS body
          FROM documents),
        norm AS (
          SELECT doc_id,
                 trim(lower(regexp_replace(body, '[^A-Za-z0-9]+', ' ', 'g'))) AS nb
          FROM mixed),
        v AS (
          SELECT tok AS term, COUNT(*) AS freq
          FROM (SELECT doc_id, unnest(list_distinct(string_split(nb, ' '))) AS tok
                FROM norm)
          GROUP BY 1),
        inputs(q) AS (VALUES ('sprk'), ('windoow')),
        cand AS (
          SELECT q, term, CAST(levenshtein(q, term) AS BIGINT) AS dist, freq
          FROM inputs, v
          WHERE abs(len(term) - len(q)) <= 2 AND term <> q
            AND levenshtein(q, term) <= 2),
        r AS (
          SELECT q, term, dist, freq,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q ORDER BY dist, freq DESC, term) AS BIGINT) AS rank
          FROM cand)
        SELECT q, rank, term, dist, freq FROM r WHERE rank <= 3
        ORDER BY q, rank
      """.stripMargin.trim)),

    // more_like_this + analyzer: the seed's tf·idf terms and the
    // corpus postings both come from the normalized stream (one
    // withColumn up front; q159's integer idf-weight contract after).
    GraftQuery(
      "q234_dsl_mlt_analyzed",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val mixed = Tables.load(s, dir, "documents").withColumn("body",
          expr("replace(concat(upper(substring(text, 1, 20)), " +
            "substring(text, 21)), ' ', ', ')"))
        QueryDsl.search(mixed,
          """{"query": {"more_like_this": {
               "fields": ["body"],
               "like": {"doc_id": 7},
               "max_query_terms": 10,
               "analyzer": "standard"}},
             "sort": [{"_score": "desc"}, "doc_id"],
             "size": 15,
             "_source": ["doc_id", "n_shared", "score"]}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 replace(upper(substr(text, 1, 20)) || substr(text, 21),
                         ' ', ', ') AS body
          FROM documents),
        norm AS (
          SELECT doc_id,
                 trim(lower(regexp_replace(body, '[^A-Za-z0-9]+', ' ', 'g'))) AS nb
          FROM mixed),
        tok AS (
          SELECT doc_id, unnest(string_split(nb, ' ')) AS term FROM norm),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        seed AS (
          SELECT tf.term,
                 (CAST(tf.tf AS BIGINT) * (SELECT n FROM n)) / CAST(df.df AS BIGINT) AS sel,
                 ((SELECT n FROM n) * 1000000) // CAST(df.df AS BIGINT) AS weight
          FROM tf JOIN df USING (term) WHERE tf.doc_id = 7),
        qt AS (SELECT term, weight,
                 ROW_NUMBER() OVER (ORDER BY sel DESC, term) AS r FROM seed),
        top AS (SELECT term, weight FROM qt WHERE r <= 10)
        SELECT tf.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared,
               CAST(SUM(weight) AS BIGINT) AS score
        FROM tf JOIN top USING (term)
        WHERE tf.doc_id <> 7
        GROUP BY tf.doc_id
        ORDER BY score DESC, doc_id
        LIMIT 15
      """.stripMargin.trim)),

    // percentile_ranks (VERDICT r8 #3): the inverse of q158's discrete
    // percentiles — for each value, the percent of non-NULL field
    // values ≤ it. Exact integer counts, one IEEE divide per value, so
    // the doubles are bit-identical across engines (unlike OpenSearch's
    // own t-digest approximation).
    GraftQuery(
      "q235_dsl_percentile_ranks",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"pr": {"percentile_ranks": {"field": "n_chars",
               "values": [200, 500]}}}}"""),
      Some("""
        SELECT CAST(SUM(CASE WHEN n_chars <= 200 THEN 1 ELSE 0 END) * 100 AS DOUBLE)
                 / CAST(COUNT(n_chars) AS DOUBLE) AS pr_200,
               CAST(SUM(CASE WHEN n_chars <= 500 THEN 1 ELSE 0 END) * 100 AS DOUBLE)
                 / CAST(COUNT(n_chars) AS DOUBLE) AS pr_500
        FROM documents WHERE lang = 'en'
      """.stripMargin.trim)),

    // date_histogram time_zone (fixed ±HH:mm offsets): bucket
    // boundaries align to LOCAL wall time (+05:30 here), keys stay
    // UTC — shift → truncate → unshift in exact microsecond
    // arithmetic (the q208 epoch recipe). Named zones fail loud.
    GraftQuery(
      "q236_dsl_date_histogram_tz",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"term": {"event_type": "click"}},
           "aggs": {"day_ist": {"date_histogram": {"field": "ts",
               "calendar_interval": "day", "time_zone": "+05:30"}}}}"""),
      Some("""
        SELECT date_trunc('day', ts + INTERVAL 330 MINUTE) - INTERVAL 330 MINUTE
                 AS day_ist,
               COUNT(*) AS doc_count
        FROM events WHERE event_type = 'click'
        GROUP BY 1
        ORDER BY doc_count DESC, day_ist
      """.stripMargin.trim)),

    // geo_centroid: the exact mean point of the filtered hit set over
    // the shared GeoFixtures lat/lon — coordinates reconstructed onto
    // the milli-degree integer grid, summed exactly, ONE IEEE divide
    // per axis (bit-identical doubles across engines).
    GraftQuery(
      "q237_dsl_geo_centroid",
      (s, dir) => QueryDsl.search(
        GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer")),
        """{"query": {"range": {"c_custkey": {"lte": 600}}},
           "aggs": {"cen": {"geo_centroid": {
               "lat_field": "lat", "lon_field": "lon"}}}}"""),
      Some("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer)
        SELECT CAST(SUM(CAST(round(lat * 1000) AS BIGINT)) AS DOUBLE)
                 / CAST(COUNT(lat) * 1000 AS DOUBLE) AS cen_lat,
               CAST(SUM(CAST(round(lon * 1000) AS BIGINT)) AS DOUBLE)
                 / CAST(COUNT(lon) * 1000 AS DOUBLE) AS cen_lon
        FROM pts WHERE c_custkey <= 600
      """.stripMargin.trim)),

    // ip_range: [from, to) buckets over dotted-quad IPv4 strings (the
    // access-log idiom) — bounds parsed on the driver to exact
    // integers, the field through one codegen'd split, one-pass
    // filtered aggregates (q145's range tail). The ip derives
    // in-query from user_id so both engines see the same column.
    GraftQuery(
      "q238_dsl_ip_range",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val ev = Tables.load(s, dir, "events").withColumn("ip",
          expr("concat('10.', user_id % 256, '.', (user_id div 7) % 256, " +
            "'.', user_id % 251)"))
        QueryDsl.search(ev,
          """{"aggs": {"net": {"ip_range": {"field": "ip",
               "ranges": [{"to": "10.32.0.0"},
                          {"from": "10.32.0.0", "to": "10.96.0.0"},
                          {"from": "10.96.0.0"}]},
             "aggs": {"n_users": {"cardinality": {"field": "user_id"}}}}}}""")
      },
      Some("""
        WITH e AS (
          SELECT user_id,
                 concat('10.', user_id % 256, '.', (user_id // 7) % 256,
                        '.', user_id % 251) AS ip
          FROM events),
        n AS (
          SELECT user_id,
                 CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
                   + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
                   + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
                   + CAST(string_split(ip, '.')[4] AS BIGINT) AS ipn
          FROM e),
        b AS (
          SELECT 0 AS ord, '*-10.32.0.0' AS net, COUNT(*) AS doc_count,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM n WHERE ipn < 169869312
          UNION ALL
          SELECT 1, '10.32.0.0-10.96.0.0', COUNT(*),
                 CAST(COUNT(DISTINCT user_id) AS BIGINT)
          FROM n WHERE ipn >= 169869312 AND ipn < 174063616
          UNION ALL
          SELECT 2, '10.96.0.0-*', COUNT(*),
                 CAST(COUNT(DISTINCT user_id) AS BIGINT)
          FROM n WHERE ipn >= 174063616)
        SELECT net, doc_count, n_users FROM b ORDER BY ord
      """.stripMargin.trim)),

    // multi-field / multi-fragment highlight: per requested field a
    // highlight_<field> column with up to number_of_fragments
    // fragments (anchored at successive non-overlapping raw
    // occurrences, all occurrences inside each fragment tag-wrapped,
    // fragments joined " ... " — the no-bare-array stringification of
    // OpenSearch's fragment array). Each field anchors on the ONE
    // clause targeting it inside the bool.
    GraftQuery(
      "q239_dsl_highlight_multi",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {
             "must": [{"match_phrase": {"text": "data window"}}],
             "should": [{"term": {"source": "src2"}}]}},
           "highlight": {"fields": {
             "text": {"fragment_size": 40, "number_of_fragments": 2},
             "source": {}}},
           "sort": ["doc_id"], "size": 50,
           "_source": ["doc_id", "highlight_text", "highlight_source"]}"""),
      Some("""
        WITH h AS (
          SELECT doc_id, text, source FROM documents
          WHERE (' ' || text || ' ') LIKE '% data window %'),
        f AS (
          SELECT doc_id, text, source,
                 position('data window' IN text) AS p1
          FROM h),
        g AS (
          SELECT doc_id, text, source, p1,
                 CASE WHEN position('data window' IN substr(text, p1 + 11)) > 0
                      THEN p1 + 11 + position('data window' IN substr(text, p1 + 11)) - 1
                      END AS p2
          FROM f)
        SELECT doc_id,
               concat_ws(' ... ',
                 CASE WHEN p1 > 0
                      THEN replace(substr(text, GREATEST(p1 - 20, 1), 40),
                                   'data window', '<em>data window</em>') END,
                 CASE WHEN p2 IS NOT NULL
                      THEN replace(substr(text, GREATEST(p2 - 20, 1), 40),
                                   'data window', '<em>data window</em>') END)
                 AS highlight_text,
               CASE WHEN position('src2' IN source) > 0
                    THEN replace(substr(source,
                           GREATEST(position('src2' IN source) - 20, 1), 60),
                           'src2', '<em>src2</em>') END AS highlight_source
        FROM g ORDER BY doc_id LIMIT 50
      """.stripMargin.trim)),

    // terms include/exclude: bucket-key filtering by a whole-value-
    // anchored regex (the OpenSearch terms-regex contract) or an
    // exact-values array — applied to the KEY EXPRESSION on the hit
    // rows, i.e. map-side BEFORE the groupBy, so at scale the
    // excluded keys never enter the shuffle.
    GraftQuery(
      "q240_dsl_terms_include_exclude",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"range": {"n_chars": {"gte": 100}}},
           "aggs": {"src": {"terms": {"field": "source", "size": 10,
               "include": "src[0-4]", "exclude": ["src2"]},
             "aggs": {"sum_chars": {"sum": {"field": "n_chars"}}}}}}"""),
      Some("""
        WITH h AS (SELECT * FROM documents WHERE n_chars >= 100),
        g AS (
          SELECT source AS src, COUNT(*) AS doc_count,
                 CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM h
          WHERE regexp_full_match(source, 'src[0-4]') AND source <> 'src2'
          GROUP BY 1)
        SELECT src, doc_count, sum_chars FROM g
        ORDER BY doc_count DESC, src LIMIT 10
      """.stripMargin.trim)),

    // date_histogram dense fill: min_doc_count 0 + ISO extended_bounds
    // over a fixed_interval series — EMPTY TIME BUCKETS APPEAR
    // (doc_count 0, sub-aggs NULL) so a derivative over a sparse time
    // series is correct; the series is exact microsecond arithmetic
    // aligned to the fixed-interval boundaries. Bounds 2023-12-20 ..
    // 2024-02-10 at 2d buckets: lo bucket floor(1703030400/172800)
    // = 1702944000 (2023-12-19), 27 buckets.
    GraftQuery(
      "q241_dsl_date_histogram_fill",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"term": {"event_type": "purchase"}},
           "aggs": {"w2": {"date_histogram": {"field": "ts",
               "fixed_interval": "2d", "min_doc_count": 0,
               "extended_bounds": {"min": "2023-12-20", "max": "2024-02-10"}},
             "aggs": {"n_users": {"cardinality": {"field": "user_id"}},
                      "delta": {"derivative": {"buckets_path": "_count"}}}}}}"""),
      Some("""
        WITH b AS (
          SELECT make_timestamp(1702944000000000
                   + 172800000000 * CAST(i AS BIGINT)) AS w2
          FROM range(0, 27) t(i)),
        g AS (
          SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 172800000000) AS w2,
                 COUNT(*) AS doc_count,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        f AS (
          SELECT COALESCE(b.w2, g.w2) AS w2,
                 COALESCE(g.doc_count, 0) AS doc_count, g.n_users
          FROM b FULL OUTER JOIN g ON b.w2 = g.w2)
        SELECT w2, doc_count, n_users,
               doc_count - LAG(doc_count, 1) OVER (ORDER BY w2) AS delta
        FROM f ORDER BY w2
      """.stripMargin.trim)),

    // nested agg: metric sub-aggs over ARRAY ELEMENTS (the q157 data
    // model on the agg surface) — doc_count counts nested documents,
    // one explode + one global aggregate; sub-agg metrics are
    // order-free (count/min/max) so the result is engine-exact.
    GraftQuery(
      "q242_dsl_nested_agg",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val li = Tables.load(s, dir, "lineitem")
        val nested = li.groupBy(col("l_orderkey").as("order_key"))
          .agg(array_sort(collect_list(struct(
            col("l_linenumber").as("ln"),
            col("l_quantity").as("qty"),
            col("l_discount").as("disc")))).as("items"))
        QueryDsl.search(nested,
          """{"query": {"range": {"order_key": {"lte": 3000}}},
             "aggs": {"it": {"nested": {"path": "items"},
               "aggs": {"n_lines": {"value_count": {"field": "items.ln"}},
                        "max_qty": {"max": {"field": "items.qty"}},
                        "min_disc": {"min": {"field": "items.disc"}}}}}}""")
      },
      Some("""
        SELECT CAST(COUNT(*) AS BIGINT) AS doc_count,
               CAST(COUNT(l_linenumber) AS BIGINT) AS n_lines,
               MAX(l_quantity) AS max_qty,
               MIN(l_discount) AS min_disc
        FROM lineitem WHERE l_orderkey <= 3000
      """.stripMargin.trim)),

    // date_range bounds in DATE MATH: "now-2y/y" / "now/M" resolved on
    // the driver against the request-supplied deterministic now (the
    // q223 convention), plain-floor rounding on BOTH ends (the
    // OpenSearch aggregation rule — the bound-type-aware rounding is
    // the range QUERY's contract); bucket labels keep the request's
    // expression text. now=1999-06-15: now-2y/y = 1997-01-01,
    // now/M = 1999-06-01.
    GraftQuery(
      "q243_dsl_date_range_math",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "orders"),
        """{"aggs": {"era": {"date_range": {"field": "o_orderdate",
             "now": "1999-06-15",
             "ranges": [{"to": "now-2y/y"},
                        {"from": "now-2y/y", "to": "now/M"},
                        {"from": "now/M"}]},
           "aggs": {"n_cust": {"cardinality": {"field": "o_custkey"}},
                    "max_price": {"max": {"field": "o_totalprice"}}}}}}"""),
      Some("""
        WITH b AS (
          SELECT 0 AS ord, '*-now-2y/y' AS era, COUNT(*) AS doc_count,
                 CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
                 MAX(o_totalprice) AS max_price
          FROM orders WHERE o_orderdate < DATE '1997-01-01'
          UNION ALL
          SELECT 1, 'now-2y/y-now/M', COUNT(*),
                 CAST(COUNT(DISTINCT o_custkey) AS BIGINT), MAX(o_totalprice)
          FROM orders WHERE o_orderdate >= DATE '1997-01-01'
            AND o_orderdate < DATE '1999-06-01'
          UNION ALL
          SELECT 2, 'now/M-*', COUNT(*),
                 CAST(COUNT(DISTINCT o_custkey) AS BIGINT), MAX(o_totalprice)
          FROM orders WHERE o_orderdate >= DATE '1999-06-01')
        SELECT era, doc_count, n_cust, max_price FROM b ORDER BY ord
      """.stripMargin.trim)),

    // script_fields: computed per-hit output columns through the ONE
    // ScoreScript compiler (script_score/scripted_metric's grammar) —
    // Painless-shaped integer arithmetic compiled once on the driver
    // to codegen'd Catalyst, referencing _score and doc fields; the
    // derived column is visible to sort and _source.
    GraftQuery(
      "q244_dsl_script_fields",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match": {"text": "spark join window"}},
           "script_fields": {"weighted": {"script": {
             "source": "params.w * _score + min(doc['n_chars'].value, params.cap)",
             "params": {"w": 3, "cap": 300}}}},
           "sort": [{"weighted": "desc"}, "doc_id"],
           "size": 40,
           "_source": ["doc_id", "score", "weighted"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id, n_chars,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                     ['spark','join','window'])) AS BIGINT) AS score
          FROM documents)
        SELECT doc_id, score,
               CAST(3 * score + LEAST(n_chars, 300) AS BIGINT) AS weighted
        FROM t WHERE score >= 1
        ORDER BY weighted DESC, doc_id
        LIMIT 40
      """.stripMargin.trim)),

    // _rank_eval: the relevance-regression harness — rated requests,
    // precision over the top-10 window per request (relevant /
    // RETRIEVED, the OpenSearch denominator). Corpus-sized ranking work runs inside
    // each compiled request; only the ≤k top ids return (bounded wire
    // metadata), metric arithmetic exact. The oracle replays both
    // rankings and the set intersection.
    GraftQuery(
      "q245_dsl_rank_eval",
      (s, dir) => QueryDsl.rankEval(
        Tables.load(s, dir, "documents"),
        """{"id_field": "doc_id",
           "metric": {"precision": {"k": 10, "relevant_rating_threshold": 1}},
           "requests": [
             {"id": "qa",
              "request": {"query": {"match": {"text": "spark join"}},
                          "sort": [{"_score": "desc"}, "doc_id"],
                          "size": 10, "_source": ["doc_id"]},
              "ratings": [{"doc_id": 0, "rating": 1}, {"doc_id": 2, "rating": 1},
                          {"doc_id": 4, "rating": 1}, {"doc_id": 6, "rating": 1},
                          {"doc_id": 8, "rating": 1}, {"doc_id": 1, "rating": 0},
                          {"doc_id": 3, "rating": 0}]},
             {"id": "qb",
              "request": {"query": {"match": {"text": "data window"}},
                          "sort": [{"_score": "desc"}, "doc_id"],
                          "size": 10, "_source": ["doc_id"]},
              "ratings": [{"doc_id": 1, "rating": 1}, {"doc_id": 3, "rating": 1},
                          {"doc_id": 5, "rating": 1}, {"doc_id": 7, "rating": 1},
                          {"doc_id": 9, "rating": 1}, {"doc_id": 11, "rating": 1}]}]}"""),
      Some("""
        WITH ta AS (
          SELECT doc_id FROM (
            SELECT doc_id,
              CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                       ['spark','join'])) AS BIGINT) AS score
            FROM documents) s
          WHERE score >= 1 ORDER BY score DESC, doc_id LIMIT 10),
        tb AS (
          SELECT doc_id FROM (
            SELECT doc_id,
              CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                       ['data','window'])) AS BIGINT) AS score
            FROM documents) s
          WHERE score >= 1 ORDER BY score DESC, doc_id LIMIT 10),
        rela(doc_id) AS (VALUES (0), (2), (4), (6), (8)),
        relb(doc_id) AS (VALUES (1), (3), (5), (7), (9), (11)),
        m AS (
          -- precision divides by RETRIEVED (≤ k), not by k — the
          -- OpenSearch contract; at tiny SFs a request may return
          -- fewer than 10 hits
          SELECT 'qa' AS req_id,
                 CASE WHEN (SELECT COUNT(*) FROM ta) = 0 THEN 0.0
                      ELSE (SELECT CAST(COUNT(*) AS DOUBLE)
                            FROM ta JOIN rela USING (doc_id))
                           / (SELECT COUNT(*) FROM ta) END AS "precision"
          UNION ALL
          SELECT 'qb',
                 CASE WHEN (SELECT COUNT(*) FROM tb) = 0 THEN 0.0
                      ELSE (SELECT CAST(COUNT(*) AS DOUBLE)
                            FROM tb JOIN relb USING (doc_id))
                           / (SELECT COUNT(*) FROM tb) END)
        SELECT req_id, "precision" FROM m ORDER BY req_id
      """.stripMargin.trim)),

    // term-level case_insensitive (term/prefix/wildcard/regexp):
    // term-level queries skip the analyzer by the OpenSearch contract,
    // so this flag is their only folding — both sides lower (regexp
    // via the inline (?i) flag both engines' regex dialects honor).
    // The corpus variant uppercases the first two source chars so raw
    // matching finds nothing.
    GraftQuery(
      "q246_dsl_case_insensitive",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val t = Tables.load(s, dir, "documents").withColumn("src_u",
          expr("concat(upper(substring(source, 1, 2)), substring(source, 3))"))
        QueryDsl.search(t,
          """{"query": {"bool": {"should": [
               {"term": {"src_u": {"value": "src2", "case_insensitive": true}}},
               {"prefix": {"src_u": {"value": "sRc1", "case_insensitive": true}}},
               {"wildcard": {"src_u": {"value": "src?", "case_insensitive": true}}},
               {"regexp": {"src_u": {"value": "src[0-3]", "case_insensitive": true}}}],
             "minimum_should_match": 1}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 60,
           "_source": ["doc_id", "src_u", "score"]}""")
      },
      Some("""
        WITH t AS (
          SELECT doc_id, source,
                 upper(substr(source, 1, 2)) || substr(source, 3) AS src_u
          FROM documents),
        s AS (
          SELECT doc_id, src_u,
            CAST((CASE WHEN source = 'src2' THEN 1 ELSE 0 END)
               + (CASE WHEN source LIKE 'src1%' THEN 1 ELSE 0 END)
               + (CASE WHEN source LIKE 'src_' THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_full_match(source, '(?i)src[0-3]')
                       THEN 1 ELSE 0 END) AS BIGINT) AS score
          FROM t)
        SELECT doc_id, src_u, score FROM s WHERE score >= 1
        ORDER BY score DESC, doc_id LIMIT 60
      """.stripMargin.trim)),

    // filters other_bucket: the remainder bucket (docs matching NO
    // named filter) as one more conditional aggregate in the SAME
    // one-pass row — no extra scan; named via other_bucket_key.
    GraftQuery(
      "q247_dsl_filters_other_bucket",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"kind": {"filters": {"filters": {
               "short": {"range": {"n_chars": {"lt": 250}}},
               "sparky": {"match": {"text": "spark"}}},
               "other_bucket_key": "rest"},
             "aggs": {"sum_chars": {"sum": {"field": "n_chars"}}}}}}"""),
      Some("""
        WITH en AS (SELECT * FROM documents WHERE lang = 'en'),
        b AS (
          SELECT 0 AS ord, 'short' AS kind, COUNT(*) AS doc_count,
                 CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM en WHERE n_chars < 250
          UNION ALL
          SELECT 1, 'sparky', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
          FROM en WHERE list_contains(list_distinct(string_split(text, ' ')), 'spark')
          UNION ALL
          SELECT 2, 'rest', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
          FROM en WHERE NOT (n_chars < 250)
            AND NOT list_contains(list_distinct(string_split(text, ' ')), 'spark'))
        SELECT kind, doc_count, sum_chars FROM b ORDER BY ord
      """.stripMargin.trim)),

    // bucket_script: the dashboard ratio idiom — derived per-bucket
    // arithmetic over sibling metric paths (params.a * 100 /
    // params.b), compiled to a Catalyst column over the BOUNDED
    // bucket table; corpus work is unchanged (the one date_trunc
    // groupBy). Exact integer a*100 with ONE IEEE divide replays
    // bit-identically in DuckDB as CAST(a*100 AS DOUBLE)/b. Composed
    // with derivative to pin the column-adder pass.
    GraftQuery(
      "q248_dsl_bucket_script",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"term": {"event_type": "purchase"}},
           "aggs": {"day": {"date_histogram": {"field": "ts",
               "calendar_interval": "day"},
             "aggs": {"sum_uid": {"sum": {"field": "user_id"}},
                      "uid_per_100_docs": {"bucket_script": {
                        "buckets_path": {"a": "sum_uid", "b": "_count"},
                        "script": "params.a * 100 / params.b"}},
                      "delta": {"derivative": {"buckets_path": "sum_uid"}}}}}}"""),
      Some("""
        WITH g AS (
          SELECT date_trunc('day', ts) AS day, COUNT(*) AS doc_count,
                 CAST(SUM(user_id) AS BIGINT) AS sum_uid
          FROM events WHERE event_type = 'purchase' GROUP BY 1)
        SELECT day, doc_count, sum_uid,
               CAST(sum_uid * 100 AS DOUBLE) / doc_count AS uid_per_100_docs,
               sum_uid - LAG(sum_uid, 1) OVER (ORDER BY day) AS delta
        FROM g ORDER BY day
      """.stripMargin.trim)),

    // match fuzziness: the commonest fuzzy spelling ({"match": {f:
    // {"query": ..., "fuzziness": 1}}}) — each MISSPELLED query term
    // matches when any distinct analyzed token is within 1 edit
    // (exists + levenshtein over the bounded per-row token array,
    // whole-stage codegen, the q48 term-dictionary walk); score =
    // matched query terms, msm gates. Analyzer-composed over the
    // q221 cased+punctuated corpus; DuckDB replays with list_filter
    // + levenshtein.
    GraftQuery(
      "q249_dsl_match_fuzzy",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val mixed = Tables.load(s, dir, "documents").withColumn("body",
          expr("replace(concat(upper(substring(text, 1, 20)), " +
            "substring(text, 21)), ' ', ', ')"))
        QueryDsl.search(mixed,
          """{"query": {"match": {"body":
               {"query": "Sparc, joinn windoww!", "analyzer": "standard",
                "fuzziness": 1, "minimum_should_match": 2}}},
             "sort": [{"_score": "desc"}, "doc_id"],
             "size": 60,
             "_source": ["doc_id", "score"]}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 replace(upper(substr(text, 1, 20)) || substr(text, 21),
                         ' ', ', ') AS body
          FROM documents),
        norm AS (
          SELECT doc_id,
                 trim(lower(regexp_replace(body, '[^A-Za-z0-9]+', ' ', 'g'))) AS nb
          FROM mixed),
        toks AS (
          SELECT doc_id, list_distinct(string_split(nb, ' ')) AS tk
          FROM norm),
        scored AS (
          SELECT doc_id,
            CAST((CASE WHEN len(list_filter(tk,
                    t -> levenshtein(t, 'sparc') <= 1)) > 0 THEN 1 ELSE 0 END)
               + (CASE WHEN len(list_filter(tk,
                    t -> levenshtein(t, 'joinn') <= 1)) > 0 THEN 1 ELSE 0 END)
               + (CASE WHEN len(list_filter(tk,
                    t -> levenshtein(t, 'windoww') <= 1)) > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS score
          FROM toks)
        SELECT doc_id, score FROM scored WHERE score >= 2
        ORDER BY score DESC, doc_id LIMIT 60
      """.stripMargin.trim)),

    // geohash_grid: REAL base-32 geohash cell keys (interoperable
    // with OpenSearch's strings, unlike q181's fixed-degree analog) —
    // one groupBy on the codegen'd quantize→interleave→base-32 key;
    // the oracle replays the identical bit arithmetic term-for-term
    // (generated from one Scala recipe so they cannot drift).
    GraftQuery(
      "q250_dsl_geohash_grid",
      (s, dir) => {
        val pts = GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer"))
        QueryDsl.search(pts,
          """{"query": {"match_all": {}},
             "aggs": {"cell": {"geohash_grid": {
                 "lat_field": "lat", "lon_field": "lon", "precision": 4},
               "aggs": {"min_key": {"min": {"field": "c_custkey"}}}}}}""")
      },
      Some {
        val (ix, iy, code, hash) = geohashSqlParts(4)
        s"""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer),
        q AS (SELECT c_custkey, $ix AS ix, $iy AS iy FROM pts),
        c AS (SELECT c_custkey, $code AS code FROM q),
        h AS (SELECT c_custkey, $hash AS cell FROM c)
        SELECT cell, CAST(COUNT(*) AS BIGINT) AS doc_count,
               MIN(c_custkey) AS min_key
        FROM h GROUP BY 1 ORDER BY doc_count DESC, cell
        """.stripMargin.trim
      }),

    // geo_bounds: the enclosing box of the filtered point set — pure
    // min/max per axis beside a plain metric in ONE global aggregate
    // row (zero arithmetic, bit-identical across engines).
    GraftQuery(
      "q251_dsl_geo_bounds",
      (s, dir) => {
        val pts = GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer"))
        QueryDsl.search(pts,
          """{"query": {"geo_distance": {
               "distance_km": 5000.0,
               "lat_field": "lat", "lon_field": "lon",
               "origin": {"lat": 40.0, "lon": -74.0}}},
             "aggs": {"box": {"geo_bounds": {
                 "lat_field": "lat", "lon_field": "lon"}},
               "n": {"value_count": {"field": "c_custkey"}}}}""")
      },
      Some("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer),
        d AS (
          SELECT c_custkey, lat, lon,
                 round(CAST(12742.0176 AS DOUBLE) * asin(sqrt(
                   sin((lat - 40.0) * pi() / 180.0 / 2.0) * sin((lat - 40.0) * pi() / 180.0 / 2.0)
                   + cos(40.0 * pi() / 180.0) * cos(lat * pi() / 180.0)
                     * sin((lon + 74.0) * pi() / 180.0 / 2.0) * sin((lon + 74.0) * pi() / 180.0 / 2.0))), 6) AS dist_km
          FROM pts)
        SELECT MAX(lat) AS box_top_lat, MIN(lon) AS box_left_lon,
               MIN(lat) AS box_bottom_lat, MAX(lon) AS box_right_lon,
               COUNT(c_custkey) AS n
        FROM d WHERE dist_km <= 5000.0
      """.stripMargin.trim)),

    // median_absolute_deviation: exact discrete MAD (percentile_disc
    // 0.5 of |x − median|, the q158 divergence doctrine — OpenSearch
    // itself serves a t-digest approximation) COMPOSED under a terms
    // bucket beside a one-pass metric: two keyed passes + one
    // null-safe co-partitioned join weave the MAD column into the
    // bucket table.
    GraftQuery(
      "q252_dsl_mad",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"src": {"terms": {"field": "source"},
             "aggs": {"avg_chars": {"avg": {"field": "n_chars"}},
                      "mad_chars": {"median_absolute_deviation": {
                        "field": "n_chars"}}}}}}"""),
      Some("""
        WITH en AS (SELECT * FROM documents WHERE lang = 'en'),
        med AS (
          SELECT source, quantile_disc(n_chars, 0.5) AS med
          FROM en GROUP BY 1),
        dev AS (
          SELECT d.source, abs(d.n_chars - m.med) AS dev
          FROM en d JOIN med m USING (source)),
        mad AS (
          SELECT source, CAST(quantile_disc(dev, 0.5) AS DOUBLE) AS mad_chars
          FROM dev GROUP BY 1),
        b AS (
          SELECT source AS src, COUNT(*) AS doc_count,
                 CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars
          FROM en GROUP BY 1)
        SELECT b.src, b.doc_count, b.avg_chars, mad.mad_chars
        FROM b JOIN mad ON b.src = mad.source
        ORDER BY b.doc_count DESC, b.src
      """.stripMargin.trim)),

    // knn + filter on the EXACT arm (the reference oracle the
    // index-served filtered path is spec'd against): the filter
    // pre-gates candidates map-side (pushed into the scan), then the
    // q169 quantize→integer-dot→one-divide ranking runs over the
    // survivors only.
    GraftQuery(
      "q253_dsl_knn_filtered",
      (s, dir) => {
        val vec = (0 until 64).map(i => ((i * 3) % 11 - 5) / 20.0)
        QueryDsl.search(
          Tables.load(s, dir, "embeddings"),
          s"""{"knn": {
               "field": "embedding", "id_field": "vec_id",
               "query_vector": [${vec.mkString(",")}],
               "k": 12,
               "filter": {"term": {"label": 1}}}}""")
      },
      Some("""
        WITH qv AS (
          SELECT list_transform(range(0, 64),
                   i -> CAST(round((((i * 3) % 11) - 5) / 20.0 * 1e7) AS BIGINT)::DOUBLE) AS qq),
        qn AS (SELECT qq, list_dot_product(qq, qq) AS qn2 FROM qv),
        e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)::DOUBLE) AS q
          FROM embeddings WHERE label = 1),
        n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
        scored AS (
          SELECT vec_id, list_dot_product(qq, q) / (sqrt(qn2) * sqrt(n2)) AS sim
          FROM n CROSS JOIN qn),
        ranked AS (
          SELECT vec_id, sim,
                 CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
          FROM scored)
        SELECT vec_id, rank, sim FROM ranked WHERE rank <= 12 ORDER BY rank
      """.stripMargin.trim)),

    // has_child: the join-field relations model's parent arm over a
    // customer(parent)/orders(child) single-table layout (ids unique
    // across the table — the OpenSearch _id-per-index contract; order
    // ids offset into a disjoint range) — children filtered map-side,
    // ONE groupBy on the parent pointer, ONE inner equi-join back by
    // id (both exchanges hash the id domain); score_mode sum counts
    // the matching children (range scores 1 each), min_children gates.
    GraftQuery(
      "q254_dsl_has_child",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val c = Tables.load(s, dir, "customer").select(
          lit("customer").as("rel"), col("c_custkey").as("doc_id"),
          lit(null).cast("long").as("parent_id"),
          lit(null).cast("double").as("price"),
          col("c_acctbal").as("acctbal"))
        val o = Tables.load(s, dir, "orders").select(
          lit("order").as("rel"),
          (lit(10000000L) + col("o_orderkey")).as("doc_id"),
          col("o_custkey").as("parent_id"),
          col("o_totalprice").as("price"),
          lit(null).cast("double").as("acctbal"))
        QueryDsl.search(c.unionByName(o),
          """{"query": {"has_child": {"type": "order", "join_field": "rel",
               "parent_type": "customer",
               "id_field": "doc_id", "parent_field": "parent_id",
               "query": {"range": {"price": {"gte": 300000}}},
               "score_mode": "sum", "min_children": 3}},
             "sort": [{"_score": "desc"}, "doc_id"], "size": 50,
             "_source": ["doc_id", "score", "acctbal"]}""")
      },
      Some("""
        WITH kids AS (
          SELECT o_custkey AS pid, CAST(COUNT(*) AS BIGINT) AS n
          FROM orders WHERE o_totalprice >= 300000
          GROUP BY 1 HAVING COUNT(*) >= 3)
        SELECT c_custkey AS doc_id, n AS score, c_acctbal AS acctbal
        FROM customer JOIN kids ON c_custkey = pid
        ORDER BY score DESC, doc_id LIMIT 50
      """.stripMargin.trim)),

    // has_parent: the child arm — order rows whose parent customer
    // matches a scored bool (two must ranges + a should range over
    // acctbal → parent score 2 or 3), score: true propagates the
    // parent's score to each child, type gates the returned rows.
    GraftQuery(
      "q255_dsl_has_parent",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val c = Tables.load(s, dir, "customer").select(
          lit("customer").as("rel"), col("c_custkey").as("doc_id"),
          lit(null).cast("long").as("parent_id"),
          lit(null).cast("double").as("price"),
          col("c_acctbal").as("acctbal"))
        val o = Tables.load(s, dir, "orders").select(
          lit("order").as("rel"),
          (lit(10000000L) + col("o_orderkey")).as("doc_id"),
          col("o_custkey").as("parent_id"),
          col("o_totalprice").as("price"),
          lit(null).cast("double").as("acctbal"))
        QueryDsl.search(c.unionByName(o),
          """{"query": {"has_parent": {"parent_type": "customer",
               "join_field": "rel", "id_field": "doc_id",
               "parent_field": "parent_id",
               "query": {"bool": {
                 "must": [{"range": {"acctbal": {"gte": 5000}}},
                          {"range": {"acctbal": {"lte": 5600}}}],
                 "should": [{"range": {"acctbal": {"gte": 5300}}}]}},
               "score": true, "type": "order"}},
             "sort": [{"_score": "desc"}, "doc_id"], "size": 60,
             "_source": ["doc_id", "score", "price"]}""")
      },
      Some("""
        WITH p AS (
          SELECT c_custkey AS pid,
                 CAST(2 + CASE WHEN c_acctbal >= 5300 THEN 1 ELSE 0 END
                   AS BIGINT) AS pscore
          FROM customer WHERE c_acctbal BETWEEN 5000 AND 5600)
        SELECT 10000000 + o.o_orderkey AS doc_id,
               p.pscore AS score, o.o_totalprice AS price
        FROM orders o JOIN p ON o.o_custkey = p.pid
        ORDER BY score DESC, doc_id LIMIT 60
      """.stripMargin.trim)),

    // _explain: per-hit integer score decomposition — one part column
    // per clause (must scores, should-when-matched), sum(parts) ==
    // score by construction, ONE projection over the same filtered
    // scan. The oracle replays each part independently.
    GraftQuery(
      "q256_dsl_explain",
      (s, dir) => QueryDsl.explain(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {
             "must": [{"match": {"text": "spark"}}],
             "should": [{"match": {"text": "join"}},
                        {"term": {"lang": "en"}}]}}}""",
        "doc_id").orderBy("doc_id"),
      Some("""
        WITH t AS (
          SELECT doc_id,
            CAST(CASE WHEN list_contains(list_distinct(string_split(text, ' ')),
                 'spark') THEN 1 ELSE 0 END AS BIGINT) AS m0,
            CAST(CASE WHEN list_contains(list_distinct(string_split(text, ' ')),
                 'join') THEN 1 ELSE 0 END AS BIGINT) AS s0,
            CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS s1
          FROM documents)
        SELECT doc_id, CAST(m0 + s0 + s1 AS BIGINT) AS score,
               m0 AS part_must_0, s0 AS part_should_0, s1 AS part_should_1
        FROM t WHERE m0 >= 1
        ORDER BY doc_id
      """.stripMargin.trim)),

    // moving_percentiles: the exact DISCRETE analog (q158 doctrine —
    // OpenSearch merges t-digest sketches; the engine takes the
    // discrete percentile of the window's bucket-metric series) over
    // a calendar-day date_histogram; the oracle replays the same
    // sort-window-and-index arithmetic with DuckDB list windows.
    GraftQuery(
      "q257_dsl_moving_percentiles",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"term": {"event_type": "purchase"}},
           "aggs": {"day": {"date_histogram": {"field": "ts",
               "calendar_interval": "day"},
             "aggs": {"mv": {"moving_percentiles": {"buckets_path": "_count",
               "window": 7, "percents": [50, 90]}}}}}}"""),
      Some("""
        WITH g AS (
          SELECT date_trunc('day', ts) AS day, COUNT(*) AS doc_count
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        w AS (
          SELECT day, doc_count,
                 list(doc_count) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS l
          FROM g)
        SELECT day, doc_count,
               list_sort(l)[CAST((len(l) * 50 + 99) // 100 AS INT)] AS mv_p50,
               list_sort(l)[CAST((len(l) * 90 + 99) // 100 AS INT)] AS mv_p90
        FROM w ORDER BY day
      """.stripMargin.trim)),

    // normalize: percent_of_sum + z-score over a terms bucket's sum
    // series — full-series stats from exact integer sums, then the
    // PINNED IEEE op order (mean = Σ/n; var = (nΣx²−(Σx)²)/n²; one
    // sqrt; one final divide) that DuckDB replays bit-identically.
    GraftQuery(
      "q258_dsl_normalize",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match_all": {}},
           "aggs": {"src": {"terms": {"field": "source"},
             "aggs": {"s": {"sum": {"field": "n_chars"}},
               "pct": {"normalize": {"buckets_path": "s",
                 "method": "percent_of_sum"}},
               "z": {"normalize": {"buckets_path": "s",
                 "method": "z-score"}}}}}}"""),
      Some("""
        WITH b AS (
          SELECT source AS src, COUNT(*) AS doc_count,
                 CAST(SUM(n_chars) AS BIGINT) AS s
          FROM documents GROUP BY 1)
        SELECT src, doc_count, s,
               CAST(s AS DOUBLE) / CAST(SUM(s) OVER () AS DOUBLE) AS pct,
               (CAST(s AS DOUBLE)
                  - CAST(SUM(s) OVER () AS DOUBLE) / CAST(COUNT(s) OVER () AS DOUBLE))
               / sqrt(CAST(COUNT(s) OVER () * SUM(s * s) OVER ()
                           - SUM(s) OVER () * SUM(s) OVER () AS DOUBLE)
                      / CAST(COUNT(s) OVER () * COUNT(s) OVER () AS DOUBLE)) AS z
        FROM b ORDER BY src
      """.stripMargin.trim)),

    // percentiles_bucket: exact discrete percentiles over the whole
    // bucket series (OpenSearch's own percentiles_bucket holds the
    // full series, so this is NOT a divergence) — one sibling row.
    GraftQuery(
      "q259_dsl_percentiles_bucket",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"match_all": {}},
           "aggs": {"day": {"date_histogram": {"field": "ts",
               "calendar_interval": "day"}},
             "pb": {"percentiles_bucket": {"buckets_path": "day>_count",
               "percents": [25, 50, 75, 95]}}}}"""),
      Some("""
        WITH g AS (
          SELECT date_trunc('day', ts) AS day, COUNT(*) AS doc_count
          FROM events GROUP BY 1)
        SELECT CAST(quantile_disc(doc_count, 0.25) AS DOUBLE) AS pb_p25,
               CAST(quantile_disc(doc_count, 0.50) AS DOUBLE) AS pb_p50,
               CAST(quantile_disc(doc_count, 0.75) AS DOUBLE) AS pb_p75,
               CAST(quantile_disc(doc_count, 0.95) AS DOUBLE) AS pb_p95
        FROM g
      """.stripMargin.trim)),

    // geotile_grid: REAL z/x/y web-mercator tile keys (interoperable
    // with every slippy-map server) — the oracle replays the same
    // clamp→mercator→floor pipeline term-for-term (ln/tan/cos are
    // IEEE transcendentals evaluated on identical doubles).
    GraftQuery(
      "q260_dsl_geotile_grid",
      (s, dir) => {
        val pts = GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer"))
        QueryDsl.search(pts,
          """{"query": {"match_all": {}},
             "aggs": {"cell": {"geotile_grid": {
                 "lat_field": "lat", "lon_field": "lon", "precision": 6},
               "aggs": {"min_key": {"min": {"field": "c_custkey"}}}}}}""")
      },
      Some("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer),
        q AS (
          SELECT c_custkey,
                 CAST(least(greatest(floor((lon + 180.0) / 360.0 * 64.0), 0.0), 63.0) AS BIGINT) AS x,
                 least(greatest(lat, -85.05112878), 85.05112878) * (pi() / 180.0) AS lr
          FROM pts),
        t AS (
          SELECT c_custkey, x,
                 CAST(least(greatest(floor(
                   (1.0 - ln(tan(lr) + 1.0 / cos(lr)) / pi()) / 2.0 * 64.0), 0.0), 63.0) AS BIGINT) AS y
          FROM q),
        h AS (
          SELECT c_custkey,
                 '6/' || CAST(x AS VARCHAR) || '/' || CAST(y AS VARCHAR) AS cell
          FROM t)
        SELECT cell, CAST(COUNT(*) AS BIGINT) AS doc_count,
               MIN(c_custkey) AS min_key
        FROM h GROUP BY 1 ORDER BY doc_count DESC, cell
      """.stripMargin.trim)),

    // t_test: Welch + pooled two-sample t statistics from exact
    // integer moments in ONE aggregate pass (both arms' sums ride the
    // same scan); the oracle replays the pinned IEEE op order.
    GraftQuery(
      "q261_dsl_t_test",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match_all": {}},
           "aggs": {"t_welch": {"t_test": {
               "a": {"field": "n_chars", "filter": {"term": {"lang": "en"}}},
               "b": {"field": "n_chars", "filter": {"term": {"lang": "de"}}},
               "type": "heteroscedastic"}},
             "t_pooled": {"t_test": {
               "a": {"field": "n_chars", "filter": {"term": {"lang": "en"}}},
               "b": {"field": "n_chars", "filter": {"term": {"lang": "de"}}},
               "type": "homoscedastic"}}}}"""),
      Some("""
        WITH m AS (
          SELECT COUNT(CASE WHEN lang = 'en' THEN n_chars END) AS na,
                 CAST(SUM(CASE WHEN lang = 'en' THEN n_chars END) AS BIGINT) AS sa,
                 CAST(SUM(CASE WHEN lang = 'en' THEN CAST(n_chars AS BIGINT) * n_chars END) AS BIGINT) AS qa,
                 COUNT(CASE WHEN lang = 'de' THEN n_chars END) AS nb,
                 CAST(SUM(CASE WHEN lang = 'de' THEN n_chars END) AS BIGINT) AS sb,
                 CAST(SUM(CASE WHEN lang = 'de' THEN CAST(n_chars AS BIGINT) * n_chars END) AS BIGINT) AS qb
          FROM documents)
        SELECT
          (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
            / sqrt(CAST(na * qa - sa * sa AS DOUBLE) / CAST(na * (na - 1) * na AS DOUBLE)
                 + CAST(nb * qb - sb * sb AS DOUBLE) / CAST(nb * (nb - 1) * nb AS DOUBLE)) AS t_welch,
          (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
            / sqrt((CAST(na * qa - sa * sa AS DOUBLE) / CAST(na AS DOUBLE)
                    + CAST(nb * qb - sb * sb AS DOUBLE) / CAST(nb AS DOUBLE))
                   / CAST(na + nb - 2 AS DOUBLE)
                   * (CAST(na + nb AS DOUBLE) / CAST(na * nb AS DOUBLE))) AS t_pooled
        FROM m
      """.stripMargin.trim)),

    // diversified_sampler: sub-aggs over the de-skewed sample (≤ cap
    // docs per source, deterministically ranked by doc_id — the
    // explicit-fields analog of OpenSearch's per-shard top-scored
    // cap); ONE row_number window hashed on the diversity key.
    GraftQuery(
      "q262_dsl_diversified_sampler",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match_all": {}},
           "aggs": {"sample": {"diversified_sampler": {"field": "source",
               "id_field": "doc_id", "max_docs_per_value": 3},
             "aggs": {"sum_chars": {"sum": {"field": "n_chars"}},
                      "max_id": {"max": {"field": "doc_id"}}}}}}"""),
      Some("""
        WITH r AS (
          SELECT doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents)
        SELECT CAST(COUNT(*) AS BIGINT) AS doc_count,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               MAX(doc_id) AS max_id
        FROM r WHERE rn <= 3
      """.stripMargin.trim)),

    // children agg: the relations model's agg arm — switch from the
    // matching parents to THEIR order children and aggregate there;
    // one semi-join on the id domain + one global aggregate.
    GraftQuery(
      "q263_dsl_children_agg",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val c = Tables.load(s, dir, "customer").select(
          lit("customer").as("rel"), col("c_custkey").as("doc_id"),
          lit(null).cast("long").as("parent_id"),
          lit(null).cast("double").as("price"),
          col("c_acctbal").as("acctbal"))
        val o = Tables.load(s, dir, "orders").select(
          lit("order").as("rel"),
          (lit(10000000L) + col("o_orderkey")).as("doc_id"),
          col("o_custkey").as("parent_id"),
          col("o_totalprice").as("price"),
          lit(null).cast("double").as("acctbal"))
        QueryDsl.search(c.unionByName(o),
          """{"query": {"bool": {"must": [
               {"term": {"rel": "customer"}},
               {"range": {"acctbal": {"gte": 9000}}}]}},
             "aggs": {"kids": {"children": {"type": "order",
                 "join_field": "rel", "id_field": "doc_id",
                 "parent_field": "parent_id"},
               "aggs": {"max_price": {"max": {"field": "price"}},
                        "n": {"value_count": {"field": "price"}}}}}}""")
      },
      Some("""
        WITH p AS (SELECT c_custkey FROM customer WHERE c_acctbal >= 9000)
        SELECT CAST(COUNT(*) AS BIGINT) AS doc_count,
               MAX(o.o_totalprice) AS max_price,
               CAST(COUNT(o.o_totalprice) AS BIGINT) AS n
        FROM orders o JOIN p ON o.o_custkey = p.c_custkey
      """.stripMargin.trim)),

    // parent agg: the inverse switch — from matching order children
    // to their DISTINCT parent customers.
    GraftQuery(
      "q264_dsl_parent_agg",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val c = Tables.load(s, dir, "customer").select(
          lit("customer").as("rel"), col("c_custkey").as("doc_id"),
          lit(null).cast("long").as("parent_id"),
          lit(null).cast("double").as("price"),
          col("c_acctbal").as("acctbal"))
        val o = Tables.load(s, dir, "orders").select(
          lit("order").as("rel"),
          (lit(10000000L) + col("o_orderkey")).as("doc_id"),
          col("o_custkey").as("parent_id"),
          col("o_totalprice").as("price"),
          lit(null).cast("double").as("acctbal"))
        QueryDsl.search(c.unionByName(o),
          """{"query": {"bool": {"must": [
               {"term": {"rel": "order"}},
               {"range": {"price": {"gte": 400000}}}]}},
             "aggs": {"folks": {"parent": {
                 "join_field": "rel", "id_field": "doc_id",
                 "parent_field": "parent_id"},
               "aggs": {"max_bal": {"max": {"field": "acctbal"}},
                        "min_id": {"min": {"field": "doc_id"}}}}}}""")
      },
      Some("""
        WITH k AS (
          SELECT DISTINCT o_custkey AS pid
          FROM orders WHERE o_totalprice >= 400000)
        SELECT CAST(COUNT(*) AS BIGINT) AS doc_count,
               MAX(c.c_acctbal) AS max_bal,
               MIN(c.c_custkey) AS min_id
        FROM customer c JOIN k ON c.c_custkey = k.pid
      """.stripMargin.trim)),

    // geo_distance agg: ring buckets [from, to) km around an origin —
    // the engine's ONE haversine (shared with the geo_distance query
    // and _geo_distance sort) feeding the shared one-pass filtered
    // aggregate; the oracle replays the rounded haversine
    // term-for-term (the q251 recipe).
    GraftQuery(
      "q265_dsl_geo_distance_agg",
      (s, dir) => {
        val pts = GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer"))
        QueryDsl.search(pts,
          """{"query": {"match_all": {}},
             "aggs": {"ring": {"geo_distance": {
                 "lat_field": "lat", "lon_field": "lon",
                 "origin": {"lat": 40.0, "lon": -74.0},
                 "ranges": [{"to": 3000}, {"from": 3000, "to": 8000},
                            {"from": 8000}]},
               "aggs": {"min_key": {"min": {"field": "c_custkey"}},
                        "n_pts": {"value_count": {"field": "c_custkey"}}}}}}""")
      },
      Some("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer),
        d AS (
          SELECT c_custkey,
                 round(CAST(12742.0176 AS DOUBLE) * asin(sqrt(
                   sin((lat - 40.0) * pi() / 180.0 / 2.0) * sin((lat - 40.0) * pi() / 180.0 / 2.0)
                   + cos(40.0 * pi() / 180.0) * cos(lat * pi() / 180.0)
                     * sin((lon + 74.0) * pi() / 180.0 / 2.0) * sin((lon + 74.0) * pi() / 180.0 / 2.0))), 6) AS dist
          FROM pts),
        b AS (
          SELECT 0 AS ord, '*-3000.0' AS ring, COUNT(*) AS doc_count,
                 MIN(c_custkey) AS min_key,
                 CAST(COUNT(c_custkey) AS BIGINT) AS n_pts
          FROM d WHERE dist < 3000
          UNION ALL
          SELECT 1, '3000.0-8000.0', COUNT(*), MIN(c_custkey),
                 CAST(COUNT(c_custkey) AS BIGINT)
          FROM d WHERE dist >= 3000 AND dist < 8000
          UNION ALL
          SELECT 2, '8000.0-*', COUNT(*), MIN(c_custkey),
                 CAST(COUNT(c_custkey) AS BIGINT)
          FROM d WHERE dist >= 8000)
        SELECT ring, doc_count, min_key, n_pts FROM b ORDER BY ord
      """.stripMargin.trim)),

    // moving_fn: the MovingFunctions whitelist compiled to native
    // window aggregates over the day-count series; shift 0 excludes
    // the current bucket (the OpenSearch window model).
    GraftQuery(
      "q266_dsl_moving_fn",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"term": {"event_type": "purchase"}},
           "aggs": {"day": {"date_histogram": {"field": "ts",
               "calendar_interval": "day"},
             "aggs": {"peak": {"moving_fn": {"buckets_path": "_count",
                 "window": 7, "script": "MovingFunctions.max(values)"}},
               "trail_avg": {"moving_fn": {"buckets_path": "_count",
                 "window": 7, "shift": 1,
                 "script": "MovingFunctions.unweightedAvg(values)"}}}}}}"""),
      Some("""
        WITH g AS (
          SELECT date_trunc('day', ts) AS day, COUNT(*) AS doc_count
          FROM events WHERE event_type = 'purchase' GROUP BY 1)
        SELECT day, doc_count,
               MAX(doc_count) OVER (ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS peak,
               CAST(SUM(doc_count) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST(COUNT(doc_count) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail_avg
        FROM g ORDER BY day
      """.stripMargin.trim)),

    // cumulative_cardinality: EXACT distinct-users-seen-so-far per
    // day (OpenSearch serves an HLL approximation — here the exact
    // form is itself oracle-able): first-occurrence bucket per
    // distinct value (one value-domain groupBy), then a running total
    // over the bounded bucket series.
    GraftQuery(
      "q267_dsl_cumulative_cardinality",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"term": {"event_type": "purchase"}},
           "aggs": {"day": {"date_histogram": {"field": "ts",
               "calendar_interval": "day"},
             "aggs": {"total_users": {"cumulative_cardinality": {
               "field": "user_id"}}}}}}"""),
      Some("""
        WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        g AS (
          SELECT date_trunc('day', ts) AS day, COUNT(*) AS doc_count
          FROM p GROUP BY 1),
        fb AS (
          SELECT user_id, MIN(date_trunc('day', ts)) AS day
          FROM p WHERE user_id IS NOT NULL GROUP BY 1),
        pk AS (SELECT day, COUNT(*) AS n FROM fb GROUP BY 1)
        SELECT g.day, g.doc_count,
               CAST(SUM(COALESCE(pk.n, 0)) OVER (ORDER BY g.day) AS BIGINT)
                 AS total_users
        FROM g LEFT JOIN pk ON g.day = pk.day
        ORDER BY g.doc_count DESC, g.day
      """.stripMargin.trim)),

    // variable_width_histogram: the engine's DETERMINISTIC analog of
    // the per-shard clustering approximation — equal-frequency
    // buckets from exact discrete quantile boundaries (actual data
    // values, DuckDB-replayable), centroid key via one IEEE divide.
    GraftQuery(
      "q268_dsl_variable_width_histogram",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "aggs": {"len": {"variable_width_histogram":
               {"field": "n_chars", "buckets": 4},
             "aggs": {"n_docs": {"value_count": {"field": "n_chars"}}}}}}"""),
      Some("""
        WITH d AS (
          SELECT n_chars FROM documents
          WHERE lang = 'en' AND n_chars IS NOT NULL),
        b AS (
          SELECT quantile_disc(n_chars, 0.25) AS b1,
                 quantile_disc(n_chars, 0.5)  AS b2,
                 quantile_disc(n_chars, 0.75) AS b3
          FROM d),
        i AS (
          SELECT n_chars,
                 (CASE WHEN n_chars > b1 THEN 1 ELSE 0 END
                + CASE WHEN n_chars > b2 THEN 1 ELSE 0 END
                + CASE WHEN n_chars > b3 THEN 1 ELSE 0 END) AS idx
          FROM d CROSS JOIN b)
        SELECT CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(n_chars) AS DOUBLE) AS len,
               MIN(n_chars) AS len_min, MAX(n_chars) AS len_max,
               CAST(COUNT(*) AS BIGINT) AS doc_count,
               CAST(COUNT(n_chars) AS BIGINT) AS n_docs
        FROM i GROUP BY idx ORDER BY len_min
      """.stripMargin.trim)),

    // extended_stats_bucket: the exact-moment recipe over the
    // day-count bucket series — one sibling row, n·Σx²−(Σx)² exact.
    GraftQuery(
      "q269_dsl_extended_stats_bucket",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"match_all": {}},
           "aggs": {"day": {"date_histogram": {"field": "ts",
               "calendar_interval": "day"}},
             "st": {"extended_stats_bucket": {
               "buckets_path": "day>_count"}}}}"""),
      Some("""
        WITH g AS (
          SELECT date_trunc('day', ts) AS day, COUNT(*) AS c
          FROM events GROUP BY 1)
        SELECT CAST(COUNT(c) AS BIGINT) AS st_count,
               MIN(c) AS st_min, MAX(c) AS st_max,
               CAST(SUM(c) AS DOUBLE) / CAST(COUNT(c) AS DOUBLE) AS st_avg,
               CAST(SUM(c) AS BIGINT) AS st_sum,
               CAST(SUM(c * c) AS BIGINT) AS st_sum_of_squares,
               CAST(COUNT(c) * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE)
                 / CAST(COUNT(c) * COUNT(c) AS DOUBLE) AS st_variance,
               sqrt(CAST(COUNT(c) * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE)
                 / CAST(COUNT(c) * COUNT(c) AS DOUBLE)) AS st_std_deviation
        FROM g
      """.stripMargin.trim)),

    // terms min_doc_count: the bucket floor applied before order/size
    // — a bucket-table filter, the one-shuffle groupBy unchanged.
    GraftQuery(
      "q270_dsl_terms_min_doc_count",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match_all": {}},
           "aggs": {"langs": {"terms": {"field": "lang",
               "min_doc_count": 30},
             "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}}}"""),
      Some("""
        SELECT lang AS langs, CAST(COUNT(*) AS BIGINT) AS doc_count,
               CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(n_chars) AS DOUBLE)
                 AS avg_chars
        FROM documents GROUP BY 1 HAVING COUNT(*) >= 30
        ORDER BY doc_count DESC, langs
      """.stripMargin.trim)),

    // runtime_mappings: a request-level computed field (the SAME
    // exact-integer script compiler as script_score) laid onto the
    // table ONCE, then queried, sorted and projected like a stored
    // column — the runtime-fields idiom with zero row-time
    // interpretation.
    GraftQuery(
      "q271_dsl_runtime_mappings",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"runtime_mappings": {"weight": {"type": "long",
             "script": {"source": "doc['n_chars'].value * 3 + params.base",
               "params": {"base": 7}}}},
           "query": {"range": {"weight": {"gte": 1000}}},
           "sort": [{"weight": "desc"}, "doc_id"], "size": 40,
           "_source": ["doc_id", "weight"]}"""),
      Some("""
        WITH w AS (
          SELECT doc_id, n_chars * 3 + 7 AS weight FROM documents)
        SELECT doc_id, weight FROM w WHERE weight >= 1000
        ORDER BY weight DESC, doc_id LIMIT 40
      """.stripMargin.trim)),

    // rate agg: per-unit normalization of bucket aggregates — the
    // denominator is the bucket's OWN calendar span (a 31-day January
    // divides by 31), numerator stays the exact integer sum/count,
    // one pinned cast-mul-divide IEEE sequence both engines replay.
    GraftQuery(
      "q272_dsl_rate",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "orders"),
        """{"query": {"match_all": {}},
           "aggs": {"mon": {"date_histogram": {"field": "o_orderdate",
               "calendar_interval": "month"},
             "aggs": {"orders_daily": {"rate": {"unit": "day"}},
               "custs_daily": {"rate": {"field": "o_custkey",
                 "mode": "value_count", "unit": "day"}},
               "sum_cust_daily": {"rate": {"field": "o_custkey",
                 "unit": "day"}}}}}}"""),
      Some("""
        WITH g AS (
          SELECT date_trunc('month', o_orderdate) AS mon,
                 CAST(COUNT(*) AS BIGINT) AS doc_count,
                 CAST(COUNT(o_custkey) AS BIGINT) AS cu,
                 CAST(SUM(o_custkey) AS BIGINT) AS su
          FROM orders GROUP BY 1),
        d AS (
          SELECT *, CAST(date_diff('day', CAST(mon AS DATE),
                   CAST(mon + INTERVAL 1 MONTH AS DATE))
                 * 86400000000 AS DOUBLE) AS span_us
          FROM g)
        SELECT mon, doc_count,
               CAST(doc_count AS DOUBLE) * 86400000000.0 / span_us
                 AS orders_daily,
               CAST(cu AS DOUBLE) * 86400000000.0 / span_us AS custs_daily,
               CAST(su AS DOUBLE) * 86400000000.0 / span_us
                 AS sum_cust_daily
        FROM d ORDER BY doc_count DESC, mon
      """.stripMargin.trim)),

    // sort missing/mode options: a multi-valued field sorts by an
    // exact aggregate of its values (here the exact lower median of
    // per-token lengths), NULL keys are PLACED explicitly (_first) —
    // both pure codegen'd array expressions on the sort key.
    GraftQuery(
      "q273_dsl_sort_options",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents")
          .withColumn("tok_lens", org.apache.spark.sql.functions.expr(
            "transform(split(text, ' '), x -> CAST(length(x) AS LONG))"))
          .withColumn("lang2", org.apache.spark.sql.functions.expr(
            "nullif(lang, 'en')")),
        """{"query": {"match_all": {}},
           "sort": [{"tok_lens": {"mode": "median", "order": "desc"}},
                    {"lang2": {"missing": "_first"}}, "doc_id"],
           "size": 30, "_source": ["doc_id", "lang2"]}"""),
      Some("""
        WITH d AS (
          SELECT doc_id, nullif(lang, 'en') AS lang2,
                 list_transform(string_split(text, ' '),
                                x -> length(x)) AS tl
          FROM documents),
        m AS (
          SELECT doc_id, lang2,
                 list_sort(tl)[(len(tl) + 1) // 2] AS med
          FROM d)
        SELECT doc_id, lang2 FROM m
        ORDER BY med DESC, lang2 ASC NULLS FIRST, doc_id LIMIT 30
      """.stripMargin.trim)),

    // rescore: second-pass re-ranking of the top window — window
    // membership is a deterministic global top-k on (score desc, id),
    // window docs matching the rescore query combine weighted scores,
    // the rest keep their original score untouched.
    GraftQuery(
      "q274_dsl_rescore",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match": {"text": "spark join window"}},
           "rescore": {"window_size": 20, "id_field": "doc_id",
             "query": {"rescore_query": {"term": {"lang": "en"}},
               "query_weight": 1, "rescore_query_weight": 5,
               "score_mode": "total"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 15, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH scored AS (
          SELECT doc_id, lang,
                 CAST(len(list_intersect(
                   list_distinct(string_split(text, ' ')),
                   ['spark','join','window'])) AS BIGINT) AS score
          FROM documents),
        hits AS (SELECT * FROM scored WHERE score >= 1),
        w AS (SELECT *, ROW_NUMBER()
                OVER (ORDER BY score DESC, doc_id) AS rk FROM hits),
        r AS (
          SELECT doc_id,
                 CASE WHEN rk <= 20 THEN
                   CASE WHEN lang = 'en' THEN 1 * score + 5 * 1
                        ELSE 1 * score END
                 ELSE score END AS score
          FROM w)
        SELECT doc_id, CAST(score AS BIGINT) AS score FROM r
        ORDER BY score DESC, doc_id LIMIT 15
      """.stripMargin.trim)),

    // span_or: postings union of the member terms — one posexplode,
    // one isin filter, one groupBy.
    GraftQuery(
      "q275_dsl_span_or",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"span_or": {"clauses": [
             {"span_term": {"text": "spark"}},
             {"span_term": {"text": "window"}}],
             "id_field": "doc_id"}},
           "sort": [{"_score": "desc"}, "doc_id"], "size": 25}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a
                     FROM documents),
        pos AS (SELECT doc_id, unnest(a) AS tok,
                       unnest(range(1, len(a) + 1)) AS p FROM arr),
        g AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
              FROM pos WHERE tok IN ('spark', 'window') GROUP BY 1)
        SELECT doc_id, n_spans, n_spans AS score FROM g
        ORDER BY score DESC, doc_id LIMIT 25
      """.stripMargin.trim)),

    // span_not: include occurrences with no exclude occurrence within
    // +-dist tokens — the negative-context span.
    GraftQuery(
      "q276_dsl_span_not",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"span_not": {
             "include": {"span_term": {"text": "spark"}},
             "exclude": {"span_term": {"text": "join"}},
             "dist": 2, "id_field": "doc_id"}},
           "sort": [{"_score": "desc"}, "doc_id"], "size": 25}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a
                     FROM documents),
        pos AS (SELECT doc_id, unnest(a) AS tok,
                       unnest(range(1, len(a) + 1)) AS p FROM arr),
        pi AS (SELECT doc_id, p FROM pos WHERE tok = 'spark'),
        pe AS (SELECT doc_id, p AS pe FROM pos WHERE tok = 'join'),
        j AS (SELECT pi.doc_id, pi.p,
                MAX(CASE WHEN pe.pe IS NOT NULL
                      AND pe.pe >= pi.p - 2 AND pe.pe <= pi.p + 2
                    THEN 1 ELSE 0 END) AS viol
              FROM pi LEFT JOIN pe ON pi.doc_id = pe.doc_id
              GROUP BY 1, 2),
        g AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
              FROM j WHERE viol = 0 GROUP BY 1)
        SELECT doc_id, n_spans, n_spans AS score FROM g
        ORDER BY score DESC, doc_id LIMIT 25
      """.stripMargin.trim)),

    // span_containing: big span_near pairs that enclose a little
    // occurrence (deduplicated per big span).
    GraftQuery(
      "q277_dsl_span_containing",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"span_containing": {
             "big": {"span_near": {"clauses": [
               {"span_term": {"text": "spark"}},
               {"span_term": {"text": "window"}}], "slop": 5}},
             "little": {"span_term": {"text": "join"}},
             "id_field": "doc_id"}},
           "sort": [{"_score": "desc"}, "doc_id"], "size": 25}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a
                     FROM documents),
        pos AS (SELECT doc_id, unnest(a) AS tok,
                       unnest(range(1, len(a) + 1)) AS p FROM arr),
        p1 AS (SELECT doc_id, p AS p1 FROM pos WHERE tok = 'spark'),
        p2 AS (SELECT doc_id, p AS p2 FROM pos WHERE tok = 'window'),
        pr AS (SELECT p1.doc_id, least(p1, p2) AS s, greatest(p1, p2) AS e
               FROM p1 JOIN p2 USING (doc_id)
               WHERE abs(p1 - p2) - 1 <= 5),
        pl AS (SELECT doc_id, p AS pl FROM pos WHERE tok = 'join'),
        enc AS (SELECT DISTINCT pr.doc_id, pr.s, pr.e
                FROM pr JOIN pl ON pr.doc_id = pl.doc_id
                  AND pl.pl >= pr.s AND pl.pl <= pr.e),
        g AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
              FROM enc GROUP BY 1)
        SELECT doc_id, n_spans, n_spans AS score FROM g
        ORDER BY score DESC, doc_id LIMIT 25
      """.stripMargin.trim)),

    // span_within: little occurrences enclosed by a big span
    // (deduplicated per little position) — the containing twin from
    // the little side.
    GraftQuery(
      "q278_dsl_span_within",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"span_within": {
             "big": {"span_near": {"clauses": [
               {"span_term": {"text": "spark"}},
               {"span_term": {"text": "window"}}], "slop": 5}},
             "little": {"span_term": {"text": "join"}},
             "id_field": "doc_id"}},
           "sort": [{"_score": "desc"}, "doc_id"], "size": 25}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a
                     FROM documents),
        pos AS (SELECT doc_id, unnest(a) AS tok,
                       unnest(range(1, len(a) + 1)) AS p FROM arr),
        p1 AS (SELECT doc_id, p AS p1 FROM pos WHERE tok = 'spark'),
        p2 AS (SELECT doc_id, p AS p2 FROM pos WHERE tok = 'window'),
        pr AS (SELECT p1.doc_id, least(p1, p2) AS s, greatest(p1, p2) AS e
               FROM p1 JOIN p2 USING (doc_id)
               WHERE abs(p1 - p2) - 1 <= 5),
        pl AS (SELECT doc_id, p AS pl FROM pos WHERE tok = 'join'),
        enc AS (SELECT DISTINCT pl.doc_id, pl.pl
                FROM pr JOIN pl ON pr.doc_id = pl.doc_id
                  AND pl.pl >= pr.s AND pl.pl <= pr.e),
        g AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
              FROM enc GROUP BY 1)
        SELECT doc_id, n_spans, n_spans AS score FROM g
        ORDER BY score DESC, doc_id LIMIT 25
      """.stripMargin.trim)),

    // significant_terms background_filter: the lift baseline becomes a
    // SUBSET of the index (here: English docs) — foreground intersects
    // the background (fg ⊆ bg by construction, so the exact ppm ratio
    // can never divide by zero), out-of-background vocabulary drops;
    // both counts stay conditional aggregates in ONE groupBy.
    GraftQuery(
      "q280_dsl_sig_terms_background",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match": {"text": "spark"}},
           "aggs": {"sig_src": {"significant_terms":
             {"field": "source", "min_doc_count": 2, "size": 8,
              "background_filter": {"term": {"lang": "en"}}}}}}"""),
      Some("""
        WITH base AS (
          SELECT source,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS bg,
                 CASE WHEN lang = 'en' AND list_contains(
                        list_distinct(string_split(text, ' ')), 'spark')
                      THEN 1 ELSE 0 END AS fg
          FROM documents),
        per AS (
          SELECT source AS sig_src, CAST(SUM(bg) AS BIGINT) AS bg_count,
                 CAST(SUM(fg) AS BIGINT) AS doc_count
          FROM base GROUP BY source),
        tot AS (SELECT CAST(SUM(bg) AS BIGINT) AS n_all,
                       CAST(SUM(fg) AS BIGINT) AS n_fg FROM base)
        SELECT sig_src, doc_count, bg_count,
               (doc_count * n_all * 1000000) // (bg_count * n_fg) AS score_ppm
        FROM per, tot
        WHERE bg_count >= 1 AND doc_count >= 2
        ORDER BY score_ppm DESC, sig_src
        LIMIT 8
      """.stripMargin.trim)),

    // multi_match cross_fields: term-centric blended-field matching —
    // a query term matches when ANY field carries it; score = matched
    // terms over the token union, msm gates the count.
    GraftQuery(
      "q281_dsl_multi_match_cross_fields",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"multi_match": {"query": "spark src7",
             "fields": ["text", "source"], "type": "cross_fields",
             "minimum_should_match": 2}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH s AS (
          SELECT doc_id,
                 CAST(len(list_intersect(
                   list_distinct(list_concat(string_split(text, ' '),
                                             string_split(source, ' '))),
                   ['spark', 'src7'])) AS BIGINT) AS score
          FROM documents)
        SELECT doc_id, score FROM s WHERE score >= 2
        ORDER BY score DESC, doc_id LIMIT 30
      """.stripMargin.trim)),

    // multi_match phrase: the query as a token-boundary phrase per
    // field; score = the number of fields containing it.
    GraftQuery(
      "q282_dsl_multi_match_phrase",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents")
          .withColumn("head", org.apache.spark.sql.functions.expr(
            "array_join(slice(split(text, ' '), 1, 12), ' ')")),
        """{"query": {"multi_match": {"query": "spark join",
             "fields": ["text", "head"], "type": "phrase"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH d AS (
          SELECT doc_id, text,
                 array_to_string(list_slice(string_split(text, ' '), 1, 12),
                                 ' ') AS head
          FROM documents),
        s AS (
          SELECT doc_id,
                 CAST(CASE WHEN ' ' || text || ' ' LIKE '% spark join %'
                      THEN 1 ELSE 0 END
                    + CASE WHEN ' ' || head || ' ' LIKE '% spark join %'
                      THEN 1 ELSE 0 END AS BIGINT) AS score
          FROM d)
        SELECT doc_id, score FROM s WHERE score >= 1
        ORDER BY score DESC, doc_id LIMIT 30
      """.stripMargin.trim)),

    // _analyze endpoint: the token stream the matching surfaces
    // actually see, through the SAME Analyzer.norm column expression —
    // here the standard analyzer over a corpus document's text, so
    // the DuckDB replay cross-checks the analyzer+tokenizer contract
    // end-to-end.
    GraftQuery(
      "q283_dsl_analyze_endpoint",
      (s, dir) => {
        val txt = Tables.load(s, dir, "documents")
          .filter(org.apache.spark.sql.functions.col("doc_id") === 7L)
          .select("text").head().getString(0)
        QueryDsl.analyzeText(s, graft.search.Analyzer.Standard, txt)
      },
      Some("""
        WITH d AS (
          SELECT trim(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g')))
                   AS t
          FROM documents WHERE doc_id = 7),
        arr AS (SELECT string_split(t, ' ') AS a FROM d)
        SELECT unnest(a) AS token,
               CAST(unnest(range(0, len(a))) AS BIGINT) AS position
        FROM arr ORDER BY position
      """.stripMargin.trim)),

    // date_histogram offset: bucket boundaries shift by +6h (the
    // fiscal-day knob — days run 06:00 to 06:00); the algebra folds
    // into the same shifted-truncate expression time_zone uses.
    GraftQuery(
      "q284_dsl_date_histogram_offset",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"match_all": {}},
           "aggs": {"d": {"date_histogram": {"field": "ts",
               "fixed_interval": "1d", "offset": "+6h"},
             "aggs": {"n_uid": {"value_count": {"field": "user_id"}}}}}}"""),
      Some("""
        WITH g AS (
          SELECT make_timestamp(um2 - ((um2 % 86400000000)
                   + 86400000000) % 86400000000 + 21600000000) AS d,
                 CAST(COUNT(*) AS BIGINT) AS doc_count,
                 CAST(COUNT(user_id) AS BIGINT) AS n_uid
          FROM (SELECT epoch_us(ts) - 21600000000 AS um2, user_id
                FROM events)
          GROUP BY 1)
        SELECT d, doc_count, n_uid FROM g
        ORDER BY doc_count DESC, d
      """.stripMargin.trim)),

    // derivative unit: the per-unit normalized series — the diff
    // divided by the ACTUAL microsecond gap to the previous bucket,
    // so unequal calendar months normalize exactly.
    GraftQuery(
      "q285_dsl_derivative_unit",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "orders"),
        """{"query": {"match_all": {}},
           "aggs": {"mon": {"date_histogram": {"field": "o_orderdate",
               "calendar_interval": "month"},
             "aggs": {"d": {"derivative": {"buckets_path": "_count",
               "unit": "day"}}}}}}"""),
      Some("""
        WITH g AS (
          SELECT date_trunc('month', o_orderdate) AS mon,
                 CAST(COUNT(*) AS BIGINT) AS doc_count
          FROM orders GROUP BY 1),
        w AS (
          SELECT mon, doc_count,
                 doc_count - lag(doc_count) OVER (ORDER BY mon) AS d,
                 epoch_us(mon) - lag(epoch_us(mon)) OVER (ORDER BY mon)
                   AS gap_us
          FROM g)
        SELECT mon, doc_count, d,
               CAST(d AS DOUBLE) * 86400000000.0 / CAST(gap_us AS DOUBLE)
                 AS d_normalized
        FROM w ORDER BY mon
      """.stripMargin.trim)),

    // terms order array form: lexicographic multi-criteria bucket
    // ordering (sub-metric, then _key desc) — the OpenSearch
    // tie-break spelling, still one groupBy + a bounded bucket sort.
    GraftQuery(
      "q286_dsl_terms_order_array",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match_all": {}},
           "aggs": {"srcs": {"terms": {"field": "source",
               "order": [{"mx": "desc"}, {"_key": "desc"}]},
             "aggs": {"mx": {"max": {"field": "n_chars"}}}}}}"""),
      Some("""
        SELECT source AS srcs, CAST(COUNT(*) AS BIGINT) AS doc_count,
               MAX(n_chars) AS mx
        FROM documents GROUP BY 1
        ORDER BY mx DESC, srcs DESC
      """.stripMargin.trim)),

    // auto_date_histogram minimum_interval: the rounding-hint floor —
    // the 30-day events span would derive day; the floor forces month.
    GraftQuery(
      "q287_dsl_auto_date_min_interval",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"match_all": {}},
           "aggs": {"a": {"auto_date_histogram": {"field": "ts",
             "buckets": 100, "minimum_interval": "month"}}}}"""),
      Some("""
        SELECT date_trunc('month', ts) AS a,
               CAST(COUNT(*) AS BIGINT) AS doc_count,
               'month' AS interval
        FROM events WHERE ts IS NOT NULL GROUP BY 1 ORDER BY a
      """.stripMargin.trim)),

    // nested agg + terms sub-agg: the facet over array elements (top
    // tags / top tokens — the multi-valued-field idiom): one explode +
    // one groupBy on a struct member, metrics riding the same groupBy.
    GraftQuery(
      "q288_dsl_nested_terms_facet",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents")
          .withColumn("tk", org.apache.spark.sql.functions.expr(
            "transform(split(text, ' '), x -> " +
              "struct(x AS tok, CAST(length(x) AS LONG) AS len))")),
        """{"query": {"range": {"n_chars": {"gte": 200}}},
           "aggs": {"nt": {"nested": {"path": "tk"},
             "aggs": {"top_toks": {"terms": {"field": "tk.tok",
                 "size": 12}},
               "sum_len": {"sum": {"field": "tk.len"}}}}}}"""),
      Some("""
        WITH e AS (
          SELECT unnest(list_transform(string_split(text, ' '),
                   x -> {'tok': x, 'len': length(x)})) AS tk
          FROM documents WHERE n_chars >= 200)
        SELECT tk.tok AS top_toks, CAST(COUNT(*) AS BIGINT) AS doc_count,
               CAST(SUM(tk.len) AS BIGINT) AS sum_len
        FROM e GROUP BY 1
        ORDER BY doc_count DESC, top_toks LIMIT 12
      """.stripMargin.trim)),

    // significant_text background_filter: the token-level narrowed
    // baseline (what's significant about spark docs AMONG the English
    // corpus) — same fg ⊆ bg contract as q280, one token pass.
    GraftQuery(
      "q289_dsl_sig_text_background",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match": {"text": "spark"}},
           "aggs": {"sig": {"significant_text": {"field": "text",
               "min_doc_count": 5, "size": 12,
               "background_filter": {"term": {"lang": "en"}}}}}}"""),
      Some("""
        WITH d AS (
          SELECT *, (lang = 'en') AS bg,
                 (lang = 'en' AND list_contains(
                    list_distinct(string_split(text, ' ')), 'spark')) AS fg
          FROM documents),
        toks AS (SELECT fg, bg,
                   unnest(list_distinct(string_split(text, ' '))) AS sig
                 FROM d),
        per AS (
          SELECT sig,
                 CAST(COUNT(CASE WHEN bg THEN 1 END) AS BIGINT) AS bg_count,
                 CAST(COUNT(CASE WHEN fg AND bg THEN 1 END) AS BIGINT)
                   AS doc_count
          FROM toks GROUP BY 1),
        t AS (SELECT CAST(COUNT(CASE WHEN bg THEN 1 END) AS BIGINT) AS n_all,
                     CAST(COUNT(CASE WHEN fg AND bg THEN 1 END) AS BIGINT)
                       AS n_fg
              FROM d)
        SELECT sig, doc_count, bg_count,
               (doc_count * n_all * 1000000) // (bg_count * n_fg) AS score_ppm
        FROM per, t
        WHERE bg_count >= 1 AND doc_count >= 5
        ORDER BY score_ppm DESC, sig
        LIMIT 12
      """.stripMargin.trim)),

    // script query: a scripted filter predicate compiled to codegen'd
    // Catalyst arithmetic (the anti-UDF rule on the filter surface) —
    // one comparator over two exact-integer ScoreScript sides.
    GraftQuery(
      "q290_dsl_script_query",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {
             "must": [{"match": {"text": "spark"}}],
             "filter": [{"script": {"script":
               {"source": "doc['n_chars'].value * 3 + params.k >= 700",
                "params": {"k": 10}}}}]}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30, "_source": ["doc_id", "n_chars", "score"]}"""),
      Some("""
        WITH scored AS (
          SELECT doc_id, n_chars,
                 CAST(CASE WHEN list_contains(
                   list_distinct(string_split(text, ' ')), 'spark')
                   THEN 1 ELSE 0 END AS BIGINT) AS score
          FROM documents
          WHERE n_chars * 3 + 10 >= 700)
        SELECT doc_id, n_chars, score FROM scored WHERE score >= 1
        ORDER BY score DESC, doc_id LIMIT 30
      """.stripMargin.trim)),

    // match_phrase slop: the sloppy phrase as a row-local clause —
    // ordered occurrence within the gap budget via nested exists over
    // per-term position arrays (one tokenization per row).
    GraftQuery(
      "q291_dsl_match_phrase_slop",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match_phrase": {"text":
             {"query": "spark join", "slop": 2}}},
           "sort": ["doc_id"], "size": 40, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a
                     FROM documents),
        p AS (SELECT doc_id,
                list_filter(range(1, len(a) + 1), i -> a[i] = 'spark') AS p1,
                list_filter(range(1, len(a) + 1), i -> a[i] = 'join') AS p2
              FROM arr),
        hits AS (
          SELECT doc_id FROM p
          WHERE len(list_filter(p1, x ->
            len(list_filter(p2, y -> y > x AND y - x - 1 <= 2)) > 0)) > 0)
        SELECT doc_id, CAST(1 AS BIGINT) AS score FROM hits
        ORDER BY doc_id LIMIT 40
      """.stripMargin.trim)),

    // post_filter: the faceting idiom — hits filtered AFTER scoring,
    // relevance untouched; plus match_none as a bool leaf (the empty
    // complement scores 0 and never fires inside should).
    GraftQuery(
      "q292_dsl_post_filter",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {
             "should": [{"match": {"text": "spark"}}, {"match_none": {}}],
             "minimum_should_match": 1}},
           "post_filter": {"range": {"n_chars": {"lt": 700}}},
           "track_total_hits": true,
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30, "_source": ["doc_id", "n_chars", "score"]}"""),
      Some("""
        WITH scored AS (
          SELECT doc_id, n_chars,
                 CAST(CASE WHEN list_contains(
                   list_distinct(string_split(text, ' ')), 'spark')
                   THEN 1 ELSE 0 END AS BIGINT) AS score
          FROM documents)
        SELECT doc_id, n_chars, score FROM scored
        WHERE score >= 1 AND n_chars < 700
        ORDER BY score DESC, doc_id LIMIT 30
      """.stripMargin.trim)),

    // field_value_factor: the boost-by-popularity function — score =
    // query score × factor × floor(sqrt(field)), exact integers both
    // engines (IEEE sqrt is correctly rounded, floor is exact).
    GraftQuery(
      "q293_dsl_field_value_factor",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"function_score": {
             "query": {"match": {"text": "spark"}},
             "functions": [{"field_value_factor":
               {"field": "n_chars", "factor": 2, "modifier": "sqrt"}}],
             "boost_mode": "multiply"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30, "_source": ["doc_id", "score"]}"""),
      Some("""
        SELECT doc_id,
               2 * CAST(floor(sqrt(n_chars)) AS BIGINT) AS score
        FROM documents
        WHERE list_contains(list_distinct(string_split(text, ' ')), 'spark')
        ORDER BY score DESC, doc_id LIMIT 30
      """.stripMargin.trim)),

    // random_score: seeded deterministic jitter — the md5 ppm draw of
    // the q82 hash-threshold recipe, replayed bit-identically.
    GraftQuery(
      "q294_dsl_random_score",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"function_score": {
             "query": {"match": {"text": "spark"}},
             "functions": [{"random_score": {"seed": 42, "field": "doc_id"}}],
             "boost_mode": "replace"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 25, "_source": ["doc_id", "score"]}"""),
      Some("""
        SELECT doc_id,
               ('0x' || substr(md5('random_score:42:' ||
                 CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS score
        FROM documents
        WHERE list_contains(list_distinct(string_split(text, ' ')), 'spark')
        ORDER BY score DESC, doc_id LIMIT 25
      """.stripMargin.trim)),

    // linear decay: exact rational decay ranking — sigma fixed on the
    // driver (300·10⁶ div 750000 = 400), one integer div per row.
    GraftQuery(
      "q295_dsl_linear_decay",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"function_score": {
             "query": {"match": {"text": "spark"}},
             "functions": [{"linear": {"n_chars":
               {"origin": 500, "scale": 300, "offset": 50, "decay": 0.25}}}],
             "boost_mode": "replace"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30, "_source": ["doc_id", "score"]}"""),
      Some("""
        SELECT doc_id,
               GREATEST(0, 1000000 -
                 (GREATEST(ABS(n_chars - 500) - 50, 0) * 1000000) // 400)
                 AS score
        FROM documents
        WHERE list_contains(list_distinct(string_split(text, ' ')), 'spark')
        ORDER BY score DESC, doc_id LIMIT 30
      """.stripMargin.trim)),

    // reverse_nested: the jump back to the parent document level —
    // per token bucket, how many PARENT docs contribute (vs doc_count
    // counting elements). The parent identity rides the explode and is
    // only ever counted distinct.
    GraftQuery(
      "q296_dsl_reverse_nested",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents")
          .withColumn("tk", org.apache.spark.sql.functions.expr(
            "transform(split(text, ' '), x -> struct(x AS tok))")),
        """{"query": {"range": {"n_chars": {"gte": 200}}},
           "aggs": {"nt": {"nested": {"path": "tk"},
             "aggs": {"top_toks": {"terms": {"field": "tk.tok", "size": 12}},
                      "docs": {"reverse_nested": {}}}}}}"""),
      Some("""
        WITH e AS (
          SELECT doc_id, unnest(list_transform(string_split(text, ' '),
                   x -> {'tok': x})) AS tk
          FROM documents WHERE n_chars >= 200)
        SELECT tk.tok AS top_toks, CAST(COUNT(*) AS BIGINT) AS doc_count,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs
        FROM e GROUP BY 1
        ORDER BY doc_count DESC, top_toks LIMIT 12
      """.stripMargin.trim)),

    // explain flag: per-hit score decomposition inline on the hit
    // table — part_* columns sum to score by construction, replayed
    // column-for-column.
    GraftQuery(
      "q297_dsl_explain_flag",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {
             "must": [{"match": {"text": "spark"}},
                      {"range": {"n_chars": {"gte": 100}}}],
             "should": [{"term": {"lang": "en"}}]}},
           "explain": true,
           "sort": ["doc_id"], "size": 40,
           "_source": ["doc_id", "score",
                       "part_must_0", "part_must_1", "part_should_0"]}"""),
      Some("""
        WITH h AS (
          SELECT doc_id,
                 CAST(1 AS BIGINT) AS part_must_0,
                 CAST(1 AS BIGINT) AS part_must_1,
                 CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
                   AS part_should_0
          FROM documents
          WHERE list_contains(list_distinct(string_split(text, ' ')), 'spark')
            AND n_chars >= 100)
        SELECT doc_id,
               part_must_0 + part_must_1 + part_should_0 AS score,
               part_must_0, part_must_1, part_should_0
        FROM h ORDER BY doc_id LIMIT 40
      """.stripMargin.trim)),

    // docvalue_fields / fields: extra typed output columns alongside
    // the _source projection — the column-union analog of the
    // response's fields section.
    GraftQuery(
      "q298_dsl_docvalue_fields",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match": {"text": "spark"}},
           "docvalue_fields": ["n_chars", {"field": "lang"}],
           "sort": ["doc_id"], "size": 40,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        SELECT doc_id, CAST(1 AS BIGINT) AS score, n_chars, lang
        FROM documents
        WHERE list_contains(list_distinct(string_split(text, ' ')), 'spark')
        ORDER BY doc_id LIMIT 40
      """.stripMargin.trim)),

    // multi_match phrase_prefix: the multi-field search-box
    // autocomplete — in-order containment with no trailing boundary
    // (last term a prefix), score = fields carrying the prefix-phrase.
    GraftQuery(
      "q299_dsl_multi_match_phrase_prefix",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents")
          .withColumn("head", org.apache.spark.sql.functions.expr(
            "array_join(slice(split(text, ' '), 1, 12), ' ')")),
        """{"query": {"multi_match": {"query": "spark jo",
             "fields": ["text", "head"], "type": "phrase_prefix"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH d AS (
          SELECT doc_id, text,
                 array_to_string(list_slice(string_split(text, ' '), 1, 12),
                                 ' ') AS head
          FROM documents),
        s AS (
          SELECT doc_id,
                 CAST(CASE WHEN ' ' || text || ' ' LIKE '% spark jo%'
                      THEN 1 ELSE 0 END
                    + CASE WHEN ' ' || head || ' ' LIKE '% spark jo%'
                      THEN 1 ELSE 0 END AS BIGINT) AS score
          FROM d)
        SELECT doc_id, score FROM s WHERE score >= 1
        ORDER BY score DESC, doc_id LIMIT 30
      """.stripMargin.trim)),

    // multi_match bool_prefix: multi-field type-ahead — per field the
    // match_bool_prefix bag (full terms + last-token prefix), best
    // field wins.
    GraftQuery(
      "q300_dsl_multi_match_bool_prefix",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents")
          .withColumn("head", org.apache.spark.sql.functions.expr(
            "array_join(slice(split(text, ' '), 1, 12), ' ')")),
        """{"query": {"multi_match": {"query": "join sp",
             "fields": ["text", "head"], "type": "bool_prefix"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS tt,
                 list_slice(string_split(text, ' '), 1, 12) AS hh
          FROM documents),
        s AS (
          SELECT doc_id, GREATEST(
            CAST(CASE WHEN list_contains(list_distinct(tt), 'join')
                 THEN 1 ELSE 0 END +
                 CASE WHEN len(list_filter(tt, t -> t LIKE 'sp%')) > 0
                 THEN 1 ELSE 0 END AS BIGINT),
            CAST(CASE WHEN list_contains(list_distinct(hh), 'join')
                 THEN 1 ELSE 0 END +
                 CASE WHEN len(list_filter(hh, t -> t LIKE 'sp%')) > 0
                 THEN 1 ELSE 0 END AS BIGINT)) AS score
          FROM d)
        SELECT doc_id, score FROM s WHERE score >= 1
        ORDER BY score DESC, doc_id LIMIT 30
      """.stripMargin.trim)),

    // parent_id: the third relations-model member — all children of
    // ONE parent, as a plain per-row predicate (no join), composing
    // inside bool like any clause.
    GraftQuery(
      "q301_dsl_parent_id",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val c = Tables.load(s, dir, "customer").select(
          lit("customer").as("rel"), col("c_custkey").as("doc_id"),
          lit(null).cast("long").as("parent_id"),
          lit(null).cast("double").as("price"))
        val o = Tables.load(s, dir, "orders").select(
          lit("order").as("rel"),
          (lit(10000000L) + col("o_orderkey")).as("doc_id"),
          col("o_custkey").as("parent_id"),
          col("o_totalprice").as("price"))
        QueryDsl.search(c.unionByName(o),
          """{"query": {"bool": {
               "filter": [{"parent_id": {"type": "order", "id": 19,
                 "join_field": "rel", "parent_field": "parent_id"}}],
               "must": [{"range": {"price": {"gte": 100000}}}]}},
             "sort": ["doc_id"], "size": 50,
             "_source": ["doc_id", "price", "score"]}""")
      },
      Some("""
        SELECT CAST(10000000 + o_orderkey AS BIGINT) AS doc_id,
               o_totalprice AS price,
               CAST(1 AS BIGINT) AS score
        FROM orders
        WHERE o_custkey = 19 AND o_totalprice >= 100000
        ORDER BY doc_id LIMIT 50
      """.stripMargin.trim)),

    // match boost: the everyday relevance knob — integer score
    // scaling that never changes the match bar.
    GraftQuery(
      "q302_dsl_match_boost",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {"should": [
             {"match": {"text": {"query": "spark", "boost": 2}}},
             {"match": {"text": "join"}}],
             "minimum_should_match": 1}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 40, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH s AS (
          SELECT doc_id,
                 CAST(2 * CASE WHEN list_contains(
                        list_distinct(string_split(text, ' ')), 'spark')
                      THEN 1 ELSE 0 END
                    + CASE WHEN list_contains(
                        list_distinct(string_split(text, ' ')), 'join')
                      THEN 1 ELSE 0 END AS BIGINT) AS score,
                 CASE WHEN list_contains(
                        list_distinct(string_split(text, ' ')), 'spark')
                   OR list_contains(
                        list_distinct(string_split(text, ' ')), 'join')
                 THEN 1 ELSE 0 END AS hit
          FROM documents)
        SELECT doc_id, score FROM s WHERE hit = 1
        ORDER BY score DESC, doc_id LIMIT 40
      """.stripMargin.trim)),

    // span_multi inside span_near — a PREFIX postings filter paired
    // with an exact term: the multi-term span contract (the wrapped
    // query is NOT analyzed; the postings predicate generalizes
    // token equality). Ordered, slop 2.
    GraftQuery(
      "q303_dsl_span_multi_near",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"span_near": {"clauses": [
             {"span_multi": {"match": {"prefix": {"text": {"value": "s"}}}}},
             {"span_term": {"text": "join"}}],
             "slop": 2, "in_order": true, "id_field": "doc_id"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30, "_source": ["doc_id", "n_pairs", "min_gap"]}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        pos AS (
          SELECT doc_id, unnest(a) AS tok,
                 unnest(range(1, len(a) + 1)) AS p
          FROM arr),
        p1 AS (SELECT doc_id, p FROM pos WHERE tok LIKE 's%'),
        p2 AS (SELECT doc_id, p FROM pos WHERE tok = 'join'),
        g AS (
          SELECT p1.doc_id, CAST(p2.p - p1.p - 1 AS BIGINT) AS gap
          FROM p1 JOIN p2 USING (doc_id)
          WHERE p2.p > p1.p AND p2.p - p1.p - 1 <= 2)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs, MIN(gap) AS min_gap
        FROM g GROUP BY 1
        ORDER BY n_pairs DESC, doc_id
        LIMIT 30
      """.stripMargin.trim)),

    // standalone span_multi wrapping a FUZZY multi-term query: every
    // token position within 2 edits of "row" counts as a span (one
    // posexplode + predicate filter + partial-agg count — map-side
    // combine, no pairing join).
    GraftQuery(
      "q304_dsl_span_multi_fuzzy",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"span_multi": {
             "match": {"fuzzy": {"text": {"value": "row", "fuzziness": 2}}},
             "id_field": "doc_id"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30, "_source": ["doc_id", "n_spans"]}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        pos AS (SELECT doc_id, unnest(a) AS tok FROM arr),
        hits AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
          FROM pos WHERE levenshtein(tok, 'row') <= 2
          GROUP BY 1)
        SELECT doc_id, n_spans FROM hits
        ORDER BY n_spans DESC, doc_id
        LIMIT 30
      """.stripMargin.trim)),

    // fuzziness with transpositions: true — the full Damerau-
    // Levenshtein edit model (adjacent swap = ONE edit) via the
    // codegen'd plans.DamerauLevenshtein expression; both query terms
    // are pure-transposition typos, invisible at levenshtein 1. The
    // engine DEFAULT stays plain levenshtein (every other fuzzy
    // surface here uses it) — this gate covers the opt-in.
    GraftQuery(
      "q305_dsl_fuzzy_transpositions",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match": {"text": {"query": "sotr windwo",
             "fuzziness": 1, "transpositions": true}}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 40, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH d AS (
          SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
          FROM documents),
        s AS (
          SELECT doc_id, CAST(
              CASE WHEN len(list_filter(toks,
                t -> damerau_levenshtein(t, 'sotr') <= 1)) > 0
                THEN 1 ELSE 0 END
            + CASE WHEN len(list_filter(toks,
                t -> damerau_levenshtein(t, 'windwo') <= 1)) > 0
                THEN 1 ELSE 0 END AS BIGINT) AS score
          FROM d)
        SELECT doc_id, score FROM s WHERE score >= 1
        ORDER BY score DESC, doc_id LIMIT 40
      """.stripMargin.trim)),

    // the terms LOOKUP form: the values array fetched from one row of
    // the request's own table (doc 7's language), resolved once on
    // the driver (pushed-filter point read), then compiled as a plain
    // map-side `isin` — "every document in the same language as X".
    GraftQuery(
      "q306_dsl_terms_lookup",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"terms": {"lang":
             {"id_field": "doc_id", "id": 7, "path": "lang"}}},
           "sort": ["doc_id"], "size": 50, "_source": ["doc_id", "lang"]}"""),
      Some("""
        SELECT doc_id, lang FROM documents
        WHERE lang = (SELECT lang FROM documents WHERE doc_id = 7)
        ORDER BY doc_id LIMIT 50
      """.stripMargin.trim)),

    // geo_shape with a convex CCW polygon (GeoJSON [lon, lat] ring)
    // against the shared synthetic point set — the same half-plane
    // comparison predicates as geo_polygon, replicated edge-for-edge
    // in the oracle so the IEEE arithmetic matches exactly.
    GraftQuery(
      "q307_dsl_geo_shape",
      (s, dir) => {
        val pts = GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer"))
        QueryDsl.search(pts,
          """{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon",
               "shape": {"type": "polygon", "coordinates":
                 [[[0.0, 0.0], [60.0, 0.0], [0.0, 60.0], [0.0, 0.0]]]},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 120,
             "_source": ["c_custkey", "lat", "lon"]}""")
      },
      Some("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer)
        SELECT c_custkey, lat, lon FROM pts
        WHERE (60.0 - 0.0) * (lat - 0.0) - (0.0 - 0.0) * (lon - 0.0) >= 0.0
          AND (0.0 - 60.0) * (lat - 0.0) - (60.0 - 0.0) * (lon - 60.0) >= 0.0
          AND (0.0 - 0.0) * (lat - 60.0) - (0.0 - 60.0) * (lon - 0.0) >= 0.0
        ORDER BY c_custkey
        LIMIT 120
      """.stripMargin.trim)),

    // `_script` sort: a computed integer expression through the SAME
    // ScoreScript compiler as script_score — one codegen'd Catalyst
    // column, zero row-time interpretation.
    GraftQuery(
      "q308_dsl_script_sort",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match_all": {}},
           "sort": [{"_script": {"type": "number",
             "script": {"source":
               "doc['n_chars'].value * params.w - doc['doc_id'].value",
               "params": {"w": 3}},
             "order": "desc"}}, "doc_id"],
           "size": 40, "_source": ["doc_id", "n_chars"]}"""),
      Some("""
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars * 3 - doc_id DESC, doc_id
        LIMIT 40
      """.stripMargin.trim)),

    // the _termvectors endpoint: doc 7's per-term stats with 0-based
    // positions and corpus term_statistics — a pushed point read plus
    // ONE vocabulary-bounded corpus agg joined to the tiny term set.
    GraftQuery(
      "q309_dsl_termvectors",
      (s, dir) => QueryDsl.termvectors(
        Tables.load(s, dir, "documents"),
        """{"id_field": "doc_id", "id": 7, "field": "text",
           "positions": true, "term_statistics": true}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        pos AS (
          SELECT doc_id, unnest(a) AS term,
                 unnest(range(0, len(a))) AS p
          FROM arr),
        doc AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS term_freq,
                 array_to_string(list_transform(list_sort(list(p)),
                   x -> CAST(x AS VARCHAR)), ',') AS positions
          FROM pos WHERE doc_id = 7 GROUP BY term),
        stats AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
                 CAST(COUNT(*) AS BIGINT) AS ttf
          FROM pos GROUP BY term)
        SELECT term, term_freq, positions, doc_freq, ttf
        FROM doc JOIN stats USING (term)
        ORDER BY term
      """.stripMargin.trim)),

    // minimum_should_match percentage form: "60%" of 5 query terms
    // resolves to 3 ON THE DRIVER (floor, the OpenSearch rounding) —
    // the request replays byte-identically as the integer form.
    GraftQuery(
      "q310_dsl_msm_percentage",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"match": {"text":
             {"query": "spark join window merge stream",
              "minimum_should_match": "60%"}}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 40, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH s AS (
          SELECT doc_id, CAST(len(list_intersect(
                   list_distinct(string_split(text, ' ')),
                   ['spark', 'join', 'window', 'merge', 'stream']))
                 AS BIGINT) AS score
          FROM documents)
        SELECT doc_id, score FROM s WHERE score >= 3
        ORDER BY score DESC, doc_id LIMIT 40
      """.stripMargin.trim)),

    // the script_score FUNCTION inside function_score: a computed
    // unit-scale value through the shared ScoreScript compiler,
    // multiplied into the match score by boost_mode — one codegen'd
    // projection, zero row-time interpretation.
    GraftQuery(
      "q311_dsl_function_script_score",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"function_score": {
             "query": {"match": {"text": {"query": "spark join",
               "minimum_should_match": 1}}},
             "functions": [{"script_score": {"script":
               {"source": "doc['n_chars'].value + params.k",
                "params": {"k": 100}}}}],
             "boost_mode": "multiply"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 40, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH s AS (
          SELECT doc_id,
                 CAST(len(list_intersect(
                   list_distinct(string_split(text, ' ')),
                   ['spark', 'join'])) AS BIGINT) AS overlap,
                 n_chars
          FROM documents)
        SELECT doc_id,
               CAST(overlap * (n_chars + 100) AS BIGINT) AS score
        FROM s WHERE overlap >= 1
        ORDER BY score DESC, doc_id LIMIT 40
      """.stripMargin.trim)),

    // fuzzy + context-filtered completion: the typed prefix "spx" is
    // one edit from any term's 3-char prefix it completes; the lang
    // context filters rows BEFORE the explode (pushed to the scan).
    GraftQuery(
      "q312_dsl_completion_fuzzy",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"suggest": {"s": {"prefix": "sta",
             "completion": {"field": "text", "size": 10,
               "fuzzy": {"fuzziness": 1},
               "contexts": {"lang": ["en", "de"]}}}}}"""),
      Some("""
        WITH pos AS (
          SELECT unnest(string_split(text, ' ')) AS term
          FROM documents WHERE lang IN ('en', 'de'))
        SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
        FROM pos
        WHERE levenshtein(substr(term, 1, 3), 'sta') <= 1 AND len(term) >= 1
        GROUP BY term
        ORDER BY freq DESC, term
        LIMIT 10
      """.stripMargin.trim)),

    // term-level boost on prefix/wildcard (the term clause's integer
    // rule extended across the term-level family): a boosted should
    // pair ranks by which arms matched.
    GraftQuery(
      "q313_dsl_term_level_boost",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {"should": [
             {"prefix": {"text": {"value": "the", "boost": 2}}},
             {"wildcard": {"text": {"value": "*merge*", "boost": 3}}}],
             "minimum_should_match": 1}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 40, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH s AS (
          SELECT doc_id,
            CAST(CASE WHEN text LIKE 'the%' THEN 2 ELSE 0 END
               + CASE WHEN text LIKE '%merge%' THEN 3 ELSE 0 END AS BIGINT)
              AS score
          FROM documents)
        SELECT doc_id, score FROM s WHERE score >= 2
        ORDER BY score DESC, doc_id LIMIT 40
      """.stripMargin.trim)),

    // the hybrid query: RRF fusion of a lexical arm (match overlap)
    // and a value arm (script_score n_chars) — each ranked inside a
    // bounded window, fused by Σ 10⁶ div (60 + rank). The q102
    // contract as a wire shape; exact integer, engine-portable.
    GraftQuery(
      "q314_dsl_hybrid",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"hybrid": {
             "queries": [
               {"match": {"text": {"query": "spark join window"}}},
               {"script_score": {"query": {"exists": {"field": "n_chars"}},
                 "script": {"source": "doc['n_chars'].value"}}}],
             "id_field": "doc_id", "window_size": 20}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 25, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH a1 AS (
          SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
          FROM (
            SELECT doc_id, CAST(len(list_intersect(
                     list_distinct(string_split(text, ' ')),
                     ['spark', 'join', 'window'])) AS BIGINT) AS score
            FROM documents) WHERE score >= 1),
        a2 AS (
          SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
          FROM documents),
        f AS (
          SELECT doc_id,
                 CAST(COALESCE(1000000 // (60 + a1k.r1), 0)
                    + COALESCE(1000000 // (60 + a2k.r2), 0) AS BIGINT) AS score
          FROM (SELECT doc_id, r AS r1 FROM a1 WHERE r <= 20) a1k
          FULL OUTER JOIN (SELECT doc_id, r AS r2 FROM a2 WHERE r <= 20) a2k
            USING (doc_id))
        SELECT doc_id, score FROM f
        ORDER BY score DESC, doc_id LIMIT 25
      """.stripMargin.trim)),

    // ip_prefix bucket agg: /12 networks of the q238 synthetic
    // addresses — ONE masked-integer groupBy (map-side partial agg),
    // canonical a.b.c.d/N keys, numeric prefix order.
    GraftQuery(
      "q315_dsl_ip_prefix",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val ev = Tables.load(s, dir, "events").withColumn("ip",
          expr("concat('10.', user_id % 256, '.', (user_id div 7) % 256, " +
            "'.', user_id % 251)"))
        QueryDsl.search(ev,
          """{"aggs": {"net": {"ip_prefix": {"field": "ip",
               "prefix_length": 12},
             "aggs": {"n_users": {"cardinality": {"field": "user_id"}}}}}}""")
      },
      Some("""
        WITH e AS (
          SELECT user_id,
                 concat('10.', user_id % 256, '.', (user_id // 7) % 256,
                        '.', user_id % 251) AS ip
          FROM events),
        n AS (
          SELECT user_id,
                 CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
                   + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
                   + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
                   + CAST(string_split(ip, '.')[4] AS BIGINT) AS ipn
          FROM e),
        g AS (
          SELECT ipn - ipn % 1048576 AS netn, COUNT(*) AS doc_count,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM n GROUP BY 1)
        SELECT concat(netn // 16777216, '.', (netn // 65536) % 256, '.',
                      (netn // 256) % 256, '.', netn % 256, '/12') AS net,
               CAST(doc_count AS BIGINT) AS doc_count, n_users
        FROM g ORDER BY netn
      """.stripMargin.trim)),

    // intervals composition: an any_of (two prefix stems) in ordered
    // all_of sequence with a two-term match chain, shared gap budget —
    // span-set algebra over ONE posexplode, postings joins only.
    GraftQuery(
      "q316_dsl_intervals_all_of",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"intervals": {"text": {"all_of": {
             "intervals": [
               {"any_of": {"intervals": [{"prefix": {"prefix": "sp"}},
                                         {"prefix": {"prefix": "st"}}]}},
               {"match": {"query": "join merge", "max_gaps": 4,
                 "ordered": true}}],
             "max_gaps": 5, "ordered": true}},
             "id_field": "doc_id"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30, "_source": ["doc_id", "n_spans"]}"""),
      Some("""
        WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        pos AS (
          SELECT doc_id, unnest(a) AS tok,
                 unnest(range(0, len(a))) AS p
          FROM arr),
        m1 AS (
          SELECT doc_id, p AS s1, p AS e1 FROM pos
          WHERE tok LIKE 'sp%' OR tok LIKE 'st%'),
        m2 AS (
          SELECT DISTINCT a.doc_id, a.p AS s2, b.p AS e2
          FROM pos a JOIN pos b USING (doc_id)
          WHERE a.tok = 'join' AND b.tok = 'merge'
            AND b.p > a.p AND b.p - a.p - 1 <= 4),
        f AS (
          SELECT DISTINCT m1.doc_id, m1.s1 AS s, m2.e2 AS e
          FROM m1 JOIN m2 USING (doc_id)
          WHERE m2.s2 > m1.e1 AND m2.s2 - m1.e1 - 1 <= 5)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
        FROM f GROUP BY 1
        ORDER BY n_spans DESC, doc_id LIMIT 30
      """.stripMargin.trim)),

    // rank_eval recall: |top-k ∩ relevant| over the TOTAL relevant
    // count in the ratings (precision's q245 twin on the other
    // denominator).
    GraftQuery(
      "q317_dsl_rank_eval_recall",
      (s, dir) => QueryDsl.rankEval(
        Tables.load(s, dir, "documents"),
        """{"id_field": "doc_id",
           "metric": {"recall": {"k": 10, "relevant_rating_threshold": 1}},
           "requests": [
             {"id": "qa",
              "request": {"query": {"match": {"text": "spark join"}},
                          "sort": [{"_score": "desc"}, "doc_id"],
                          "size": 10, "_source": ["doc_id"]},
              "ratings": [{"doc_id": 0, "rating": 1}, {"doc_id": 2, "rating": 1},
                          {"doc_id": 4, "rating": 1}, {"doc_id": 6, "rating": 1},
                          {"doc_id": 8, "rating": 1}, {"doc_id": 1, "rating": 0}]},
             {"id": "qb",
              "request": {"query": {"match": {"text": "data window"}},
                          "sort": [{"_score": "desc"}, "doc_id"],
                          "size": 10, "_source": ["doc_id"]},
              "ratings": [{"doc_id": 1, "rating": 1}, {"doc_id": 3, "rating": 1},
                          {"doc_id": 5, "rating": 1}, {"doc_id": 7, "rating": 1}]}]}"""),
      Some("""
        WITH ta AS (
          SELECT doc_id FROM (
            SELECT doc_id,
              CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                       ['spark','join'])) AS BIGINT) AS score
            FROM documents) s
          WHERE score >= 1 ORDER BY score DESC, doc_id LIMIT 10),
        tb AS (
          SELECT doc_id FROM (
            SELECT doc_id,
              CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                       ['data','window'])) AS BIGINT) AS score
            FROM documents) s
          WHERE score >= 1 ORDER BY score DESC, doc_id LIMIT 10),
        rela(doc_id) AS (VALUES (0), (2), (4), (6), (8)),
        relb(doc_id) AS (VALUES (1), (3), (5), (7)),
        m AS (
          SELECT 'qa' AS req_id,
                 (SELECT CAST(COUNT(*) AS DOUBLE)
                  FROM ta JOIN rela USING (doc_id))
                 / (SELECT COUNT(*) FROM rela) AS recall
          UNION ALL
          SELECT 'qb',
                 (SELECT CAST(COUNT(*) AS DOUBLE)
                  FROM tb JOIN relb USING (doc_id))
                 / (SELECT COUNT(*) FROM relb))
        SELECT req_id, recall FROM m ORDER BY req_id
      """.stripMargin.trim)),

    // multi_match `operator: and` — every query term must match, per
    // field (the match-clause rule lifted across fields).
    GraftQuery(
      "q318_dsl_multi_match_operator",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"multi_match": {"query": "spark join",
             "fields": ["text"], "operator": "and",
             "type": "most_fields"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 40, "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH s AS (
          SELECT doc_id, CAST(len(list_intersect(
                   list_distinct(string_split(text, ' ')),
                   ['spark', 'join'])) AS BIGINT) AS score
          FROM documents)
        SELECT doc_id, score FROM s WHERE score >= 2
        ORDER BY score DESC, doc_id LIMIT 40
      """.stripMargin.trim)),

    // terms_set with a PER-DOCUMENT gate column
    // (minimum_should_match_field) — each doc stores how many of the
    // query's terms it requires.
    GraftQuery(
      "q319_dsl_terms_set_field",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val d = Tables.load(s, dir, "documents")
          .withColumn("req_terms", expr("1 + doc_id % 2"))
        QueryDsl.search(d,
          """{"query": {"terms_set": {"text": {
               "terms": ["spark", "join", "window"],
               "minimum_should_match_field": "req_terms"}}},
             "sort": [{"_score": "desc"}, "doc_id"],
             "size": 40, "_source": ["doc_id", "score"]}""")
      },
      Some("""
        WITH s AS (
          SELECT doc_id, 1 + doc_id % 2 AS req_terms,
                 CAST(len(list_intersect(
                   list_distinct(string_split(text, ' ')),
                   ['spark', 'join', 'window'])) AS BIGINT) AS score
          FROM documents)
        SELECT doc_id, score FROM s WHERE score >= req_terms
        ORDER BY score DESC, doc_id LIMIT 40
      """.stripMargin.trim)),

    // Plain `_search` match against a BUILT index, ranked by REAL BM25
    // (VERDICT r10 #1 — the last user-visible relevance divergence):
    // the request's `"similarity": "bm25"` knob opts the match clause
    // into the indexed relevance model; the serve path reads only the
    // term-bucket-pruned postings + one-row stats (never the corpus)
    // and replays q44's float-op order, so the DuckDB oracle replays
    // the same formula over the raw documents table.
    GraftQuery(
      "q320_dsl_match_bm25_indexed",
      (s, dir) => {
        val idx = graft.etl.SearchIndex.cachedIndex(s, dir, "doc_id", "text",
          watch = Seq(s"$dir/documents.parquet"))(
          Tables.load(s, dir, "documents"))
        QueryDsl.searchIndexed(s, idx,
          """{"query": {"match": {"text": {
               "query": "scan merge vector",
               "similarity": "bm25"}}},
             "sort": [{"_score": "desc"}, "doc_id"], "size": 15,
             "_source": ["doc_id", "score"]}""")
      },
      Some("""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS tok,
                          CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
                   FROM documents),
        stats AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                 CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) / COUNT(*) AS avgdl,
                 CAST(SUM(CASE WHEN list_contains(tok, 'scan') THEN 1 ELSE 0 END) AS DOUBLE) AS df_a,
                 CAST(SUM(CASE WHEN list_contains(tok, 'merge') THEN 1 ELSE 0 END) AS DOUBLE) AS df_b,
                 CAST(SUM(CASE WHEN list_contains(tok, 'vector') THEN 1 ELSE 0 END) AS DOUBLE) AS df_c
          FROM d),
        scored AS (
          SELECT doc_id,
            round(
              ln((n_docs - df_a + 0.5) / (df_a + 0.5) + 1.0)
                * (CAST(len(list_filter(tok, x -> x = 'scan')) AS DOUBLE) * (1.2 + 1.0))
                / (CAST(len(list_filter(tok, x -> x = 'scan')) AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
              + ln((n_docs - df_b + 0.5) / (df_b + 0.5) + 1.0)
                * (CAST(len(list_filter(tok, x -> x = 'merge')) AS DOUBLE) * (1.2 + 1.0))
                / (CAST(len(list_filter(tok, x -> x = 'merge')) AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
              + ln((n_docs - df_c + 0.5) / (df_c + 0.5) + 1.0)
                * (CAST(len(list_filter(tok, x -> x = 'vector')) AS DOUBLE) * (1.2 + 1.0))
                / (CAST(len(list_filter(tok, x -> x = 'vector')) AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)),
            6) AS score
          FROM d CROSS JOIN stats)
        SELECT doc_id, score FROM scored WHERE score > 0.0
        ORDER BY score DESC, doc_id LIMIT 15
      """.stripMargin.trim)),

    // The ANALYZED variant of q320: the index carries the STANDARD
    // analyzer in its sidecar, and the raw match text "Spark! MERGE,"
    // analyzes through that stored chain at serve time (build- and
    // query-side tokenization cannot drift). The oracle replays
    // normalize→tokenize→BM25 over the same mixed-case corpus.
    GraftQuery(
      "q321_dsl_match_bm25_analyzed",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val mixed = Tables.load(s, dir, "documents").withColumn("body",
          expr("replace(concat(upper(substring(text, 1, 20)), " +
            "substring(text, 21)), ' ', ', ')"))
        val idx = graft.etl.SearchIndex.cachedIndex(s, s"$dir#std",
          "doc_id", "body", watch = Seq(s"$dir/documents.parquet"),
          analyzer = "standard")(mixed)
        QueryDsl.searchIndexed(s, idx,
          """{"query": {"match": {"body": {
               "query": "Spark! MERGE,",
               "similarity": "bm25"}}},
             "size": 20}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 replace(upper(substr(text, 1, 20)) || substr(text, 21),
                         ' ', ', ') AS body
          FROM documents),
        d AS (SELECT doc_id,
                     string_split(trim(regexp_replace(lower(body),
                       '[^a-z0-9]+', ' ', 'g')), ' ') AS tok
              FROM mixed),
        dd AS (SELECT doc_id, tok, CAST(len(tok) AS DOUBLE) AS dl FROM d),
        stats AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                 CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) / COUNT(*) AS avgdl,
                 CAST(SUM(CASE WHEN list_contains(tok, 'spark') THEN 1 ELSE 0 END) AS DOUBLE) AS df_a,
                 CAST(SUM(CASE WHEN list_contains(tok, 'merge') THEN 1 ELSE 0 END) AS DOUBLE) AS df_b
          FROM dd),
        scored AS (
          SELECT doc_id,
            round(
              ln((n_docs - df_a + 0.5) / (df_a + 0.5) + 1.0)
                * (CAST(len(list_filter(tok, x -> x = 'spark')) AS DOUBLE) * (1.2 + 1.0))
                / (CAST(len(list_filter(tok, x -> x = 'spark')) AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
              + ln((n_docs - df_b + 0.5) / (df_b + 0.5) + 1.0)
                * (CAST(len(list_filter(tok, x -> x = 'merge')) AS DOUBLE) * (1.2 + 1.0))
                / (CAST(len(list_filter(tok, x -> x = 'merge')) AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)),
            6) AS score
          FROM dd CROSS JOIN stats)
        SELECT doc_id, score FROM scored WHERE score > 0.0
        ORDER BY score DESC, doc_id LIMIT 20
      """.stripMargin.trim)),

    // `_msearch` with FULL bodies (VERDICT r10 #2): a five-request
    // dashboard batch — count, filtered avg metric, two terms aggs on
    // the same field (one filtered), and a scored hit request — in
    // ONE call. The count+metric arms share one conditional-aggregate
    // scan (plan-pinned in QueryDslSpec), the two terms arms share one
    // groupBy scan, and the hit arm runs a bounded-heap top-k (no
    // per-request corpus sort). Long wire format
    // (req, kind, ord, key, value); the oracle replays each response
    // element and unions them.
    GraftQuery(
      "q322_dsl_msearch_full",
      (s, dir) => QueryDsl.msearch(
        Tables.load(s, dir, "documents"),
        Seq(
          """{"query": {"term": {"lang": "en"}}}""",
          """{"query": {"range": {"n_chars": {"gte": 200}}},
              "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}""",
          """{"aggs": {"by_source": {"terms": {"field": "source",
              "size": 5}}}}""",
          """{"query": {"term": {"lang": "en"}},
              "aggs": {"by_source_en": {"terms": {"field": "source",
              "size": 3}}}}""",
          """{"query": {"match": {"text": "spark join"}}, "size": 8,
              "_source": ["doc_id", "score"]}""")),
      Some("""
        WITH c0 AS (
          SELECT CAST(0 AS BIGINT) AS req, 'count' AS kind,
                 CAST(0 AS BIGINT) AS ord, 'count' AS key,
                 CAST(COUNT(*) AS DOUBLE) AS value
          FROM documents WHERE lang = 'en'),
        a1 AS (
          SELECT CAST(1 AS BIGINT), 'agg', CAST(0 AS BIGINT), 'avg_chars',
                 CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE)
                   / CAST(COUNT(n_chars) AS DOUBLE)
          FROM documents WHERE n_chars >= 200),
        t2 AS (
          SELECT CAST(2 AS BIGINT), 'terms', rnk, key, val FROM (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, key) AS BIGINT) AS rnk,
                   key, CAST(n AS DOUBLE) AS val
            FROM (SELECT CAST(source AS VARCHAR) AS key,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM documents GROUP BY 1) b
            WHERE n > 0) r WHERE rnk <= 5),
        t3 AS (
          SELECT CAST(3 AS BIGINT), 'terms', rnk, key, val FROM (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, key) AS BIGINT) AS rnk,
                   key, CAST(n AS DOUBLE) AS val
            FROM (SELECT CAST(source AS VARCHAR) AS key,
                         CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n
                  FROM documents GROUP BY 1) b
            WHERE n > 0) r WHERE rnk <= 3),
        h4 AS (
          SELECT CAST(4 AS BIGINT), 'hit', rnk, CAST(doc_id AS VARCHAR),
                 CAST(score AS DOUBLE) FROM (
            SELECT doc_id, score,
                   CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
            FROM (SELECT doc_id,
                         CAST(len(list_intersect(
                           list_distinct(string_split(text, ' ')),
                           ['spark', 'join'])) AS BIGINT) AS score
                  FROM documents) s
            WHERE score >= 1) r WHERE rnk <= 8)
        SELECT req, kind, ord, key, value FROM (
          SELECT * FROM c0 UNION ALL SELECT * FROM a1
          UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3
          UNION ALL SELECT * FROM h4)
        ORDER BY req, ord, key
      """.stripMargin.trim)),

    // nested inner_hits (VERDICT r10 #3): the matching CHILD OBJECTS
    // return alongside each parent hit — one row per (order, matching
    // line item), element order = document order, capped at size 2 per
    // parent, the requested element fields surfaced as typed
    // inner_<field> columns. Pure codegen (filter+slice+posexplode on
    // the probed array): no join, no shuffle beyond the fixture's own
    // groupBy. The oracle ranks the same same-element conjunction on
    // the flat child table.
    GraftQuery(
      "q323_dsl_nested_inner",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val li = Tables.load(s, dir, "lineitem")
        val nested = li.groupBy(col("l_orderkey").as("order_key"))
          .agg(array_sort(collect_list(struct(
            col("l_linenumber").as("ln"),
            col("l_quantity").as("qty"),
            col("l_discount").as("disc")))).as("items"))
        QueryDsl.search(nested,
          """{"query": {"nested": {"path": "items",
               "query": {"bool": {"must": [
                 {"range": {"items.qty": {"gte": 48.0}}},
                 {"range": {"items.disc": {"lte": 0.02}}}]}},
               "score_mode": "sum",
               "inner_hits": {"size": 2,
                 "_source": ["items.ln", "items.qty"]}}},
             "sort": [{"_score": "desc"}, "order_key", "inner_rank"],
             "size": 30,
             "_source": ["order_key", "score", "inner_rank",
                         "inner_ln", "inner_qty"]}""")
      },
      Some("""
        WITH m AS (
          SELECT l_orderkey AS order_key, l_linenumber AS ln,
                 l_quantity AS qty,
                 CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_quantity, l_discount)
                   AS BIGINT) AS inner_rank
          FROM lineitem WHERE l_quantity >= 48.0 AND l_discount <= 0.02),
        s AS (SELECT order_key, CAST(COUNT(*) AS BIGINT) AS score
              FROM m GROUP BY 1)
        SELECT m.order_key, s.score, m.inner_rank,
               m.ln AS inner_ln, m.qty AS inner_qty
        FROM m JOIN s USING (order_key)
        WHERE m.inner_rank <= 2
        ORDER BY score DESC, order_key, inner_rank LIMIT 30
      """.stripMargin.trim)),

    // has_child inner_hits: the top-2 matching children per parent hit
    // ride the SAME groupBy as the count/score monoids via a bounded
    // heap (score desc, child id asc — range scores tie at 1, so the
    // smallest order ids surface), then the one equi-join back to the
    // parents — the q254 plan with two extra struct columns, never a
    // per-row subquery (QueryDslSpec pins no NestedLoop/Cartesian).
    GraftQuery(
      "q324_dsl_has_child_inner",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val c = Tables.load(s, dir, "customer").select(
          lit("customer").as("rel"), col("c_custkey").as("doc_id"),
          lit(null).cast("long").as("parent_id"),
          lit(null).cast("double").as("price"))
        val o = Tables.load(s, dir, "orders").select(
          lit("order").as("rel"),
          (lit(10000000L) + col("o_orderkey")).as("doc_id"),
          col("o_custkey").as("parent_id"),
          col("o_totalprice").as("price"))
        QueryDsl.search(c.unionByName(o),
          """{"query": {"has_child": {"type": "order", "join_field": "rel",
               "parent_type": "customer",
               "id_field": "doc_id", "parent_field": "parent_id",
               "query": {"range": {"price": {"gte": 300000}}},
               "score_mode": "sum", "min_children": 3,
               "inner_hits": {"size": 2}}},
             "sort": [{"_score": "desc"}, "doc_id", "inner_rank"],
             "size": 60,
             "_source": ["doc_id", "score", "inner_rank", "inner_id",
                         "inner_score"]}""")
      },
      Some("""
        WITH k AS (
          SELECT o_custkey AS pid,
                 CAST(10000000 + o_orderkey AS BIGINT) AS cid
          FROM orders WHERE o_totalprice >= 300000),
        g AS (SELECT pid, CAST(COUNT(*) AS BIGINT) AS n
              FROM k GROUP BY 1 HAVING COUNT(*) >= 3),
        ih AS (
          SELECT pid, cid,
                 CAST(ROW_NUMBER() OVER (PARTITION BY pid ORDER BY cid)
                   AS BIGINT) AS inner_rank
          FROM k)
        SELECT c.c_custkey AS doc_id, g.n AS score, i.inner_rank,
               i.cid AS inner_id, CAST(1 AS BIGINT) AS inner_score
        FROM customer c
        JOIN g ON c.c_custkey = g.pid
        JOIN ih i ON i.pid = g.pid AND i.inner_rank <= 2
        ORDER BY score DESC, doc_id, inner_rank LIMIT 60
      """.stripMargin.trim)),

    // has_parent inner_hits: each child hit carries ITS matched parent
    // (inner_rank constant 1 — a child has one parent pointer), with
    // the parent's score surfaced — the q255 join untouched, two
    // constant-per-row columns added.
    GraftQuery(
      "q325_dsl_has_parent_inner",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val c = Tables.load(s, dir, "customer").select(
          lit("customer").as("rel"), col("c_custkey").as("doc_id"),
          lit(null).cast("long").as("parent_id"),
          lit(null).cast("double").as("price"),
          col("c_acctbal").as("acctbal"))
        val o = Tables.load(s, dir, "orders").select(
          lit("order").as("rel"),
          (lit(10000000L) + col("o_orderkey")).as("doc_id"),
          col("o_custkey").as("parent_id"),
          col("o_totalprice").as("price"),
          lit(null).cast("double").as("acctbal"))
        QueryDsl.search(c.unionByName(o),
          """{"query": {"has_parent": {"parent_type": "customer",
               "join_field": "rel", "id_field": "doc_id",
               "parent_field": "parent_id",
               "query": {"bool": {
                 "must": [{"range": {"acctbal": {"gte": 5000}}},
                          {"range": {"acctbal": {"lte": 5600}}}],
                 "should": [{"range": {"acctbal": {"gte": 5300}}}]}},
               "score": true, "type": "order",
               "inner_hits": {"size": 3}}},
             "sort": [{"_score": "desc"}, "doc_id"], "size": 60,
             "_source": ["doc_id", "score", "inner_rank", "inner_id",
                         "inner_score"]}""")
      },
      Some("""
        WITH p AS (
          SELECT c_custkey AS pid,
                 CAST(2 + CASE WHEN c_acctbal >= 5300 THEN 1 ELSE 0 END
                   AS BIGINT) AS pscore
          FROM customer WHERE c_acctbal BETWEEN 5000 AND 5600)
        SELECT 10000000 + o.o_orderkey AS doc_id,
               p.pscore AS score, CAST(1 AS BIGINT) AS inner_rank,
               p.pid AS inner_id, p.pscore AS inner_score
        FROM orders o JOIN p ON o.o_custkey = p.pid
        ORDER BY score DESC, doc_id LIMIT 60
      """.stripMargin.trim)),

    // function_score score_mode min (VERDICT r10 #7): the least value
    // over MATCHED functions only — a doc matching both functions
    // scores min(3,2)=2, one function its own weight, none keeps the
    // query score (neutral x1 under boost_mode multiply). Unmatched
    // entries contribute NULL (least() skips NULLs), never a spurious
    // 0 that would shadow every real value.
    GraftQuery(
      "q326_dsl_function_score_min",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"function_score": {
             "query": {"match": {"text": "spark"}},
             "functions": [
               {"filter": {"term": {"lang": "en"}}, "weight": 3},
               {"filter": {"range": {"n_chars": {"gte": 400}}}, "weight": 2}],
             "score_mode": "min", "boost_mode": "multiply"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id, lang, n_chars,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                    ['spark'])) AS BIGINT) AS q
          FROM documents)
        SELECT doc_id,
               q * (CASE WHEN lang = 'en' AND n_chars >= 400 THEN LEAST(3, 2)
                         WHEN lang = 'en' THEN 3
                         WHEN n_chars >= 400 THEN 2
                         ELSE 1 END) AS score
        FROM t WHERE q >= 1
        ORDER BY score DESC, doc_id
        LIMIT 30
      """.stripMargin.trim)),

    // function_score score_mode multiply (VERDICT r10 #7): the product
    // over MATCHED functions only — both functions 3*2=6, one its own
    // weight (the other is the x1 neutral), none keeps the query score.
    // Exact-long safe (integer weights); ppm functions fail loud under
    // multiply (products of ppm values compound to 10^-12).
    GraftQuery(
      "q327_dsl_function_score_multiply",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"function_score": {
             "query": {"match": {"text": "spark"}},
             "functions": [
               {"filter": {"term": {"lang": "en"}}, "weight": 3},
               {"filter": {"range": {"n_chars": {"gte": 400}}}, "weight": 2}],
             "score_mode": "multiply", "boost_mode": "multiply"}},
           "sort": [{"_score": "desc"}, "doc_id"],
           "size": 30,
           "_source": ["doc_id", "score"]}"""),
      Some("""
        WITH t AS (
          SELECT doc_id, lang, n_chars,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                    ['spark'])) AS BIGINT) AS q
          FROM documents)
        SELECT doc_id,
               q * (CASE WHEN lang = 'en' OR n_chars >= 400
                    THEN (CASE WHEN lang = 'en' THEN 3 ELSE 1 END)
                       * (CASE WHEN n_chars >= 400 THEN 2 ELSE 1 END)
                    ELSE 1 END) AS score
        FROM t WHERE q >= 1
        ORDER BY score DESC, doc_id
        LIMIT 30
      """.stripMargin.trim)),

    // multi_terms per-entry `missing` (VERDICT r10 #7): a terms entry
    // {field, missing} substitutes the named bucket for docs without
    // that key part (a coalesce — the groupBy stays ONE shuffle); an
    // entry WITHOUT missing still skips docs missing the field (the
    // OpenSearch rule). NULLs synthesized via nullif: lang 'de' -> NULL
    // (skipped: lg has no missing), source 'src1' -> NULL (bucketed
    // under 'none').
    GraftQuery(
      "q328_dsl_multi_terms_missing",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val d = Tables.load(s, dir, "documents").select(
          col("doc_id"),
          when(col("lang") === "de", lit(null)).otherwise(col("lang")).as("lg"),
          when(col("source") === "src1", lit(null)).otherwise(col("source")).as("src"),
          col("n_chars"))
        QueryDsl.search(d,
          """{"size": 0,
             "aggs": {"pairs": {"multi_terms": {
               "terms": [{"field": "lg"},
                         {"field": "src", "missing": "none"}],
               "size": 12},
               "aggs": {"max_chars": {"max": {"field": "n_chars"}}}}}}""")
      },
      Some("""
        WITH t AS (
          SELECT NULLIF(lang, 'de') AS lg,
                 COALESCE(NULLIF(source, 'src1'), 'none') AS src,
                 n_chars
          FROM documents)
        SELECT lg, src, COUNT(*) AS doc_count,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars
        FROM t WHERE lg IS NOT NULL
        GROUP BY 1, 2 ORDER BY doc_count DESC, lg, src LIMIT 12
      """.stripMargin.trim)),

    // date_histogram with a request-supplied DST transition TABLE
    // (VERDICT r10 #6): time_zone as {"transitions": [[iso_utc,
    // offset_min], ...]} — a piecewise-constant UTC→local offset, the
    // last entry at-or-before each timestamp applying (the first is
    // the base). The LOCAL-CALENDAR rule: docs bucket by local wall
    // day, the key is the UTC instant of the local midnight (mapped
    // through the boundary's own offset — the local ACTIVATION
    // thresholds utc_ts + offset), so the day containing a transition
    // is ONE 23h/25h bucket, exactly what a tzdb zone gives —
    // deterministic and oracle-able where a named IANA zone needs a
    // tzdb the oracle can't replay. Named zone strings still fail loud.
    GraftQuery(
      "q329_dsl_date_histogram_transitions",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"match_all": {}},
           "aggs": {"day": {"date_histogram":
               {"field": "ts", "calendar_interval": "day",
                "time_zone": {"transitions": [
                  ["2024-01-01T00:00:00", 60],
                  ["2024-01-15T01:00:00", 120],
                  ["2024-01-25T01:00:00", 60]]}},
             "aggs": {"max_id": {"max": {"field": "event_id"}}}}}}"""),
      Some("""
        WITH t AS (
          SELECT event_id,
            epoch_us(ts) +
            CASE WHEN ts >= TIMESTAMP '2024-01-25 01:00:00' THEN 3600000000
                 WHEN ts >= TIMESTAMP '2024-01-15 01:00:00' THEN 7200000000
                 ELSE 3600000000 END AS local_us
          FROM events),
        b AS (
          SELECT event_id,
            epoch_us(date_trunc('day', make_timestamp(local_us))) AS l
          FROM t)
        SELECT make_timestamp(l -
            CASE WHEN l >= epoch_us(TIMESTAMP '2024-01-25 02:00:00')
                   THEN 3600000000
                 WHEN l >= epoch_us(TIMESTAMP '2024-01-15 03:00:00')
                   THEN 7200000000
                 ELSE 3600000000 END) AS day,
          COUNT(*) AS doc_count,
          CAST(MAX(event_id) AS BIGINT) AS max_id
        FROM b GROUP BY 1 ORDER BY doc_count DESC, day
      """.stripMargin.trim)),

    // geo_shape with a CONCAVE polygon (VERDICT r10 missing #5): a
    // chevron ring with a notch — not convex, so the clause routes to
    // the even-odd crossing walk: one division-free sign test per
    // non-horizontal edge (the same 2-D cross product as the convex
    // path, multiplied through by (lat2-lat1) instead of dividing),
    // summed and checked for odd parity. Still a pushed scan-level
    // predicate; the oracle replays the identical per-edge arithmetic.
    GraftQuery(
      "q330_dsl_geo_shape_concave",
      (s, dir) => {
        val pts = GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer"))
        QueryDsl.search(pts,
          """{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon",
               "shape": {"type": "polygon", "coordinates":
                 [[[0.0, 0.0], [40.0, 0.0], [40.0, 40.0],
                   [20.0, 15.0], [0.0, 40.0], [0.0, 0.0]]]},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 120,
             "_source": ["c_custkey", "lat", "lon"]}""")
      },
      Some("""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer)
        SELECT c_custkey, lat, lon FROM pts WHERE
          ((CASE WHEN ((0.0 > lat) != (40.0 > lat))
              AND ((40.0 - 40.0) * (lat - 0.0) - (40.0 - 0.0) * (lon - 40.0)) > 0.0
            THEN 1 ELSE 0 END)
          + (CASE WHEN ((40.0 > lat) != (15.0 > lat))
              AND ((20.0 - 40.0) * (lat - 40.0) - (15.0 - 40.0) * (lon - 40.0)) < 0.0
            THEN 1 ELSE 0 END)
          + (CASE WHEN ((15.0 > lat) != (40.0 > lat))
              AND ((0.0 - 20.0) * (lat - 15.0) - (40.0 - 15.0) * (lon - 20.0)) > 0.0
            THEN 1 ELSE 0 END)
          + (CASE WHEN ((40.0 > lat) != (0.0 > lat))
              AND ((0.0 - 0.0) * (lat - 40.0) - (0.0 - 40.0) * (lon - 0.0)) < 0.0
            THEN 1 ELSE 0 END)) % 2 = 1
        ORDER BY c_custkey
        LIMIT 120
      """.stripMargin.trim)),

    // geo_shape doc_shape (VERDICT r10 missing #5, the indexed-shape
    // form): documents ARE envelopes (four corner columns), queried
    // with relation `within` — every relation compiles to a pushed
    // comparison conjunction on the corners, the form under which
    // `contains` is finally meaningful (spec-pinned; point docs keep
    // rejecting it).
    GraftQuery(
      "q331_dsl_geo_shape_doc_within",
      (s, dir) => {
        val boxes = GeoFixtures.syntheticBoxes(Tables.load(s, dir, "customer"))
        QueryDsl.search(boxes,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "envelope",
                 "lat_min_field": "lat0", "lat_max_field": "lat1",
                 "lon_min_field": "lon0", "lon_max_field": "lon1"},
               "shape": {"type": "envelope",
                 "coordinates": [[-50.0, 40.0], [50.0, -40.0]]},
               "relation": "within"}},
             "sort": ["c_custkey"], "size": 100,
             "_source": ["c_custkey", "lat0", "lat1", "lon0", "lon1"]}""")
      },
      Some("""
        WITH boxes AS (
          SELECT c_custkey,
            CAST((c_custkey * 2654435761) % 160000 AS DOUBLE) / 1000.0 - 85.0 AS lat0,
            CAST((c_custkey * 2654435761) % 160000 AS DOUBLE) / 1000.0 - 85.0
              + CAST((c_custkey * 48271 + 11) % 12000 AS DOUBLE) / 1000.0 AS lat1,
            CAST((c_custkey * 40503 + 7) % 340000 AS DOUBLE) / 1000.0 - 175.0 AS lon0,
            CAST((c_custkey * 40503 + 7) % 340000 AS DOUBLE) / 1000.0 - 175.0
              + CAST((c_custkey * 69621 + 3) % 12000 AS DOUBLE) / 1000.0 AS lon1
          FROM customer)
        SELECT c_custkey, lat0, lat1, lon0, lon1 FROM boxes
        WHERE lat0 >= -40.0 AND lat1 <= 40.0 AND lon0 >= -50.0 AND lon1 <= 50.0
        ORDER BY c_custkey
        LIMIT 100
      """.stripMargin.trim)),

    // doc_shape relation `intersects`: the box-overlap test (boundary
    // touch counts) against an envelope query shape — the other
    // corner-algebra relation worth an oracle at corpus size.
    GraftQuery(
      "q332_dsl_geo_shape_doc_intersects",
      (s, dir) => {
        val boxes = GeoFixtures.syntheticBoxes(Tables.load(s, dir, "customer"))
        QueryDsl.search(boxes,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "envelope",
                 "lat_min_field": "lat0", "lat_max_field": "lat1",
                 "lon_min_field": "lon0", "lon_max_field": "lon1"},
               "shape": {"type": "envelope",
                 "coordinates": [[10.5, 21.0], [60.0, -10.0]]},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 100,
             "_source": ["c_custkey", "lat0", "lat1", "lon0", "lon1"]}""")
      },
      Some("""
        WITH boxes AS (
          SELECT c_custkey,
            CAST((c_custkey * 2654435761) % 160000 AS DOUBLE) / 1000.0 - 85.0 AS lat0,
            CAST((c_custkey * 2654435761) % 160000 AS DOUBLE) / 1000.0 - 85.0
              + CAST((c_custkey * 48271 + 11) % 12000 AS DOUBLE) / 1000.0 AS lat1,
            CAST((c_custkey * 40503 + 7) % 340000 AS DOUBLE) / 1000.0 - 175.0 AS lon0,
            CAST((c_custkey * 40503 + 7) % 340000 AS DOUBLE) / 1000.0 - 175.0
              + CAST((c_custkey * 69621 + 3) % 12000 AS DOUBLE) / 1000.0 AS lon1
          FROM customer)
        SELECT c_custkey, lat0, lat1, lon0, lon1 FROM boxes
        WHERE lat0 <= 21.0 AND lat1 >= -10.0 AND lon0 <= 60.0 AND lon1 >= 10.5
        ORDER BY c_custkey
        LIMIT 100
      """.stripMargin.trim)),

    // completion suggester GEO context (VERDICT r10 missing #6):
    // completions restricted to docs in the SAME precision-p geohash
    // cell as the query point — the context is {lat, lon, precision,
    // lat_field, lon_field}, compiled to one equality on the same
    // codegen'd geohash key the geohash_grid agg groups on (the query
    // side constant-folds). The oracle replays the identical
    // quantize→interleave→base-32 bit walk on both the doc rows and
    // the literal point.
    GraftQuery(
      "q333_dsl_completion_geo_context",
      (s, dir) => {
        val t = GeoFixtures.syntheticPointsKeeping(
          Tables.load(s, dir, "customer"), "c_mktsegment")
        QueryDsl.search(t,
          """{"suggest": {"near": {"prefix": "B",
               "completion": {"field": "c_mktsegment", "size": 10,
                 "contexts": {"cell": {"lat": 20.0, "lon": 10.0,
                   "precision": 1,
                   "lat_field": "lat", "lon_field": "lon"}}}}}}""")
      },
      { val (ix, iy, code, hash) = geohashSqlParts(1)
        Some(s"""
        WITH pts AS (
          SELECT c_mktsegment,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer),
        g AS (SELECT c_mktsegment, $ix AS ix, $iy AS iy FROM pts),
        h AS (SELECT c_mktsegment, $code AS code FROM g),
        d AS (SELECT c_mktsegment, $hash AS cell FROM h),
        qp AS (SELECT 20.0 AS lat, 10.0 AS lon),
        qg AS (SELECT $ix AS ix, $iy AS iy FROM qp),
        qh AS (SELECT $code AS code FROM qg),
        qd AS (SELECT $hash AS qcell FROM qh)
        SELECT c_mktsegment AS term, CAST(COUNT(*) AS BIGINT) AS freq
        FROM d, qd WHERE d.cell = qd.qcell AND c_mktsegment LIKE 'B%'
        GROUP BY 1 ORDER BY freq DESC, term LIMIT 10
      """.stripMargin.trim) }),

    // has_child score_mode avg (closing the VERDICT r10 scope-out):
    // ONE IEEE divide from the exact integer (sum, count) monoids the
    // groupBy already carries — bit-identical cross-engine, so the
    // OpenSearch DEFAULT score_mode is servable exactly; the score
    // column is DOUBLE for this mode only (a request-level arm, never
    // a composable clause). Child scores vary (must 1 + should 0/1)
    // so the averages genuinely discriminate.
    GraftQuery(
      "q334_dsl_has_child_avg",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val c = Tables.load(s, dir, "customer").select(
          lit("customer").as("rel"), col("c_custkey").as("doc_id"),
          lit(null).cast("long").as("parent_id"),
          lit(null).cast("double").as("price"))
        val o = Tables.load(s, dir, "orders").select(
          lit("order").as("rel"),
          (lit(10000000L) + col("o_orderkey")).as("doc_id"),
          col("o_custkey").as("parent_id"),
          col("o_totalprice").as("price"))
        QueryDsl.search(c.unionByName(o),
          """{"query": {"has_child": {"type": "order", "join_field": "rel",
               "parent_type": "customer",
               "id_field": "doc_id", "parent_field": "parent_id",
               "query": {"bool": {
                 "must": [{"range": {"price": {"gte": 150000}}}],
                 "should": [{"range": {"price": {"gte": 250000}}}]}},
               "score_mode": "avg"}},
             "sort": [{"_score": "desc"}, "doc_id"], "size": 60,
             "_source": ["doc_id", "score"]}""")
      },
      Some("""
        WITH k AS (
          SELECT o_custkey AS pid,
                 CAST(1 + CASE WHEN o_totalprice >= 250000 THEN 1 ELSE 0 END
                   AS BIGINT) AS cscore
          FROM orders WHERE o_totalprice >= 150000),
        g AS (SELECT pid,
                CAST(CAST(SUM(cscore) AS BIGINT) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) AS score
              FROM k GROUP BY 1)
        SELECT c.c_custkey AS doc_id, g.score
        FROM customer c JOIN g ON c.c_custkey = g.pid
        ORDER BY score DESC, doc_id LIMIT 60
      """.stripMargin.trim))
  )
}

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
  private[queries] def geohashSqlParts(p: Int): (String, String, String, String) = {
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

  def queries: Seq[GraftQuery] =
    queriesA ++ DslSearchMid.queries ++ DslSearchTail.queries

  /** Entries q135–q208 (the original DSL sweep through the terms-`missing` seam). */
  private[queries] def queriesA: Seq[GraftQuery] = Seq(
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

  )
}

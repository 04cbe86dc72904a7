package graft.queries

import graft.GraftQuery
import graft.search.QueryDsl
import graft.sources.Tables

/** [[DslSearch]] continued — the final third of the query-DSL sweep
  * (runtime_mappings through the round-11 additions). Pure registry
  * data, split mechanically at entry boundaries; `geohashSqlParts`
  * stays on [[DslSearch]] (private[queries]) so the oracle SQL cannot
  * drift between the thirds.
  */
object DslSearchTail {
  import DslSearch.geohashSqlParts
  private[queries] def queries: Seq[GraftQuery] = Seq(
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
      """.stripMargin.trim)),

    // stored_fields + search_type wire compat: stored_fields
    // canonicalizes to _source (every column of the table is
    // "stored"), search_type is validated and inert (scores are
    // always corpus-global — dfs semantics) — q135's oracle VERBATIM,
    // proving the spellings change nothing.
    GraftQuery(
      "q336_dsl_stored_fields",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"bool": {
             "must": [
               {"terms": {"lang": ["en", "fr"]}},
               {"range": {"n_chars": {"gte": 200, "lte": 400}}},
               {"prefix": {"text": "the "}}],
             "must_not": [{"term": {"source": "src0"}}]}},
           "search_type": "dfs_query_then_fetch",
           "sort": ["doc_id"],
           "stored_fields": ["doc_id", "lang", "source", "n_chars"]}"""),
      Some("""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE lang IN ('en','fr') AND n_chars BETWEEN 200 AND 400
          AND source <> 'src0' AND text LIKE 'the %'
        ORDER BY doc_id
      """.stripMargin.trim)),

    // date_histogram with a NAMED IANA time_zone (VERDICT r11 #1 —
    // the #1 real-dashboard divergence): "America/New_York" resolves
    // ON THE DRIVER (JVM tzdb expanded over the hit span, padded 400d
    // down / 1d up) into the exact transition-table machinery q329
    // already serves, so the compiled request carries LITERAL
    // [[utc_instant, offset]] entries the oracle replays term for
    // term. The fixture maps order keys onto timestamps covering all
    // of 2021 — both US DST boundaries (2021-03-14T07:00Z spring
    // forward to -240 min, 2021-11-07T06:00Z fall back to -300) land
    // inside the data, and the 400-day pad pulls in the 2020 pair,
    // so the replayed CASE has five entries (base EST -300). Local-
    // calendar rule as q329: the transition days are single 23h/25h
    // buckets keyed at the UTC instant of local midnight.
    GraftQuery(
      "q341_dsl_date_histogram_named_tz",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val base = 1609459200000000L // 2021-01-01T00:00:00Z micros
        val o = Tables.load(s, dir, "orders").select(
          col("o_orderkey"),
          timestamp_micros(lit(base)
            + (col("o_orderkey") * lit(2654435761L)) % lit(365L) * lit(86400000000L)
            + (col("o_orderkey") % lit(86400L)) * lit(1000000L)).as("ts"))
        QueryDsl.search(o,
          """{"size": 0,
             "aggs": {"day": {"date_histogram":
                 {"field": "ts", "calendar_interval": "day",
                  "time_zone": "America/New_York"},
               "aggs": {"max_key": {"max": {"field": "o_orderkey"}}}}}}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
            1609459200000000 + ((o_orderkey * 2654435761) % 365) * 86400000000
              + (o_orderkey % 86400) * 1000000 AS ts_us
          FROM orders),
        d AS (
          SELECT o_orderkey, ts_us,
            CASE WHEN ts_us >= epoch_us(TIMESTAMP '2021-11-07 06:00:00')
                   THEN -18000000000
                 WHEN ts_us >= epoch_us(TIMESTAMP '2021-03-14 07:00:00')
                   THEN -14400000000
                 WHEN ts_us >= epoch_us(TIMESTAMP '2020-11-01 06:00:00')
                   THEN -18000000000
                 WHEN ts_us >= epoch_us(TIMESTAMP '2020-03-08 07:00:00')
                   THEN -14400000000
                 ELSE -18000000000 END AS off_us
          FROM t),
        b AS (
          SELECT o_orderkey,
            epoch_us(date_trunc('day', make_timestamp(ts_us + off_us))) AS l
          FROM d)
        SELECT make_timestamp(l -
            CASE WHEN l >= epoch_us(TIMESTAMP '2021-11-07 01:00:00')
                   THEN -18000000000
                 WHEN l >= epoch_us(TIMESTAMP '2021-03-14 03:00:00')
                   THEN -14400000000
                 WHEN l >= epoch_us(TIMESTAMP '2020-11-01 01:00:00')
                   THEN -18000000000
                 WHEN l >= epoch_us(TIMESTAMP '2020-03-08 03:00:00')
                   THEN -14400000000
                 ELSE -18000000000 END) AS day,
          COUNT(*) AS doc_count,
          CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        FROM b GROUP BY 1 ORDER BY doc_count DESC, day
      """.stripMargin.trim)),

    // function_score `exp` decay (VERDICT r11 #2): score =
    // 10⁶·decay^(d/scale) in exact ppm via the pinned-IEEE exponential
    // kernel (range-reduced degree-13 Taylor, 2ⁿ by CASE — never libm
    // exp). λ = StrictMath.log(decay)/scale is fixed on the driver
    // (fdlibm, bit-specified) and the ORACLE REPLAYS THE SAME KERNEL
    // TEXT (generated from the one pinnedExpPpmSql builder, the
    // shared-implementation gating principle): the hash gate pins
    // cross-engine bit-identity of the arithmetic; the kernel's
    // CORRECTNESS vs java.lang.Math.exp is pinned independently by
    // the PinnedExpSpec property bound (≤ 1 ppm).
    GraftQuery(
      "q342_dsl_function_score_exp",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"function_score": {
             "query": {"match_all": {}},
             "functions": [{"exp": {"n_chars": {
               "origin": 300, "scale": 200, "offset": 10,
               "decay": 0.5}}}],
             "boost_mode": "replace"}},
           "sort": [{"_score": "desc"}, "doc_id"], "size": 60,
           "_source": ["doc_id", "n_chars", "score"]}"""),
      Some {
        val lam = java.lang.Double.toString(StrictMath.log(0.5) / 200.0)
        val d = "CAST(greatest(abs(CAST(n_chars AS BIGINT) - " +
          "CAST(300 AS BIGINT)) - CAST(10 AS BIGINT), " +
          "CAST(0 AS BIGINT)) AS DOUBLE)"
        val kernel = graft.search.QueryDsl.pinnedExpPpmSql(s"($lam * $d)")
        s"""
        SELECT doc_id, n_chars, ($kernel) AS score
        FROM documents
        ORDER BY score DESC, doc_id LIMIT 60
        """.trim
      }),

    // function_score `gauss` decay (VERDICT r11 #2): score =
    // 10⁶·decay^((d/scale)²) — the same pinned kernel on λ₂·d², λ₂ =
    // StrictMath.log(decay)/scale². d² is squared in DOUBLE after the
    // integer distance (pinned one-multiply), so no Long overflow at
    // any distance. Same dual gating as q342: hash = determinism,
    // PinnedExpSpec = accuracy.
    GraftQuery(
      "q343_dsl_function_score_gauss",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"function_score": {
             "query": {"match_all": {}},
             "functions": [{"gauss": {"n_chars": {
               "origin": 250, "scale": 150,
               "decay": 0.5}}}],
             "boost_mode": "replace"}},
           "sort": [{"_score": "desc"}, "doc_id"], "size": 60,
           "_source": ["doc_id", "n_chars", "score"]}"""),
      Some {
        val lam = java.lang.Double.toString(
          StrictMath.log(0.5) / (150.0 * 150.0))
        val d = "CAST(greatest(abs(CAST(n_chars AS BIGINT) - " +
          "CAST(250 AS BIGINT)) - CAST(0 AS BIGINT), " +
          "CAST(0 AS BIGINT)) AS DOUBLE)"
        val kernel = graft.search.QueryDsl.pinnedExpPpmSql(s"($lam * ($d * $d))")
        s"""
        SELECT doc_id, n_chars, ($kernel) AS score
        FROM documents
        ORDER BY score DESC, doc_id LIMIT 60
        """.trim
      }),

    // ip_prefix over IPv6 (VERDICT r11 #3): /64 networks with
    // is_ipv6: true — the field parses through the one shared v6
    // parser (full + ::-compressed forms; junk, NULL, 7-group and
    // dotted-suffix forms all NULL out and land in no bucket, the
    // ip_range dirty-data convention), the mask applies group-wise,
    // keys render uncompressed-lowercase-hex, numeric (hi, lo) order.
    // The oracle derives each row's GROUPS from the fixture's own
    // construction — never re-running the engine's parser — so a
    // parse/render bug pair cannot cancel (the media-oracle doctrine).
    GraftQuery(
      "q344_dsl_ip_prefix_v6",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer").withColumn("ip", expr(
          """CASE CAST(c_custkey % 8 AS INT)
             WHEN 0 THEN format_string('2001:db8:%x:%x:0:0:0:%x',
               c_custkey % 4, c_custkey % 16, c_custkey % 65536)
             WHEN 1 THEN format_string('2001:db8:%x:%x::%x',
               c_custkey % 4, c_custkey % 16, c_custkey % 65536)
             WHEN 2 THEN format_string('fe80::%x', c_custkey % 256)
             WHEN 3 THEN '::1'
             WHEN 4 THEN format_string('2001:db8:%x:%x:ffff:ffff:ffff:%x',
               c_custkey % 4, c_custkey % 16, c_custkey % 65536)
             WHEN 5 THEN 'junk'
             WHEN 6 THEN NULL
             ELSE format_string('1:2:3:4:5:6:%x', c_custkey % 16) END"""))
        QueryDsl.search(c,
          """{"aggs": {"net": {"ip_prefix": {"field": "ip",
               "prefix_length": 64, "is_ipv6": true},
             "aggs": {"max_key": {"max": {"field": "c_custkey"}}}}}}""")
      },
      Some("""
        WITH t AS (SELECT c_custkey AS k FROM customer),
        v AS (
          SELECT k,
            CASE CAST(k % 8 AS INT)
              WHEN 0 THEN [8193, 3512, k % 4, k % 16]
              WHEN 1 THEN [8193, 3512, k % 4, k % 16]
              WHEN 2 THEN [65152, 0, 0, 0]
              WHEN 3 THEN [0, 0, 0, 0]
              WHEN 4 THEN [8193, 3512, k % 4, k % 16]
              ELSE NULL END AS net
          FROM t),
        g AS (
          SELECT net[1] AS g0, net[2] AS g1, net[3] AS g2, net[4] AS g3,
                 COUNT(*) AS doc_count, CAST(MAX(k) AS BIGINT) AS max_key
          FROM v WHERE net IS NOT NULL GROUP BY 1, 2, 3, 4)
        SELECT printf('%x:%x:%x:%x:0:0:0:0/64', g0, g1, g2, g3) AS net,
               doc_count, max_key
        FROM g
        ORDER BY (g0 - 32768) * 281474976710656 + g1 * 4294967296
                   + g2 * 65536 + g3
      """.stripMargin.trim)),

    // ip_range over IPv6 (VERDICT r11 #3): [from, to) buckets with
    // ::-compressed bounds parsed ON THE DRIVER to the biased
    // (hi, lo) long pair; each bucket predicate is a two-column
    // lexicographic conjunction of plain long comparisons (pushable),
    // one-pass filtered aggregates as the IPv4 arm. The oracle
    // recomputes each row's biased pair from the fixture construction
    // and replays the comparisons against the bounds' literal pairs.
    GraftQuery(
      "q345_dsl_ip_range_v6",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer").withColumn("ip", expr(
          """CASE CAST(c_custkey % 8 AS INT)
             WHEN 0 THEN format_string('2001:db8:%x:%x:0:0:0:%x',
               c_custkey % 4, c_custkey % 16, c_custkey % 65536)
             WHEN 1 THEN format_string('2001:db8:%x:%x::%x',
               c_custkey % 4, c_custkey % 16, c_custkey % 65536)
             WHEN 2 THEN format_string('fe80::%x', c_custkey % 256)
             WHEN 3 THEN '::1'
             WHEN 4 THEN format_string('2001:db8:%x:%x:ffff:ffff:ffff:%x',
               c_custkey % 4, c_custkey % 16, c_custkey % 65536)
             WHEN 5 THEN 'junk'
             WHEN 6 THEN NULL
             ELSE format_string('1:2:3:4:5:6:%x', c_custkey % 16) END"""))
        QueryDsl.search(c,
          """{"aggs": {"net": {"ip_range": {"field": "ip",
               "ranges": [{"to": "2001:db8:1::"},
                          {"from": "2001:db8:1::", "to": "2001:db8:4::"},
                          {"from": "fe80::"}]},
             "aggs": {"max_key": {"max": {"field": "c_custkey"}}}}}}""")
      },
      Some("""
        WITH t AS (SELECT c_custkey AS k FROM customer),
        v AS (
          SELECT k,
            CASE CAST(k % 8 AS INT)
              WHEN 0 THEN [8193, 3512, k % 4, k % 16, 0, 0, 0, k % 65536]
              WHEN 1 THEN [8193, 3512, k % 4, k % 16, 0, 0, 0, k % 65536]
              WHEN 2 THEN [65152, 0, 0, 0, 0, 0, 0, k % 256]
              WHEN 3 THEN [0, 0, 0, 0, 0, 0, 0, 1]
              WHEN 4 THEN [8193, 3512, k % 4, k % 16,
                           65535, 65535, 65535, k % 65536]
              ELSE NULL END AS gs
          FROM t),
        p AS (
          SELECT k,
            (gs[1] - 32768) * 281474976710656 + gs[2] * 4294967296
              + gs[3] * 65536 + gs[4] AS hi,
            (gs[5] - 32768) * 281474976710656 + gs[6] * 4294967296
              + gs[7] * 65536 + gs[8] AS lo
          FROM v WHERE gs IS NOT NULL),
        bounds AS (
          SELECT
            (8193 - 32768) * 281474976710656 + 3512 * 4294967296
              + 1 * 65536 AS b1hi,
            (0 - 32768) * 281474976710656 AS zlo,
            (8193 - 32768) * 281474976710656 + 3512 * 4294967296
              + 4 * 65536 AS b2hi,
            (65152 - 32768) * 281474976710656 AS b3hi),
        b AS (
          SELECT 0 AS ord, '*-2001:db8:1::' AS net, COUNT(*) AS doc_count,
                 CAST(MAX(k) AS BIGINT) AS max_key
          FROM p, bounds
          WHERE hi < b1hi OR (hi = b1hi AND lo < zlo)
          UNION ALL
          SELECT 1, '2001:db8:1::-2001:db8:4::', COUNT(*),
                 CAST(MAX(k) AS BIGINT)
          FROM p, bounds
          WHERE (hi > b1hi OR (hi = b1hi AND lo >= zlo))
            AND (hi < b2hi OR (hi = b2hi AND lo < zlo))
          UNION ALL
          SELECT 2, 'fe80::-*', COUNT(*), CAST(MAX(k) AS BIGINT)
          FROM p, bounds
          WHERE hi > b3hi OR (hi = b3hi AND lo >= zlo))
        SELECT net, doc_count, max_key FROM b ORDER BY ord
      """.stripMargin.trim)),

    // doc-side POLYGON geo_shape (VERDICT r11 #5): documents carry an
    // open ring array (array<struct<lat,lon>>), queried with
    // intersects vs an inline envelope — the crossing walk lifted to
    // higher-order functions over the row's ring (vertex-in-box ∨
    // box-corner-in-polygon even-odd walk ∨ edge-crosses-box), all
    // scan-stage map-only. Fixture: diamonds (rotated squares — every
    // edge diagonal, so the walk is genuinely exercised) centered on
    // a milli-degree grid with integer radii; dirty rows (NULL ring,
    // 2-vertex ring) drop. The oracle derives truth from the
    // CONSTRUCTION: a diamond is the L1 ball, so intersects(box) ⟺
    // L1 distance from center to the box-clamped point ≤ r — never
    // re-running the engine's walk (the media-oracle doctrine). Box
    // bounds carry a 4th decimal so no fixture vertex lands exactly
    // on the boundary (the q330 measure-zero rule).
    GraftQuery(
      "q347_dsl_geo_shape_doc_polygon",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 160000 AS DOUBLE) / 1000 - 80"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 340000 AS DOUBLE) / 1000 - 170"))
          .withColumn("r", expr("CAST(1 + c_custkey % 10 AS DOUBLE)"))
          .withColumn("ring", expr(
            """CASE WHEN c_custkey % 11 = 0
                 THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
               WHEN c_custkey % 13 = 0
                 THEN array(struct(CAST(1.0 AS DOUBLE) AS lat, CAST(2.0 AS DOUBLE) AS lon),
                            struct(CAST(3.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon))
               ELSE array(struct(cx + r AS lat, cy AS lon),
                          struct(cx AS lat, cy + r AS lon),
                          struct(cx - r AS lat, cy AS lon),
                          struct(cx AS lat, cy - r AS lon)) END"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "ring_field": "ring"},
               "shape": {"type": "envelope",
                 "coordinates": [[-60.0007, 40.0003], [20.0009, -35.0001]]},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 150,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 160000 AS DOUBLE) / 1000 - 80 AS cx,
                 CAST((c_custkey * 40503 + 7) % 340000 AS DOUBLE) / 1000 - 170 AS cy,
                 CAST(1 + c_custkey % 10 AS DOUBLE) AS r
          FROM customer
          WHERE c_custkey % 11 <> 0 AND c_custkey % 13 <> 0)
        SELECT c_custkey FROM t
        WHERE abs(cx - greatest(-35.0001, least(40.0003, cx)))
            + abs(cy - greatest(-60.0007, least(20.0009, cy))) <= r
        ORDER BY c_custkey
        LIMIT 150
      """.stripMargin.trim)),

    // multi-level nested, the FLAT two-hop path (VERDICT r11 #7):
    // orders ⊃ items ⊃ subs synthesized in-query; path "items.subs"
    // probes the flattened inner elements of every outer element
    // (NULL-safe flatten), score_mode sum counts matching SUBS. The
    // oracle derives the count from the generator arithmetic — for
    // order o, items i ∈ [0, o%3], subs j ∈ [0, (o+i)%4], qty =
    // (o%50)·10 + j — never re-running the engine's HOF walk.
    GraftQuery(
      "q348_dsl_nested_two_hop",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = Tables.load(s, dir, "orders").withColumn("items", expr(
          """transform(sequence(0, CAST(o_orderkey % 3 AS INT)), i -> struct(
               CAST(i AS BIGINT) AS slot,
               CASE WHEN i = 2 THEN CAST(NULL AS ARRAY<STRUCT<qty: BIGINT, idx: BIGINT>>)
                    ELSE transform(sequence(0, CAST((o_orderkey + i) % 4 AS INT)),
                      j -> struct(CAST((o_orderkey % 50) * 10 + j AS BIGINT) AS qty,
                                  CAST(j AS BIGINT) AS idx)) END AS subs))"""))
        QueryDsl.search(o,
          """{"query": {"nested": {"path": "items.subs",
               "query": {"range": {"items.subs.qty": {"gte": 312}}}}},
             "sort": [{"_score": "desc"}, "o_orderkey"], "size": 80,
             "_source": ["o_orderkey", "score"]}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
            CAST(list_sum(list_transform(range(0, CAST(o_orderkey % 3 AS INT) + 1),
              i -> CASE WHEN i = 2 THEN 0 ELSE
                list_sum(list_transform(range(0, CAST((o_orderkey + i) % 4 AS INT) + 1),
                  j -> CASE WHEN (o_orderkey % 50) * 10 + j >= 312
                       THEN 1 ELSE 0 END)) END)) AS BIGINT) AS score
          FROM orders)
        SELECT o_orderkey, score FROM t WHERE score >= 1
        ORDER BY score DESC, o_orderkey LIMIT 80
      """.stripMargin.trim)),

    // multi-level nested, the COMPOSED form (VERDICT r11 #7 +
    // inner_hits anchor): a nested clause INSIDE a nested query whose
    // path extends the enclosing one by one hop — the same-OUTER-
    // element constraint ("an items element with slot >= 1 AND one of
    // ITS OWN subs with qty >= 310") a flat two-hop path cannot
    // express. Score = matching OUTER elements. Same construction-
    // derived oracle.
    GraftQuery(
      "q349_dsl_nested_composed",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = Tables.load(s, dir, "orders").withColumn("items", expr(
          """transform(sequence(0, CAST(o_orderkey % 3 AS INT)), i -> struct(
               CAST(i AS BIGINT) AS slot,
               transform(sequence(0, CAST((o_orderkey + i) % 4 AS INT)),
                 j -> struct(CAST((o_orderkey % 50) * 10 + j AS BIGINT) AS qty,
                             CAST(j AS BIGINT) AS idx)) AS subs))"""))
        QueryDsl.search(o,
          """{"query": {"nested": {"path": "items",
               "query": {"bool": {"must": [
                 {"range": {"items.slot": {"gte": 1}}},
                 {"nested": {"path": "items.subs",
                   "query": {"range": {"items.subs.qty": {"gte": 312}}}}}]}}}},
             "sort": [{"_score": "desc"}, "o_orderkey"], "size": 80,
             "_source": ["o_orderkey", "score"]}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
            CAST(list_sum(list_transform(range(0, CAST(o_orderkey % 3 AS INT) + 1),
              i -> CASE WHEN i >= 1 AND
                list_sum(list_transform(range(0, CAST((o_orderkey + i) % 4 AS INT) + 1),
                  j -> CASE WHEN (o_orderkey % 50) * 10 + j >= 312
                       THEN 1 ELSE 0 END)) >= 1
              THEN 1 ELSE 0 END)) AS BIGINT) AS score
          FROM orders)
        SELECT o_orderkey, score FROM t WHERE score >= 1
        ORDER BY score DESC, o_orderkey LIMIT 80
      """.stripMargin.trim)),

    // field_value_factor `ln1p` (r12 — closing the "log family fails
    // loud" divergence with the exp-kernel doctrine): score =
    // floor(10⁶·ln(1 + n_chars)) via the pinned-IEEE ln kernel
    // (range-reduce to [1,2) by exact power-of-two CASE, atanh
    // series in pinned Horner order — never libm log), ppm-scaled
    // like linear/gauss/exp. The oracle replays the kernel as a
    // GENERATED CTE chain (same constants, same op order — the
    // shared-builder gating principle); accuracy vs Math.log is
    // pinned by PinnedExpSpec.
    GraftQuery(
      "q352_dsl_fvf_ln1p",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"function_score": {
             "query": {"match_all": {}},
             "functions": [{"field_value_factor": {
               "field": "n_chars", "modifier": "ln1p"}}],
             "boost_mode": "replace"}},
           "sort": [{"_score": "desc"}, "doc_id"], "size": 60,
           "_source": ["doc_id", "n_chars", "score"]}"""),
      Some {
        val ctes = graft.search.QueryDsl.pinnedLnPpmOracleCtes(
          "s", Seq("doc_id", "n_chars"))
        s"""
        WITH s AS (SELECT doc_id, n_chars, 1 + n_chars AS x FROM documents),
        $ctes
        SELECT doc_id, n_chars, ln_ppm AS score FROM __ln
        ORDER BY score DESC, doc_id LIMIT 60
        """.trim
      }),

    // field_value_factor `log1p` with a factor — the log10 arm: one
    // more pinned IEEE divide by the ln(10) literal then floor, the
    // factor multiplying the ppm value (the engine's
    // factor-outside-modifier convention, unchanged from none/sqrt).
    GraftQuery(
      "q353_dsl_fvf_log1p",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"function_score": {
             "query": {"match_all": {}},
             "functions": [{"field_value_factor": {
               "field": "n_chars", "modifier": "log1p", "factor": 3}}],
             "boost_mode": "replace"}},
           "sort": [{"_score": "desc"}, "doc_id"], "size": 60,
           "_source": ["doc_id", "n_chars", "score"]}"""),
      Some {
        val ctes = graft.search.QueryDsl.pinnedLnPpmOracleCtes(
          "s", Seq("doc_id", "n_chars"))
        s"""
        WITH s AS (SELECT doc_id, n_chars, 1 + n_chars AS x FROM documents),
        $ctes
        SELECT doc_id, n_chars,
               3 * CAST(floor(CAST(ln_ppm AS DOUBLE) / 2.302585092994046)
                 AS BIGINT) AS score
        FROM __ln
        ORDER BY score DESC, doc_id LIMIT 60
        """.trim
      }),

    // exp decay on a DATE field (r12 — the recency boost real
    // relevance tuning actually sends): origin is an ISO instant,
    // scale/offset are durations ("7d"/"1d"), everything converts to
    // exact microseconds on the driver and the SAME pinned exp kernel
    // serves the row — λ is just ~10¹¹ smaller. Distance is
    // |unix_micros(ts) − origin_us| in Long; the oracle replays the
    // kernel text with epoch_us.
    GraftQuery(
      "q354_dsl_decay_date",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "events"),
        """{"query": {"function_score": {
             "query": {"match_all": {}},
             "functions": [{"exp": {"ts": {
               "origin": "2024-01-15T00:00:00", "scale": "7d",
               "offset": "1d", "decay": 0.5}}}],
             "boost_mode": "replace"}},
           "sort": [{"_score": "desc"}, "event_id"], "size": 60,
           "_source": ["event_id", "score"]}"""),
      Some {
        val lam = java.lang.Double.toString(
          StrictMath.log(0.5) / (7.0 * 86400.0 * 1000000.0))
        val d = "CAST(greatest(abs(epoch_us(ts) - " +
          "CAST(1705276800000000 AS BIGINT)) - " +
          "CAST(86400000000 AS BIGINT), CAST(0 AS BIGINT)) AS DOUBLE)"
        val kernel = graft.search.QueryDsl.pinnedExpPpmSql(s"($lam * $d)")
        s"""
        SELECT event_id, ($kernel) AS score
        FROM events
        ORDER BY score DESC, event_id LIMIT 60
        """.trim
      }),

    // exp decay on a GEO origin (r12 — the third and last OpenSearch
    // decay origin type; numeric and date landed above): origin is
    // {lat, lon}, scale/offset are "<n>km", the distance is the
    // engine's ONE 6-dp-rounded haversine (the q125 recipe — the
    // rounding absorbs libm trig drift, same soundness as every geo
    // oracle) and the SAME pinned exp kernel maps it to ppm. "Near
    // the origin scores high" — the store-locator boost.
    GraftQuery(
      "q355_dsl_decay_geo",
      (s, dir) => {
        val pts = GeoFixtures.syntheticPoints(Tables.load(s, dir, "customer"))
        QueryDsl.search(pts,
          """{"query": {"function_score": {
               "query": {"match_all": {}},
               "functions": [{"exp": {"location": {
                 "origin": {"lat": 40.0, "lon": -74.0},
                 "scale": "3000km", "offset": "500km", "decay": 0.5,
                 "lat_field": "lat", "lon_field": "lon"}}}],
               "boost_mode": "replace"}},
             "sort": [{"_score": "desc"}, "c_custkey"], "size": 80,
             "_source": ["c_custkey", "score"]}""")
      },
      Some {
        val lam = java.lang.Double.toString(StrictMath.log(0.5) / 3000.0)
        val hav = "round(CAST(12742.0176 AS DOUBLE) * asin(sqrt(" +
          "sin((lat - 40.0) * pi() / 180.0 / 2.0) * " +
          "sin((lat - 40.0) * pi() / 180.0 / 2.0)" +
          " + cos(40.0 * pi() / 180.0) * cos(lat * pi() / 180.0)" +
          " * sin((lon - (-74.0)) * pi() / 180.0 / 2.0) * " +
          "sin((lon - (-74.0)) * pi() / 180.0 / 2.0))), 6)"
        val d = s"greatest(($hav) - 500.0, 0.0)"
        val kernel = graft.search.QueryDsl.pinnedExpPpmSql(s"($lam * ($d))")
        s"""
        WITH pts AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 180000 AS DOUBLE) / 1000.0 - 90.0 AS lat,
                 CAST((c_custkey * 40503 + 7) % 360000 AS DOUBLE) / 1000.0 - 180.0 AS lon
          FROM customer)
        SELECT c_custkey, ($kernel) AS score FROM pts
        ORDER BY score DESC, c_custkey LIMIT 80
        """.trim
      }),

    // v4-mapped IPv6 (VERDICT r12 #3): RFC 4291 §2.2 form 3 now
    // parses through the ONE shared grammar (Ipv6Parse rewrites the
    // trailing dotted quad to its two hex groups and falls through),
    // so `ip_prefix` buckets dual-stack access-log addresses —
    // ::ffff:a.b.c.d mapped, NAT64 64:ff9b::quad, plain v6 — in one
    // numeric (hi, lo) order. /112 keeps group 6 (the quad's high 16
    // bits), so nets split on the SECOND octet of the embedded v4
    // address — the mask genuinely crosses the hex/quad boundary.
    // Dirt (octet 256, leading-zero octal trap) NULLs out as before.
    // The oracle derives each row's groups from the fixture's own
    // construction (never re-running the parser — the media-oracle
    // doctrine) and renders the same uncompressed-hex key.
    GraftQuery(
      "q356_dsl_ip_prefix_v4mapped",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer").withColumn("ip", expr(
          """CASE CAST(c_custkey % 6 AS INT)
             WHEN 0 THEN format_string('::ffff:10.%d.%d.1',
               c_custkey % 4, c_custkey % 100)
             WHEN 1 THEN format_string('::FFFF:192.%d.0.%d',
               c_custkey % 8, c_custkey % 256)
             WHEN 2 THEN format_string('64:ff9b::%d.%d.7.7',
               c_custkey % 2, c_custkey % 16)
             WHEN 3 THEN format_string('2001:db8:%x::1', c_custkey % 4)
             WHEN 4 THEN '::ffff:10.0.0.256'
             ELSE format_string('::ffff:010.%d.2.3', c_custkey % 4)
             END"""))
        QueryDsl.search(c,
          """{"aggs": {"net": {"ip_prefix": {"field": "ip",
               "prefix_length": 112, "is_ipv6": true},
             "aggs": {"max_key": {"max": {"field": "c_custkey"}}}}}}""")
      },
      Some("""
        WITH t AS (SELECT c_custkey AS k FROM customer),
        v AS (
          SELECT k,
            CASE CAST(k % 6 AS INT)
              WHEN 0 THEN [0, 0, 0, 0, 0, 65535, 2560 + k % 4]
              WHEN 1 THEN [0, 0, 0, 0, 0, 65535, 49152 + k % 8]
              WHEN 2 THEN [100, 65435, 0, 0, 0, 0, (k % 2) * 256 + k % 16]
              WHEN 3 THEN [8193, 3512, k % 4, 0, 0, 0, 0]
              ELSE NULL END AS net
          FROM t),
        g AS (
          SELECT net[1] AS g0, net[2] AS g1, net[3] AS g2, net[4] AS g3,
                 net[5] AS g4, net[6] AS g5, net[7] AS g6,
                 COUNT(*) AS doc_count, CAST(MAX(k) AS BIGINT) AS max_key
          FROM v WHERE net IS NOT NULL GROUP BY 1, 2, 3, 4, 5, 6, 7)
        SELECT printf('%x:%x:%x:%x:%x:%x:%x:0/112',
                      g0, g1, g2, g3, g4, g5, g6) AS net,
               doc_count, max_key
        FROM g
        ORDER BY (g0 - 32768) * 281474976710656 + g1 * 4294967296
                   + g2 * 65536 + g3,
                 (g4 - 32768) * 281474976710656 + g5 * 4294967296
                   + g6 * 65536
      """.stripMargin.trim)),

    // v4-mapped IPv6 in ip_range BOUNDS (the driver-side strict twin
    // of q356's column parse): [from, to) buckets whose bounds are
    // written in form-3 text — the natural way to express "the v4
    // slice below 100.0.0.0" inside a v6 range agg. Rows mix mapped,
    // NAT64, plain-v6 and a between-the-buckets band; the oracle
    // recomputes every row's biased (hi, lo) pair AND the bounds'
    // pairs from construction and replays the lexicographic
    // comparisons, exactly the q345 shape.
    GraftQuery(
      "q357_dsl_ip_range_v4mapped",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer").withColumn("ip", expr(
          """CASE CAST(c_custkey % 6 AS INT)
             WHEN 0 THEN format_string('::ffff:10.%d.%d.1',
               c_custkey % 256, c_custkey % 100)
             WHEN 1 THEN format_string('::ffff:150.%d.0.%d',
               c_custkey % 256, c_custkey % 256)
             WHEN 2 THEN format_string('::ffff:250.0.%d.%d',
               c_custkey % 256, c_custkey % 100)
             WHEN 3 THEN format_string('64:ff9b::%d.%d.3.4',
               c_custkey % 128, c_custkey % 256)
             WHEN 4 THEN format_string('2001:db8::%x', c_custkey % 65536)
             ELSE '::ffff:300.1.2.3'
             END"""))
        QueryDsl.search(c,
          """{"aggs": {"net": {"ip_range": {"field": "ip",
               "ranges": [{"to": "::ffff:100.0.0.0"},
                          {"from": "::ffff:100.0.0.0",
                           "to": "::ffff:200.0.0.0"},
                          {"from": "64:ff9b::"}]},
             "aggs": {"max_key": {"max": {"field": "c_custkey"}}}}}}""")
      },
      Some("""
        WITH t AS (SELECT c_custkey AS k FROM customer),
        v AS (
          SELECT k,
            CASE CAST(k % 6 AS INT)
              WHEN 0 THEN [0, 0, 0, 0, 0, 65535,
                           2560 + k % 256, (k % 100) * 256 + 1]
              WHEN 1 THEN [0, 0, 0, 0, 0, 65535,
                           38400 + k % 256, k % 256]
              WHEN 2 THEN [0, 0, 0, 0, 0, 65535,
                           64000, (k % 256) * 256 + k % 100]
              WHEN 3 THEN [100, 65435, 0, 0, 0, 0,
                           (k % 128) * 256 + k % 256, 772]
              WHEN 4 THEN [8193, 3512, 0, 0, 0, 0, 0, k % 65536]
              ELSE NULL END AS gs
          FROM t),
        p AS (
          SELECT k,
            (gs[1] - 32768) * 281474976710656 + gs[2] * 4294967296
              + gs[3] * 65536 + gs[4] AS hi,
            (gs[5] - 32768) * 281474976710656 + gs[6] * 4294967296
              + gs[7] * 65536 + gs[8] AS lo
          FROM v WHERE gs IS NOT NULL),
        bounds AS (
          SELECT
            (0 - 32768) * 281474976710656 AS mhi,
            (0 - 32768) * 281474976710656 + 65535 * 4294967296
              + 25600 * CAST(65536 AS BIGINT) AS b1lo,
            (0 - 32768) * 281474976710656 + 65535 * 4294967296
              + 51200 * CAST(65536 AS BIGINT) AS b2lo,
            (100 - 32768) * 281474976710656 + 65435 * 4294967296 AS b3hi,
            (0 - 32768) * 281474976710656 AS zlo),
        b AS (
          SELECT 0 AS ord, '*-::ffff:100.0.0.0' AS net,
                 COUNT(*) AS doc_count, CAST(MAX(k) AS BIGINT) AS max_key
          FROM p, bounds
          WHERE hi < mhi OR (hi = mhi AND lo < b1lo)
          UNION ALL
          SELECT 1, '::ffff:100.0.0.0-::ffff:200.0.0.0', COUNT(*),
                 CAST(MAX(k) AS BIGINT)
          FROM p, bounds
          WHERE (hi > mhi OR (hi = mhi AND lo >= b1lo))
            AND (hi < mhi OR (hi = mhi AND lo < b2lo))
          UNION ALL
          SELECT 2, '64:ff9b::-*', COUNT(*), CAST(MAX(k) AS BIGINT)
          FROM p, bounds
          WHERE hi > b3hi OR (hi = b3hi AND lo >= zlo))
        SELECT net, doc_count, max_key FROM b ORDER BY ord
      """.stripMargin.trim)),

    // geo_shape doc-polygon relation CONTAINS vs a point query (r13,
    // VERDICT r12 #2): "which delivery zones contain this point" —
    // the even-odd walk with the roles swapped (ring in columns,
    // point constant). Fixture: the q347 diamonds; the oracle derives
    // truth from the construction (a diamond is the L1 ball, so
    // contains(P) ⟺ L1(center, P) < r — the 4th-decimal query point
    // never lands exactly on a milli-degree-grid boundary, the q330
    // measure-zero rule).
    GraftQuery(
      "q358_dsl_geo_shape_doc_contains_point",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("r", expr("CAST(1 + c_custkey % 10 AS DOUBLE)"))
          .withColumn("ring", expr(
            """CASE WHEN c_custkey % 11 = 0
                 THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
               WHEN c_custkey % 13 = 0
                 THEN array(struct(CAST(1.0 AS DOUBLE) AS lat, CAST(2.0 AS DOUBLE) AS lon),
                            struct(CAST(3.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon))
               ELSE array(struct(cx + r AS lat, cy AS lon),
                          struct(cx AS lat, cy + r AS lon),
                          struct(cx - r AS lat, cy AS lon),
                          struct(cx AS lat, cy - r AS lon)) END"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "ring_field": "ring"},
               "shape": {"type": "point", "coordinates": [-2.0007, 0.0003]},
               "relation": "contains"}},
             "sort": ["c_custkey"], "size": 200,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(1 + c_custkey % 10 AS DOUBLE) AS r
          FROM customer
          WHERE c_custkey % 11 <> 0 AND c_custkey % 13 <> 0)
        SELECT c_custkey FROM t
        WHERE abs(cx - 0.0003) + abs(cy - (-2.0007)) < r
        ORDER BY c_custkey
        LIMIT 200
      """.stripMargin.trim)),

    // geo_shape doc-polygon CONTAINS vs a box query (r13, VERDICT r12
    // #2, the second arm): ring ⊇ envelope ⟺ every box corner inside
    // the ring ∧ no ring edge touches the box. Construction truth:
    // the convex diamond contains the box ⟺ all four corners are
    // strictly within L1 radius r of the center (convexity makes
    // corners-in sufficient; the engine's extra no-edge-cross
    // conjunct is then automatically false). Same measure-zero
    // 4th-decimal bounds.
    GraftQuery(
      "q359_dsl_geo_shape_doc_contains_box",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("r", expr("CAST(1 + c_custkey % 10 AS DOUBLE)"))
          .withColumn("ring", expr(
            """array(struct(cx + r AS lat, cy AS lon),
                     struct(cx AS lat, cy + r AS lon),
                     struct(cx - r AS lat, cy AS lon),
                     struct(cx AS lat, cy - r AS lon))"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "ring_field": "ring"},
               "shape": {"type": "envelope",
                 "coordinates": [[-2.0007, 1.0009], [-1.0001, 0.0003]]},
               "relation": "contains"}},
             "sort": ["c_custkey"], "size": 200,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(1 + c_custkey % 10 AS DOUBLE) AS r
          FROM customer)
        SELECT c_custkey FROM t
        WHERE abs(cx - 0.0003) + abs(cy - (-2.0007)) < r
          AND abs(cx - 0.0003) + abs(cy - (-1.0001)) < r
          AND abs(cx - 1.0009) + abs(cy - (-2.0007)) < r
          AND abs(cx - 1.0009) + abs(cy - (-1.0001)) < r
        ORDER BY c_custkey
        LIMIT 200
      """.stripMargin.trim)),

    // geo_shape doc-polygon WITHIN vs a CONCAVE query polygon (r13,
    // VERDICT r12 #5): a notched rectangle — rect minus a 45°-edged
    // V-notch cut from the top edge, apex (-20.0003, 10.0001). The
    // engine runs the general machinery (all doc vertices inside the
    // query ring by the even-odd walk ∧ no doc edge properly crossing
    // a query edge). The ORACLE never replays that walk: in rotated
    // coordinates u = lat+lon, w = lat−lon the 45° notch wedge is the
    // quarter-plane {u > uA, w > wA} and the L1-ball diamond is the
    // axis-aligned square [cu±r]×[cw±r], so diamond-within-chevron ⟺
    // diamond strictly inside the rect ∧ the square misses the
    // quarter-plane — product-set algebra, pure construction. All
    // chevron coordinates carry 4th decimals (measure-zero rule).
    GraftQuery(
      "q360_dsl_geo_shape_doc_within_concave",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 160000 AS DOUBLE) / 1000 - 80"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 340000 AS DOUBLE) / 1000 - 170"))
          .withColumn("r", expr("CAST(1 + c_custkey % 10 AS DOUBLE)"))
          .withColumn("ring", expr(
            """array(struct(cx + r AS lat, cy AS lon),
                     struct(cx AS lat, cy + r AS lon),
                     struct(cx - r AS lat, cy AS lon),
                     struct(cx AS lat, cy - r AS lon))"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "ring_field": "ring"},
               "shape": {"type": "polygon", "coordinates":
                 [[[-150.0007, -70.0001], [150.0009, -70.0001],
                   [150.0009, 50.0003], [80.0007, 50.0003],
                   [10.0001, -20.0003], [-60.0005, 50.0003],
                   [-150.0007, 50.0003], [-150.0007, -70.0001]]]},
               "relation": "within"}},
             "sort": ["c_custkey"], "size": 300,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 160000 AS DOUBLE) / 1000 - 80 AS cx,
                 CAST((c_custkey * 40503 + 7) % 340000 AS DOUBLE) / 1000 - 170 AS cy,
                 CAST(1 + c_custkey % 10 AS DOUBLE) AS r
          FROM customer)
        SELECT c_custkey FROM t
        WHERE cx - r > -70.0001 AND cx + r < 50.0003
          AND cy - r > -150.0007 AND cy + r < 150.0009
          AND NOT ((cx + cy) + r > (-20.0003 + 10.0001)
               AND (cx - cy) + r > (-20.0003 - 10.0001))
        ORDER BY c_custkey
        LIMIT 300
      """.stripMargin.trim)),

    // date_histogram with min_doc_count: 0 (dense empty-bucket fill)
    // UNDER a NAMED time_zone (VERDICT r12 #1 — the Kibana-default
    // dashboard request: calendar day + zone + dense fill in ONE
    // request). Keys have no constant UTC step across a DST
    // transition, so the series is iterated in LOCAL wall time ON THE
    // DRIVER (localDenseKeys) into literal UTC keys. Fixture: q341's
    // 2021 timestamp recipe but SPARSE — day index (key % 24) · 11
    // lands 24 distinct days, 11 apart, from Mar 1 to Nov 9, crossing
    // BOTH 2021 US DST boundaries; the dense series emits every local
    // day between (≈254 buckets, ~230 empty with doc_count 0 and a
    // NULL sub-agg). The oracle replays the resolved transition table
    // term for term (q341's five entries) and generates the local-day
    // series with generate_series, mapping each local midnight to its
    // UTC key with the boundary-offset rule — the transition days stay
    // single 23h/25h buckets.
    GraftQuery(
      "q361_dsl_date_histogram_dense_named_tz",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val base = 1614556800000000L // 2021-03-01T00:00:00Z micros
        val o = Tables.load(s, dir, "orders").select(
          col("o_orderkey"),
          timestamp_micros(lit(base)
            + (col("o_orderkey") % lit(24L)) * lit(11L) * lit(86400000000L)
            + (col("o_orderkey") % lit(86400L)) * lit(1000000L)).as("ts"))
        QueryDsl.search(o,
          """{"size": 0,
             "aggs": {"day": {"date_histogram":
                 {"field": "ts", "calendar_interval": "day",
                  "time_zone": "America/New_York", "min_doc_count": 0},
               "aggs": {"max_key": {"max": {"field": "o_orderkey"}}}}}}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
            1614556800000000 + (o_orderkey % 24) * 11 * 86400000000
              + (o_orderkey % 86400) * 1000000 AS ts_us
          FROM orders),
        d AS (
          SELECT o_orderkey, ts_us,
            CASE WHEN ts_us >= epoch_us(TIMESTAMP '2021-11-07 06:00:00')
                   THEN -18000000000
                 WHEN ts_us >= epoch_us(TIMESTAMP '2021-03-14 07:00:00')
                   THEN -14400000000
                 WHEN ts_us >= epoch_us(TIMESTAMP '2020-11-01 06:00:00')
                   THEN -18000000000
                 WHEN ts_us >= epoch_us(TIMESTAMP '2020-03-08 07:00:00')
                   THEN -14400000000
                 ELSE -18000000000 END AS off_us
          FROM t),
        b AS (
          SELECT o_orderkey,
            epoch_us(date_trunc('day', make_timestamp(ts_us + off_us))) AS l
          FROM d),
        g AS (
          SELECT l, COUNT(*) AS doc_count, MAX(o_orderkey) AS max_key
          FROM b GROUP BY 1),
        span AS (SELECT min(l) AS lo, max(l) AS hi FROM b),
        series AS (
          SELECT epoch_us(unnest(generate_series(
            make_timestamp(lo), make_timestamp(hi), INTERVAL 1 DAY))) AS l
          FROM span),
        j AS (
          SELECT series.l AS l, COALESCE(g.doc_count, 0) AS doc_count,
                 g.max_key
          FROM series LEFT JOIN g ON series.l = g.l)
        SELECT make_timestamp(l -
            CASE WHEN l >= epoch_us(TIMESTAMP '2021-11-07 01:00:00')
                   THEN -18000000000
                 WHEN l >= epoch_us(TIMESTAMP '2021-03-14 03:00:00')
                   THEN -14400000000
                 WHEN l >= epoch_us(TIMESTAMP '2020-11-01 01:00:00')
                   THEN -18000000000
                 WHEN l >= epoch_us(TIMESTAMP '2020-03-08 03:00:00')
                   THEN -14400000000
                 ELSE -18000000000 END) AS day,
          doc_count, CAST(max_key AS BIGINT) AS max_key
        FROM j ORDER BY doc_count DESC, day
      """.stripMargin.trim)),

    // hourly dense fill ACROSS the spring-forward gap, with a
    // transitions-object time_zone and extended_bounds (VERDICT r12
    // #1, the fixed_interval × varying-offset quadrant): local hour
    // 02:00 on 2021-03-14 does not exist — the driver iteration lands
    // its boundary on the pre-transition offset, colliding with local
    // 03:00's key, and the series DEDUPLICATES onto the one real
    // bucket (never a phantom row, matching the per-doc mapping which
    // cannot produce it). extended_bounds pushes empty buckets beyond
    // the data on both sides; the series spans the bounds, not the
    // data. The oracle generates local hours, maps each to its UTC key
    // with the boundary rule, and takes DISTINCT keys.
    GraftQuery(
      "q362_dsl_date_histogram_dense_hour_gap",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val base = 1615658400000000L // 2021-03-13T18:00:00Z micros
        val o = Tables.load(s, dir, "orders").select(
          col("o_orderkey"),
          timestamp_micros(lit(base)
            + (col("o_orderkey") % lit(6L)) * lit(14400000000L)
            + (col("o_orderkey") % lit(1800L)) * lit(1000000L)).as("ts"))
        QueryDsl.search(o,
          """{"size": 0,
             "aggs": {"hour": {"date_histogram":
                 {"field": "ts", "fixed_interval": "1h",
                  "time_zone": {"transitions": [
                    ["2020-11-01T06:00:00", -300],
                    ["2021-03-14T07:00:00", -240]]},
                  "min_doc_count": 0,
                  "extended_bounds": {"min": "2021-03-13T12:00:00",
                                      "max": "2021-03-15T00:00:00"}}}}}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
            1615658400000000 + (o_orderkey % 6) * 14400000000
              + (o_orderkey % 1800) * 1000000 AS ts_us
          FROM orders),
        d AS (
          SELECT ts_us,
            CASE WHEN ts_us >= epoch_us(TIMESTAMP '2021-03-14 07:00:00')
                   THEN -14400000000
                 ELSE -18000000000 END AS off_us
          FROM t),
        g AS (
          SELECT (ts_us + off_us) - ((ts_us + off_us) % 3600000000) AS l,
                 COUNT(*) AS doc_count
          FROM d GROUP BY 1),
        bnds AS (
          SELECT epoch_us(TIMESTAMP '2021-03-13 12:00:00') AS blo,
                 epoch_us(TIMESTAMP '2021-03-15 00:00:00') AS bhi),
        span AS (
          SELECT (blo - 18000000000) - ((blo - 18000000000) % 3600000000) AS lo,
                 (bhi - 14400000000) - ((bhi - 14400000000) % 3600000000) AS hi
          FROM bnds),
        series AS (
          SELECT DISTINCT l - CASE
              WHEN l >= epoch_us(TIMESTAMP '2021-03-14 03:00:00')
                THEN -14400000000 ELSE -18000000000 END AS k
          FROM (SELECT epoch_us(unnest(generate_series(
                  make_timestamp(lo), make_timestamp(hi),
                  INTERVAL 1 HOUR))) AS l FROM span)),
        gk AS (
          SELECT l - CASE
              WHEN l >= epoch_us(TIMESTAMP '2021-03-14 03:00:00')
                THEN -14400000000 ELSE -18000000000 END AS k,
            doc_count
          FROM g)
        SELECT make_timestamp(series.k) AS hour,
               COALESCE(gk.doc_count, 0) AS doc_count
        FROM series LEFT JOIN gk ON series.k = gk.k
        ORDER BY doc_count DESC, hour
      """.stripMargin.trim)),

    // auto_date_histogram UNDER a named time_zone (VERDICT r12 #7):
    // the zone flows through the SAME parseDhTimeZone grammar and
    // local-truncate/boundary-unmap bucketing as date_histogram, and
    // the auto-sizing counts buckets over the LOCAL span. Fixture: 20
    // UTC days starting 2021-03-05 — the local (America/New_York)
    // span is 21 days (the first instant lands on Mar 4 local), well
    // under the 40-bucket target, so `day` is chosen and the
    // spring-forward boundary (Mar 14) sits inside the bucketed
    // range. The oracle replays the resolved 4-entry transition table
    // (the 400-day pad reaches Jan 2020; the window stops before Nov
    // 2021) and emits the literal chosen interval.
    GraftQuery(
      "q363_dsl_auto_date_histogram_named_tz",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val base = 1614902400000000L // 2021-03-05T00:00:00Z micros
        val o = Tables.load(s, dir, "orders").select(
          col("o_orderkey"),
          timestamp_micros(lit(base)
            + (col("o_orderkey") % lit(20L)) * lit(86400000000L)
            + (col("o_orderkey") % lit(86400L)) * lit(1000000L)).as("ts"))
        QueryDsl.search(o,
          """{"size": 0,
             "aggs": {"d": {"auto_date_histogram":
               {"field": "ts", "buckets": 40,
                "time_zone": "America/New_York"}}}}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
            1614902400000000 + (o_orderkey % 20) * 86400000000
              + (o_orderkey % 86400) * 1000000 AS ts_us
          FROM orders),
        dd AS (
          SELECT ts_us,
            CASE WHEN ts_us >= epoch_us(TIMESTAMP '2021-03-14 07:00:00')
                   THEN -14400000000
                 WHEN ts_us >= epoch_us(TIMESTAMP '2020-11-01 06:00:00')
                   THEN -18000000000
                 WHEN ts_us >= epoch_us(TIMESTAMP '2020-03-08 07:00:00')
                   THEN -14400000000
                 ELSE -18000000000 END AS off_us
          FROM t),
        b AS (
          SELECT epoch_us(date_trunc('day', make_timestamp(ts_us + off_us))) AS l
          FROM dd)
        SELECT make_timestamp(l -
            CASE WHEN l >= epoch_us(TIMESTAMP '2021-03-14 03:00:00')
                   THEN -14400000000
                 WHEN l >= epoch_us(TIMESTAMP '2020-11-01 01:00:00')
                   THEN -18000000000
                 WHEN l >= epoch_us(TIMESTAMP '2020-03-08 03:00:00')
                   THEN -14400000000
                 ELSE -18000000000 END) AS d,
          COUNT(*) AS doc_count, 'day' AS "interval"
        FROM b GROUP BY 1 ORDER BY d
      """.stripMargin.trim)),

    // doc_shape `on_invalid: "dlq"` (VERDICT r12 #4 — the reference's
    // per-record-poison doctrine, S6): the q358 diamond fixture with
    // POISON injected by construction — a self-intersecting bowtie
    // (the diamond with two vertices swapped, key % 7) and a
    // 16391-vertex ring past the 16384 cap (key % 17). Default mode raises on
    // the first poison row; with on_invalid: dlq the query PROCEEDS
    // and its answer equals the clean-subset oracle (poison rows
    // drop like the tri-state convention; NULL/short rings were
    // already drops, not poison).
    GraftQuery(
      "q364_dsl_geo_shape_dlq_mode",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("r", expr("CAST(1 + c_custkey % 10 AS DOUBLE)"))
          .withColumn("ring", expr(
            """CASE WHEN c_custkey % 11 = 0
                 THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
               WHEN c_custkey % 13 = 0
                 THEN array(struct(CAST(1.0 AS DOUBLE) AS lat, CAST(2.0 AS DOUBLE) AS lon),
                            struct(CAST(3.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon))
               WHEN c_custkey % 17 = 0
                 THEN transform(sequence(0, 16390),
                        i -> struct(CAST(i AS DOUBLE) AS lat,
                                    CAST(i * i AS DOUBLE) AS lon))
               WHEN c_custkey % 7 = 0
                 THEN array(struct(cx + r AS lat, cy AS lon),
                            struct(cx - r AS lat, cy AS lon),
                            struct(cx AS lat, cy + r AS lon),
                            struct(cx AS lat, cy - r AS lon))
               ELSE array(struct(cx + r AS lat, cy AS lon),
                          struct(cx AS lat, cy + r AS lon),
                          struct(cx - r AS lat, cy AS lon),
                          struct(cx AS lat, cy - r AS lon)) END"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "ring_field": "ring",
                             "on_invalid": "dlq"},
               "shape": {"type": "point", "coordinates": [-2.0007, 0.0003]},
               "relation": "contains"}},
             "sort": ["c_custkey"], "size": 200,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(1 + c_custkey % 10 AS DOUBLE) AS r
          FROM customer
          WHERE c_custkey % 11 <> 0 AND c_custkey % 13 <> 0
            AND c_custkey % 17 <> 0 AND c_custkey % 7 <> 0)
        SELECT c_custkey FROM t
        WHERE abs(cx - 0.0003) + abs(cy - (-2.0007)) < r
        ORDER BY c_custkey
        LIMIT 200
      """.stripMargin.trim)),

    // the DLQ side-output itself (geoShapeDlq — the counted
    // diagnostic): exactly the poison rows, tagged with their reason.
    // Truth from construction: % 17 rings (minus the higher-priority
    // NULL/short arms) exceed the 16384-vertex kernel cap; % 7 rings
    // are the bowtie. NULL and 2-vertex rings are drops, NOT poison — they
    // must not appear.
    GraftQuery(
      "q365_dsl_geo_shape_dlq_rows",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, expr}
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("r", expr("CAST(1 + c_custkey % 10 AS DOUBLE)"))
          .withColumn("ring", expr(
            """CASE WHEN c_custkey % 11 = 0
                 THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
               WHEN c_custkey % 13 = 0
                 THEN array(struct(CAST(1.0 AS DOUBLE) AS lat, CAST(2.0 AS DOUBLE) AS lon),
                            struct(CAST(3.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon))
               WHEN c_custkey % 17 = 0
                 THEN transform(sequence(0, 16390),
                        i -> struct(CAST(i AS DOUBLE) AS lat,
                                    CAST(i * i AS DOUBLE) AS lon))
               WHEN c_custkey % 7 = 0
                 THEN array(struct(cx + r AS lat, cy AS lon),
                            struct(cx - r AS lat, cy AS lon),
                            struct(cx AS lat, cy + r AS lon),
                            struct(cx AS lat, cy - r AS lon))
               ELSE array(struct(cx + r AS lat, cy AS lon),
                          struct(cx AS lat, cy + r AS lon),
                          struct(cx - r AS lat, cy AS lon),
                          struct(cx AS lat, cy - r AS lon)) END"""))
        QueryDsl.geoShapeDlq(c, "ring")
          .select(col("c_custkey"), col("_reason"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey,
          CASE WHEN c_custkey % 17 = 0 THEN 'too_many_vertices'
               ELSE 'self_intersecting' END AS _reason
        FROM customer
        WHERE c_custkey % 11 <> 0 AND c_custkey % 13 <> 0
          AND (c_custkey % 17 = 0 OR c_custkey % 7 = 0)
        ORDER BY c_custkey
      """.stripMargin.trim)),

    // flat THREE-hop nested path (VERDICT r12 #6): a synthesized
    // 3-level array-of-structs fixture over orders — outer a[i∈0..1],
    // mid[j∈0..1] (NULL when (key+i) % 5 = 0, exercising the per-level
    // NULL-skip rule), subs[k∈0..2] with qty = (key·7 + 5i + 3j + k)
    // % 100. The leaf probe flattens through both inner levels with
    // one transform/drop-NULL/flatten layer per hop — still pure
    // scan-stage codegen, no explode, no join. Truth from the
    // construction: ∃ i,j,k with the mid arm non-NULL and qty ≥ 97.
    GraftQuery(
      "q366_dsl_nested_three_hop",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = Tables.load(s, dir, "orders")
          .withColumn("a", expr(
            """transform(sequence(0, 1), i -> struct(
                 CAST(i AS BIGINT) AS slot,
                 IF((o_orderkey + i) % 5 = 0,
                    CAST(NULL AS ARRAY<STRUCT<subs: ARRAY<STRUCT<qty: BIGINT>>>>),
                    transform(sequence(0, 1), j -> struct(
                      transform(sequence(0, 2), k -> struct(
                        CAST((o_orderkey * 7 + i * 5 + j * 3 + k) % 100
                          AS BIGINT) AS qty)) AS subs))) AS mid))"""))
        QueryDsl.search(o,
          """{"query": {"nested": {"path": "a.mid.subs",
               "query": {"range": {"a.mid.subs.qty": {"gte": 97}}}}},
             "sort": ["o_orderkey"], "size": 300,
             "_source": ["o_orderkey"]}""")
      },
      Some("""
        SELECT o_orderkey FROM orders
        WHERE EXISTS (
          SELECT 1 FROM range(0, 2) t1(i), range(0, 2) t2(j), range(0, 3) t3(k)
          WHERE (o_orderkey + i) % 5 <> 0
            AND (o_orderkey * 7 + i * 5 + j * 3 + k) % 100 >= 97)
        ORDER BY o_orderkey
        LIMIT 300
      """.stripMargin.trim)),

    // the COMPOSED-extension form at three levels (VERDICT r12 #6):
    // nested-in-nested-in-nested — "an outer element with slot ≥ 1
    // whose OWN mid has a subs element with qty ≥ 97" — the
    // same-outer-element constraint a flat 3-hop path cannot express
    // (a flat probe would let doc-level matches leak across outer
    // elements). Same fixture; truth restricts to i = 1.
    GraftQuery(
      "q367_dsl_nested_composed_three_level",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = Tables.load(s, dir, "orders")
          .withColumn("a", expr(
            """transform(sequence(0, 1), i -> struct(
                 CAST(i AS BIGINT) AS slot,
                 IF((o_orderkey + i) % 5 = 0,
                    CAST(NULL AS ARRAY<STRUCT<subs: ARRAY<STRUCT<qty: BIGINT>>>>),
                    transform(sequence(0, 1), j -> struct(
                      transform(sequence(0, 2), k -> struct(
                        CAST((o_orderkey * 7 + i * 5 + j * 3 + k) % 100
                          AS BIGINT) AS qty)) AS subs))) AS mid))"""))
        QueryDsl.search(o,
          """{"query": {"nested": {"path": "a",
               "query": {"bool": {"must": [
                 {"range": {"a.slot": {"gte": 1}}},
                 {"nested": {"path": "a.mid",
                   "query": {"nested": {"path": "a.mid.subs",
                     "query": {"range": {"a.mid.subs.qty": {"gte": 97}}}}}}}]}}}},
             "sort": ["o_orderkey"], "size": 300,
             "_source": ["o_orderkey"]}""")
      },
      Some("""
        SELECT o_orderkey FROM orders
        WHERE (o_orderkey + 1) % 5 <> 0 AND EXISTS (
          SELECT 1 FROM range(0, 2) t2(j), range(0, 3) t3(k)
          WHERE (o_orderkey * 7 + 5 + j * 3 + k) % 100 >= 97)
        ORDER BY o_orderkey
        LIMIT 300
      """.stripMargin.trim)),

    // MULTI-RING doc_shape (polygon with a hole, r13): each customer
    // carries a square FRAME — shell side 2R, hole side 2h = R —
    // centered per the q358 hash recipe. contains(P) runs the
    // even-odd walk over the flattened edge list of BOTH rings;
    // parity across shell + hole is exactly shell-minus-hole
    // membership. Truth from construction: Chebyshev distance from
    // the center strictly between h and R (4th-decimal query point,
    // measure-zero rule).
    GraftQuery(
      "q368_dsl_geo_shape_rings_contains_point",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("rr", expr("CAST(2 + c_custkey % 8 AS DOUBLE)"))
          .withColumn("h", expr("rr / 2"))
          .withColumn("rings", expr(
            """array(
                 array(struct(cx - rr AS lat, cy - rr AS lon),
                       struct(cx - rr AS lat, cy + rr AS lon),
                       struct(cx + rr AS lat, cy + rr AS lon),
                       struct(cx + rr AS lat, cy - rr AS lon)),
                 array(struct(cx - h AS lat, cy - h AS lon),
                       struct(cx - h AS lat, cy + h AS lon),
                       struct(cx + h AS lat, cy + h AS lon),
                       struct(cx + h AS lat, cy - h AS lon)))"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "rings_field": "rings"},
               "shape": {"type": "point", "coordinates": [-2.0007, 0.5003]},
               "relation": "contains"}},
             "sort": ["c_custkey"], "size": 200,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(2 + c_custkey % 8 AS DOUBLE) AS rr
          FROM customer)
        SELECT c_custkey FROM t
        WHERE greatest(abs(0.5003 - cx), abs(-2.0007 - cy)) < rr
          AND greatest(abs(0.5003 - cx), abs(-2.0007 - cy)) > rr / 2
        ORDER BY c_custkey
        LIMIT 200
      """.stripMargin.trim)),

    // MULTI-RING intersects vs a box (r13): box ∩ frame ≠ ∅ ⟺ the
    // box overlaps the shell square AND is not strictly inside the
    // open hole — exact for a connected box against a closed frame
    // (leaving the hole crosses the hole boundary, which belongs to
    // the frame). The engine sees none of that algebra: it runs
    // vertex-in-box ∨ corner-parity ∨ edge-cross over the flattened
    // edges; the oracle replays only the construction.
    GraftQuery(
      "q369_dsl_geo_shape_rings_intersects_box",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("rr", expr("CAST(2 + c_custkey % 8 AS DOUBLE)"))
          .withColumn("h", expr("rr / 2"))
          .withColumn("rings", expr(
            """array(
                 array(struct(cx - rr AS lat, cy - rr AS lon),
                       struct(cx - rr AS lat, cy + rr AS lon),
                       struct(cx + rr AS lat, cy + rr AS lon),
                       struct(cx + rr AS lat, cy - rr AS lon)),
                 array(struct(cx - h AS lat, cy - h AS lon),
                       struct(cx - h AS lat, cy + h AS lon),
                       struct(cx + h AS lat, cy + h AS lon),
                       struct(cx + h AS lat, cy - h AS lon)))"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "rings_field": "rings"},
               "shape": {"type": "envelope",
                 "coordinates": [[-6.0003, 5.0009], [2.0001, -1.0007]]},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 300,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(2 + c_custkey % 8 AS DOUBLE) AS rr
          FROM customer)
        SELECT c_custkey FROM t
        WHERE cx - rr <= 5.0009 AND cx + rr >= -1.0007
          AND cy - rr <= 2.0001 AND cy + rr >= -6.0003
          AND NOT (cx - rr / 2 < -1.0007 AND cx + rr / 2 > 5.0009
               AND cy - rr / 2 < -6.0003 AND cy + rr / 2 > 2.0001)
        ORDER BY c_custkey
        LIMIT 300
      """.stripMargin.trim)),

    // LINESTRING doc_shape (r13): each customer carries an L-shaped
    // route — a lat leg then a lon leg — so segment-vs-box truth is
    // pure interval algebra the oracle replays from construction,
    // while the engine runs the general segment-AABB separating-axes
    // walk (bbox overlap ∧ corners not strictly one-sided). The box
    // catches lines whose legs pass THROUGH it with no vertex inside.
    GraftQuery(
      "q370_dsl_geo_shape_line_intersects_box",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("x0", expr(
            "CAST((c_custkey * 2654435761) % 14000 AS DOUBLE) / 1000 - 7"))
          .withColumn("y0", expr(
            "CAST((c_custkey * 40503 + 7) % 30000 AS DOUBLE) / 1000 - 15"))
          .withColumn("len", expr("CAST(1 + c_custkey % 9 AS DOUBLE)"))
          .withColumn("path", expr(
            """array(struct(x0 AS lat, y0 AS lon),
                     struct(x0 + len AS lat, y0 AS lon),
                     struct(x0 + len AS lat, y0 + len AS lon))"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "linestring", "line_field": "path"},
               "shape": {"type": "envelope",
                 "coordinates": [[-4.0003, 3.0001], [1.0009, -2.0007]]},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 300,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 14000 AS DOUBLE) / 1000 - 7 AS x0,
                 CAST((c_custkey * 40503 + 7) % 30000 AS DOUBLE) / 1000 - 15 AS y0,
                 CAST(1 + c_custkey % 9 AS DOUBLE) AS len
          FROM customer)
        SELECT c_custkey FROM t
        WHERE (y0 >= -4.0003 AND y0 <= 1.0009
               AND x0 <= 3.0001 AND x0 + len >= -2.0007)
           OR (x0 + len >= -2.0007 AND x0 + len <= 3.0001
               AND y0 <= 1.0009 AND y0 + len >= -4.0003)
        ORDER BY c_custkey
        LIMIT 300
      """.stripMargin.trim)),

    // LINESTRING within a box (r13): every vertex inside — for the
    // L-shape the three corners reduce to the two extreme ones, pure
    // bound algebra in the oracle.
    GraftQuery(
      "q371_dsl_geo_shape_line_within_box",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("x0", expr(
            "CAST((c_custkey * 2654435761) % 14000 AS DOUBLE) / 1000 - 7"))
          .withColumn("y0", expr(
            "CAST((c_custkey * 40503 + 7) % 30000 AS DOUBLE) / 1000 - 15"))
          .withColumn("len", expr("CAST(1 + c_custkey % 9 AS DOUBLE)"))
          .withColumn("path", expr(
            """array(struct(x0 AS lat, y0 AS lon),
                     struct(x0 + len AS lat, y0 AS lon),
                     struct(x0 + len AS lat, y0 + len AS lon))"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "linestring", "line_field": "path"},
               "shape": {"type": "envelope",
                 "coordinates": [[-12.0003, 8.0009], [9.0001, -5.0007]]},
               "relation": "within"}},
             "sort": ["c_custkey"], "size": 300,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 14000 AS DOUBLE) / 1000 - 7 AS x0,
                 CAST((c_custkey * 40503 + 7) % 30000 AS DOUBLE) / 1000 - 15 AS y0,
                 CAST(1 + c_custkey % 9 AS DOUBLE) AS len
          FROM customer)
        SELECT c_custkey FROM t
        WHERE x0 >= -5.0007 AND x0 + len <= 8.0009
          AND y0 >= -12.0003 AND y0 + len <= 9.0001
        ORDER BY c_custkey
        LIMIT 300
      """.stripMargin.trim)),

    // QUERY-side polygon WITH HOLES over point docs (r13): GeoJSON
    // ring 0 is the shell, ring 1 a hole — membership is ONE even-odd
    // parity sum across both rings' edges (a point inside both
    // crosses two boundaries on the +lon ray: even, out). Axis-
    // aligned rectangles keep the oracle pure interval algebra;
    // 4th-decimal bounds vs the 3-decimal point lattice keep
    // boundary hits measure-zero.
    GraftQuery(
      "q372_dsl_geo_shape_query_polygon_hole",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("plat", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("plon", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "lat_field": "plat", "lon_field": "plon",
               "shape": {"type": "polygon", "coordinates": [
                 [[-6.0003, -6.0007], [6.0003, -6.0007], [6.0003, 6.0007],
                  [-6.0003, 6.0007], [-6.0003, -6.0007]],
                 [[-2.0009, -2.0001], [2.0009, -2.0001], [2.0009, 2.0001],
                  [-2.0009, 2.0001], [-2.0009, -2.0001]]]},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 300,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS plat,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS plon
          FROM customer)
        SELECT c_custkey FROM t
        WHERE plat > -6.0007 AND plat < 6.0007
          AND plon > -6.0003 AND plon < 6.0003
          AND NOT (plat > -2.0001 AND plat < 2.0001
               AND plon > -2.0009 AND plon < 2.0009)
        ORDER BY c_custkey
        LIMIT 300
      """.stripMargin.trim)),

    // MULTIPOLYGON query shape over point docs (r13): two disjoint
    // zones in one request — a holed rectangle plus a plain convex
    // one; membership is the OR of per-polygon parities. Axis-aligned
    // rectangles keep the oracle interval algebra; 4th-decimal bounds
    // vs the 3-decimal lattice keep boundary hits measure-zero.
    GraftQuery(
      "q373_dsl_geo_shape_multipolygon",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("plat", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("plon", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "lat_field": "plat", "lon_field": "plon",
               "shape": {"type": "multipolygon", "coordinates": [
                 [[[-16.0003, -7.0001], [-8.0003, -7.0001], [-8.0003, -1.0001],
                   [-16.0003, -1.0001], [-16.0003, -7.0001]],
                  [[-14.0001, -5.0009], [-10.0001, -5.0009], [-10.0001, -3.0009],
                   [-14.0001, -3.0009], [-14.0001, -5.0009]]],
                 [[[5.0007, 2.0003], [15.0007, 2.0003], [15.0007, 7.0003],
                   [5.0007, 7.0003], [5.0007, 2.0003]]]]},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 300,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS plat,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS plon
          FROM customer)
        SELECT c_custkey FROM t
        WHERE (plat > -7.0001 AND plat < -1.0001
           AND plon > -16.0003 AND plon < -8.0003
           AND NOT (plat > -5.0009 AND plat < -3.0009
                AND plon > -14.0001 AND plon < -10.0001))
           OR (plat > 2.0003 AND plat < 7.0003
           AND plon > 5.0007 AND plon < 15.0007)
        ORDER BY c_custkey
        LIMIT 300
      """.stripMargin.trim)),

    // geo_line metric agg under a terms parent (r13): per-group track
    // reconstruction — points collected in the ONE groupBy, sorted by
    // the sort field AFTER collection (ties break by lat, lon — a
    // deterministic total order), truncated to the first `size`
    // points, emitted as parallel lat/lon DOUBLE arrays. The registry
    // edge renders the arrays as comma-joined MILLI-DEGREE longs
    // (the driver's diff harness needs scalar output columns; the
    // fixture lives on the milli-degree grid, so ×1000 + round is
    // exact and both engines print longs identically). The oracle
    // replays with DuckDB's ordered list() sliced to the same size.
    GraftQuery(
      "q374_dsl_geo_line",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, expr}
        val c = Tables.load(s, dir, "customer")
          .withColumn("plat", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("plon", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("grp", expr("c_custkey % 7"))
        QueryDsl.search(c,
          """{"size": 0,
             "aggs": {"g": {"terms": {"field": "grp", "size": 10},
               "aggs": {"track": {"geo_line":
                 {"lat_field": "plat", "lon_field": "plon",
                  "sort_field": "c_custkey", "size": 5}}}}}}""")
          .select(col("g"), col("doc_count"),
            expr("concat_ws(',', transform(track_lats, " +
              "x -> CAST(round(x * 1000) AS BIGINT)))").as("track_lats"),
            expr("concat_ws(',', transform(track_lons, " +
              "x -> CAST(round(x * 1000) AS BIGINT)))").as("track_lons"))
      },
      Some("""
        WITH t AS (
          SELECT c_custkey, c_custkey % 7 AS g,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS plat,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS plon
          FROM customer)
        SELECT g, COUNT(*) AS doc_count,
               array_to_string(list_transform(
                 (list(plat ORDER BY c_custkey, plat, plon))[1:5],
                 x -> CAST(round(x * 1000) AS BIGINT)), ',') AS track_lats,
               array_to_string(list_transform(
                 (list(plon ORDER BY c_custkey, plat, plon))[1:5],
                 x -> CAST(round(x * 1000) AS BIGINT)), ',') AS track_lons
        FROM t GROUP BY g
        ORDER BY doc_count DESC, g
        LIMIT 10
      """.stripMargin.trim)),

    // doc-side MULTIPOLYGON (r13): each customer carries an
    // island-pair region — the q368 square frame (shell + hole) plus
    // a disjoint plain square 20° east — and contains(P) is the OR of
    // per-component parities. Truth from construction: Chebyshev
    // annulus on the frame OR Chebyshev ball on the island.
    GraftQuery(
      "q375_dsl_geo_shape_doc_multipolygon",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("rr", expr("CAST(2 + c_custkey % 8 AS DOUBLE)"))
          .withColumn("h", expr("rr / 2"))
          .withColumn("polys", expr(
            """array(
                 array(
                   array(struct(cx - rr AS lat, cy - rr AS lon),
                         struct(cx - rr AS lat, cy + rr AS lon),
                         struct(cx + rr AS lat, cy + rr AS lon),
                         struct(cx + rr AS lat, cy - rr AS lon)),
                   array(struct(cx - h AS lat, cy - h AS lon),
                         struct(cx - h AS lat, cy + h AS lon),
                         struct(cx + h AS lat, cy + h AS lon),
                         struct(cx + h AS lat, cy - h AS lon))),
                 array(
                   array(struct(cx - h AS lat, cy + 20 - h AS lon),
                         struct(cx - h AS lat, cy + 20 + h AS lon),
                         struct(cx + h AS lat, cy + 20 + h AS lon),
                         struct(cx + h AS lat, cy + 20 - h AS lon))))"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "multipolygon", "polys_field": "polys"},
               "shape": {"type": "point", "coordinates": [-2.0007, 0.5003]},
               "relation": "contains"}},
             "sort": ["c_custkey"], "size": 300,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(2 + c_custkey % 8 AS DOUBLE) AS rr
          FROM customer)
        SELECT c_custkey FROM t
        WHERE (greatest(abs(0.5003 - cx), abs(-2.0007 - cy)) < rr
           AND greatest(abs(0.5003 - cx), abs(-2.0007 - cy)) > rr / 2)
           OR greatest(abs(0.5003 - cx), abs(-2.0007 - (cy + 20))) < rr / 2
        ORDER BY c_custkey
        LIMIT 300
      """.stripMargin.trim)),

    // big QUERY polygon past the old 64-vertex wall (r14, VERDICT r13
    // #1): a 514-vertex rectilinear staircase — 256 steps of width
    // 0.125°, step heights a 13-cycle — compiled through the
    // GeoPointInShape JVM kernel (vertices are loop data, not codegen
    // terms). Truth from CONSTRUCTION: membership is interval algebra
    // (lon in the staircase span, lat between the base and the step's
    // top), never the engine's parity walk. Boundaries carry a 4th
    // decimal (.0005) against the fixture's milli-degree lattice — the
    // measure-zero rule.
    GraftQuery(
      "q376_dsl_geo_shape_big_query_polygon",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("plat", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("plon", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
        val steps = 256
        def x(j: Int): Double = -16.0005 + j * 0.125
        def top(j: Int): Double = ((j.toLong * 7919) % 13).toDouble - 6.0005
        val base = -8.0005
        def pt(la: Double, lo: Double) = s"[$lo, $la]"
        val verts = Seq(pt(base, x(0)), pt(top(0), x(0))) ++
          (0 until steps).flatMap { j =>
            Seq(pt(top(j), x(j + 1))) ++
              (if (j < steps - 1) Seq(pt(top(j + 1), x(j + 1))) else Nil)
          } ++ Seq(pt(base, x(steps)), pt(base, x(0)))
        QueryDsl.search(c,
          s"""{"query": {"geo_shape": {"lat_field": "plat", "lon_field": "plon",
               "shape": {"type": "polygon",
                 "coordinates": [${verts.mkString("[", ", ", "]")}]}}},
             "sort": ["c_custkey"], "size": 400,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS plat,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS plon
          FROM customer)
        SELECT c_custkey FROM t
        WHERE plon > -16.0005 AND plon < 15.9995
          AND plat > -8.0005
          AND plat < CAST((CAST(floor((plon + 16.0005) / 0.125) AS BIGINT)
                           * 7919) % 13 AS DOUBLE) - 6.0005
        ORDER BY c_custkey
        LIMIT 400
      """.stripMargin.trim)),

    // big DOC rings past the old wall (r14, VERDICT r13 #1): each row
    // carries a 130-vertex rectilinear staircase (64 steps, heights an
    // 8-cycle keyed by c_custkey), probed with contains(P) through the
    // GeoDocRelate kernel. Truth from construction: P inside row k's
    // staircase ⟺ P's lon offset lands in the span and P's lat sits
    // under that step's keyed top — plain arithmetic, no walk. Dirty
    // arms (NULL ring, 2-vertex ring) drop.
    GraftQuery(
      "q377_dsl_geo_shape_big_doc_ring",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("ring", expr(
            """CASE WHEN c_custkey % 11 = 0
                 THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
               WHEN c_custkey % 13 = 0
                 THEN array(struct(CAST(1.0 AS DOUBLE) AS lat, CAST(2.0 AS DOUBLE) AS lon),
                            struct(CAST(3.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon))
               ELSE concat(
                 array(struct(cx AS lat, cy AS lon)),
                 flatten(transform(sequence(0, 63), j -> array(
                   struct(cx + 0.25 + CAST((c_custkey + j) % 8 AS DOUBLE) * 0.25 AS lat,
                          cy + CAST(j AS DOUBLE) / 8.0 AS lon),
                   struct(cx + 0.25 + CAST((c_custkey + j) % 8 AS DOUBLE) * 0.25 AS lat,
                          cy + CAST(j + 1 AS DOUBLE) / 8.0 AS lon)))),
                 array(struct(cx AS lat, cy + 8.0 AS lon))) END"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "ring_field": "ring"},
               "shape": {"type": "point", "coordinates": [-2.0007, 0.0004]},
               "relation": "contains"}},
             "sort": ["c_custkey"], "size": 300,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy
          FROM customer
          WHERE c_custkey % 11 <> 0 AND c_custkey % 13 <> 0)
        SELECT c_custkey FROM t
        WHERE (-2.0007 - cy) > 0 AND (-2.0007 - cy) < 8
          AND 0.0004 > cx
          AND 0.0004 < cx + 0.25 + CAST((c_custkey
                + CAST(floor((-2.0007 - cy) * 8) AS BIGINT)) % 8 AS DOUBLE) * 0.25
        ORDER BY c_custkey
        LIMIT 300
      """.stripMargin.trim)),

    // CONCAVE query polygon vs the frame (rings) docs, relation
    // intersects (r14, VERDICT r13 #3): the query is an L-shape — the
    // union of two axis-aligned rectangles — so the oracle derives
    // truth from rectangle-vs-annulus interval algebra (box meets the
    // shell's box AND is not swallowed by the hole), never the
    // engine's vertex/crossing walk. Frames are the q368 fixture
    // (shell 2rr, hole rr, milli-degree centers).
    GraftQuery(
      "q378_dsl_geo_shape_rings_vs_concave_query",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("rr", expr("CAST(2 + c_custkey % 8 AS DOUBLE)"))
          .withColumn("h", expr("rr / 2"))
          .withColumn("rings", expr(
            """array(
                 array(struct(cx - rr AS lat, cy - rr AS lon),
                       struct(cx - rr AS lat, cy + rr AS lon),
                       struct(cx + rr AS lat, cy + rr AS lon),
                       struct(cx + rr AS lat, cy - rr AS lon)),
                 array(struct(cx - h AS lat, cy - h AS lon),
                       struct(cx - h AS lat, cy + h AS lon),
                       struct(cx + h AS lat, cy + h AS lon),
                       struct(cx + h AS lat, cy - h AS lon)))"""))
        // L = R1 ∪ R2: R1 lat [-6.0003, -1.0007] lon [-12.0001, -4.0009],
        //              R2 lat [-1.0007,  4.0001] lon [-12.0001, -9.0003]
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "rings_field": "rings"},
               "shape": {"type": "polygon", "coordinates":
                 [[[-12.0001, -6.0003], [-4.0009, -6.0003], [-4.0009, -1.0007],
                   [-9.0003, -1.0007], [-9.0003, 4.0001], [-12.0001, 4.0001],
                   [-12.0001, -6.0003]]]},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 400,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(2 + c_custkey % 8 AS DOUBLE) AS rr
          FROM customer),
        r AS (
          SELECT c_custkey, cx, cy, rr, rr / 2 AS h FROM t)
        SELECT c_custkey FROM r
        WHERE
          ((cx - rr < -1.0007 AND cx + rr > -6.0003
            AND cy - rr < -4.0009 AND cy + rr > -12.0001)
           AND NOT (cx - h < -6.0003 AND cx + h > -1.0007
                AND cy - h < -12.0001 AND cy + h > -4.0009))
          OR
          ((cx - rr < 4.0001 AND cx + rr > -1.0007
            AND cy - rr < -9.0003 AND cy + rr > -12.0001)
           AND NOT (cx - h < -1.0007 AND cx + h > 4.0001
                AND cy - h < -12.0001 AND cy + h > -9.0003))
        ORDER BY c_custkey
        LIMIT 400
      """.stripMargin.trim)),

    // CONVEX query polygon vs the frame docs, relation contains (r14,
    // VERDICT r13 #3): which frames CONTAIN the fixed query square Q —
    // Q ⊆ annulus ⟺ Q inside the shell box AND disjoint from the hole
    // box (Q and the hole are convex; a connected square inside the
    // shell that misses the hole lies in the annulus). Pure interval
    // algebra on the construction.
    GraftQuery(
      "q379_dsl_geo_shape_rings_contains_query_polygon",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("rr", expr("CAST(2 + c_custkey % 8 AS DOUBLE)"))
          .withColumn("h", expr("rr / 2"))
          .withColumn("rings", expr(
            """array(
                 array(struct(cx - rr AS lat, cy - rr AS lon),
                       struct(cx - rr AS lat, cy + rr AS lon),
                       struct(cx + rr AS lat, cy + rr AS lon),
                       struct(cx + rr AS lat, cy - rr AS lon)),
                 array(struct(cx - h AS lat, cy - h AS lon),
                       struct(cx - h AS lat, cy + h AS lon),
                       struct(cx + h AS lat, cy + h AS lon),
                       struct(cx + h AS lat, cy - h AS lon)))"""))
        // Q: lat [-1.5007, 0.4993], lon [-3.0001, -1.0001] (2°x2°)
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "rings_field": "rings"},
               "shape": {"type": "polygon", "coordinates":
                 [[[-3.0001, -1.5007], [-1.0001, -1.5007], [-1.0001, 0.4993],
                   [-3.0001, 0.4993], [-3.0001, -1.5007]]]},
               "relation": "contains"}},
             "sort": ["c_custkey"], "size": 400,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(2 + c_custkey % 8 AS DOUBLE) AS rr
          FROM customer),
        r AS (SELECT c_custkey, cx, cy, rr, rr / 2 AS h FROM t)
        SELECT c_custkey FROM r
        WHERE cx - rr < -1.5007 AND cx + rr > 0.4993
          AND cy - rr < -3.0001 AND cy + rr > -1.0001
          AND NOT (cx - h < 0.4993 AND cx + h > -1.5007
               AND cy - h < -1.0001 AND cy + h > -3.0001)
        ORDER BY c_custkey
        LIMIT 400
      """.stripMargin.trim)),

    // circle query shape vs doc POLYGONS (r14, VERDICT r13 #4): square
    // docs, relation intersects — center inside (Chebyshev) ∨ the
    // 6-dp-rounded haversine from the center to the box-clamped
    // closest point ≤ R. The clamp IS the construction-derived closest
    // point for an axis-aligned square (the engine's per-edge planar
    // clamps include it, and the box clamp dominates the other three
    // candidates in both |Δlat| and |Δlon|), so the oracle replays the
    // q125 pinned haversine on the clamp, never the per-edge walk.
    GraftQuery(
      "q380_dsl_geo_shape_circle_polygon_intersects",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("rh", expr("CAST(1 + c_custkey % 5 AS DOUBLE)"))
          .withColumn("ring", expr(
            """array(struct(cx - rh AS lat, cy - rh AS lon),
                     struct(cx - rh AS lat, cy + rh AS lon),
                     struct(cx + rh AS lat, cy + rh AS lon),
                     struct(cx + rh AS lat, cy - rh AS lon))"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "ring_field": "ring"},
               "shape": {"type": "circle", "coordinates": [2.0003, 0.0001],
                         "radius": "700km"},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 400,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(1 + c_custkey % 5 AS DOUBLE) AS rh
          FROM customer),
        cl AS (
          SELECT c_custkey, cx, cy, rh,
                 greatest(cx - rh, least(cx + rh, 0.0001)) AS clat,
                 greatest(cy - rh, least(cy + rh, 2.0003)) AS clon
          FROM t),
        d AS (
          SELECT c_custkey, cx, cy, rh,
                 round(CAST(12742.0176 AS DOUBLE) * asin(sqrt(
                   sin((clat - 0.0001) * pi() / 180.0 / 2.0)
                     * sin((clat - 0.0001) * pi() / 180.0 / 2.0)
                   + cos(0.0001 * pi() / 180.0) * cos(clat * pi() / 180.0)
                     * sin((clon - 2.0003) * pi() / 180.0 / 2.0)
                     * sin((clon - 2.0003) * pi() / 180.0 / 2.0))), 6) AS dist_km
          FROM cl)
        SELECT c_custkey FROM d
        WHERE greatest(abs(0.0001 - cx), abs(2.0003 - cy)) < rh
           OR dist_km <= 700.0
        ORDER BY c_custkey
        LIMIT 400
      """.stripMargin.trim)),

    // circle CONTAINED BY a frame doc (r14, VERDICT r13 #4 + holes):
    // contains ⟺ the center sits in the annulus AND every boundary —
    // the shell's four edges from inside, the hole's box from outside
    // — is at least R away. For axis-aligned edges every engine
    // per-edge clamp is a pure-Δlat or pure-Δlon haversine (or the
    // hole-box clamp), so the oracle computes the same five candidate
    // distances from the construction and takes the least.
    GraftQuery(
      "q381_dsl_geo_shape_circle_frame_contains",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("rr", expr("CAST(2 + c_custkey % 8 AS DOUBLE)"))
          .withColumn("h", expr("rr / 2"))
          .withColumn("rings", expr(
            """array(
                 array(struct(cx - rr AS lat, cy - rr AS lon),
                       struct(cx - rr AS lat, cy + rr AS lon),
                       struct(cx + rr AS lat, cy + rr AS lon),
                       struct(cx + rr AS lat, cy - rr AS lon)),
                 array(struct(cx - h AS lat, cy - h AS lon),
                       struct(cx - h AS lat, cy + h AS lon),
                       struct(cx + h AS lat, cy + h AS lon),
                       struct(cx + h AS lat, cy - h AS lon)))"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "rings_field": "rings"},
               "shape": {"type": "circle", "coordinates": [-2.0007, 0.5003],
                         "radius": "60km"},
               "relation": "contains"}},
             "sort": ["c_custkey"], "size": 400,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(2 + c_custkey % 8 AS DOUBLE) AS rr
          FROM customer),
        r AS (SELECT c_custkey, cx, cy, rr, rr / 2 AS h FROM t),
        hv AS (
          SELECT c_custkey, cx, cy, rr, h,
                 greatest(cx - h, least(cx + h, 0.5003)) AS hlat,
                 greatest(cy - h, least(cy + h, -2.0007)) AS hlon
          FROM r)
        SELECT c_custkey FROM (
          SELECT c_custkey, rr, h, cx, cy,
            greatest(abs(0.5003 - cx), abs(-2.0007 - cy)) AS cheb,
            least(
              round(12742.0176 * asin(sqrt(
                sin((cx - rr - 0.5003) * pi() / 180.0 / 2.0)
                  * sin((cx - rr - 0.5003) * pi() / 180.0 / 2.0))), 6),
              round(12742.0176 * asin(sqrt(
                sin((cx + rr - 0.5003) * pi() / 180.0 / 2.0)
                  * sin((cx + rr - 0.5003) * pi() / 180.0 / 2.0))), 6),
              round(12742.0176 * asin(sqrt(
                cos(0.5003 * pi() / 180.0) * cos(0.5003 * pi() / 180.0)
                  * sin((cy - rr + 2.0007) * pi() / 180.0 / 2.0)
                  * sin((cy - rr + 2.0007) * pi() / 180.0 / 2.0))), 6),
              round(12742.0176 * asin(sqrt(
                cos(0.5003 * pi() / 180.0) * cos(0.5003 * pi() / 180.0)
                  * sin((cy + rr + 2.0007) * pi() / 180.0 / 2.0)
                  * sin((cy + rr + 2.0007) * pi() / 180.0 / 2.0))), 6),
              round(12742.0176 * asin(sqrt(
                sin((hlat - 0.5003) * pi() / 180.0 / 2.0)
                  * sin((hlat - 0.5003) * pi() / 180.0 / 2.0)
                + cos(0.5003 * pi() / 180.0) * cos(hlat * pi() / 180.0)
                  * sin((hlon + 2.0007) * pi() / 180.0 / 2.0)
                  * sin((hlon + 2.0007) * pi() / 180.0 / 2.0))), 6)) AS mind
          FROM hv)
        WHERE cheb > h AND cheb < rr AND mind >= 60.0
        ORDER BY c_custkey
        LIMIT 400
      """.stripMargin.trim)),

    // doc MULTILINESTRING (r14, VERDICT r13 #7): two parallel track
    // components per row with a gap between them — intersects is the
    // per-component OR, and the gap matters (a box between the tracks
    // hits neither). Truth from the horizontal-segment construction:
    // interval overlap per component. Dirty arms (NULL outer,
    // single-vertex chain) drop.
    GraftQuery(
      "q382_dsl_geo_shape_multilinestring",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("len", expr("CAST(1 + c_custkey % 7 AS DOUBLE)"))
          .withColumn("paths", expr(
            """CASE WHEN c_custkey % 11 = 0
                 THEN CAST(NULL AS ARRAY<ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>>)
               WHEN c_custkey % 13 = 0
                 THEN array(array(struct(CAST(1.0 AS DOUBLE) AS lat,
                                         CAST(2.0 AS DOUBLE) AS lon)))
               ELSE array(
                 array(struct(cx AS lat, cy AS lon),
                       struct(cx AS lat, cy + len AS lon)),
                 array(struct(cx + 5 AS lat, cy + 2 AS lon),
                       struct(cx + 5 AS lat, cy + 2 + len AS lon))) END"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "multilinestring", "lines_field": "paths"},
               "shape": {"type": "envelope",
                 "coordinates": [[-10.0001, 3.0003], [5.0009, -3.0007]]},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 400,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(1 + c_custkey % 7 AS DOUBLE) AS len
          FROM customer
          WHERE c_custkey % 11 <> 0 AND c_custkey % 13 <> 0)
        SELECT c_custkey FROM t
        WHERE (cx > -3.0007 AND cx < 3.0003
               AND cy < 5.0009 AND cy + len > -10.0001)
           OR (cx + 5 > -3.0007 AND cx + 5 < 3.0003
               AND cy + 2 < 5.0009 AND cy + 2 + len > -10.0001)
        ORDER BY c_custkey
        LIMIT 400
      """.stripMargin.trim)),

    // doc MULTIPOINT (r14, VERDICT r13 #7): a 3-point bag per row,
    // relation within — EVERY point must sit in the box. Truth from
    // the generator arithmetic. Dirty arm (NULL coordinate in one
    // point) drops.
    GraftQuery(
      "q383_dsl_geo_shape_multipoint_within",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("pts", expr(
            """CASE WHEN c_custkey % 19 = 0
                 THEN array(struct(CAST(NULL AS DOUBLE) AS lat, cy AS lon))
               ELSE array(
                 struct(cx AS lat, cy AS lon),
                 struct(cx + 1 AS lat, cy + 2 AS lon),
                 struct(cx + CAST(c_custkey % 5 AS DOUBLE) AS lat,
                        cy + 3 AS lon)) END"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "multipoint", "points_field": "pts"},
               "shape": {"type": "envelope",
                 "coordinates": [[-12.0001, 6.0003], [2.0009, -6.0007]]},
               "relation": "within"}},
             "sort": ["c_custkey"], "size": 400,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(c_custkey % 5 AS DOUBLE) AS k5
          FROM customer
          WHERE c_custkey % 19 <> 0)
        SELECT c_custkey FROM t
        WHERE cx > -6.0007 AND cx + 1 < 6.0003 AND cx + k5 < 6.0003
          AND cx + k5 > -6.0007 AND cx + 1 > -6.0007
          AND cy > -12.0001 AND cy + 3 < 2.0009
        ORDER BY c_custkey
        LIMIT 400
      """.stripMargin.trim)),

    // terms min_doc_count: 0 (r14, VERDICT r13 #5 — Kibana's "show
    // empty buckets"): the term dictionary comes from the PRE-QUERY
    // table, so langs the query filtered out surface with doc_count 0
    // and NULL sub-metrics; ordering (count desc, key asc) and size
    // then apply to the joined table. Oracle: DISTINCT dictionary LEFT
    // JOIN the filtered counts — the same dense-fill shape.
    GraftQuery(
      "q384_dsl_terms_min_doc_count_zero",
      (s, dir) => QueryDsl.search(
        Tables.load(s, dir, "documents"),
        """{"query": {"term": {"lang": "en"}},
           "size": 0,
           "aggs": {"langs": {"terms": {"field": "lang",
             "min_doc_count": 0, "size": 20},
             "aggs": {"chars": {"sum": {"field": "n_chars"}}}}}}"""),
      Some("""
        WITH dict AS (SELECT DISTINCT lang FROM documents WHERE lang IS NOT NULL),
        cnt AS (
          SELECT lang, COUNT(*) AS c, CAST(SUM(n_chars) AS BIGINT) AS sc
          FROM documents WHERE lang = 'en' GROUP BY lang)
        SELECT d.lang AS langs, COALESCE(c, 0) AS doc_count, sc AS chars
        FROM dict d LEFT JOIN cnt USING (lang)
        ORDER BY doc_count DESC, langs LIMIT 20
      """.stripMargin.trim)),

    // the full BPE merge LOOP (r14, VERDICT r13 #8 — the k-iteration
    // generalization of q101): k=3 merges learned over the documents
    // corpus, each iteration one pair-count shuffle + a map-only
    // leftmost-greedy fold applying the winner (ties break by pair,
    // lexicographic — BpeSpec pins it). The oracle replays all three
    // iterations token-for-token in DuckDB: the same pair counts, the
    // same winner rule, and the fold as a recursive CTE stepping one
    // symbol at a time.
    GraftQuery(
      "q385_bpe_merge_loop",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val toks = Tables.load(s, dir, "documents")
          .select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
          .filter(length(col("tok")).between(2, 20))
          .select(split(col("tok"), "").as("syms"))
        graft.operators.Bpe.merges(toks, 3)
      },
      Some("""
        WITH RECURSIVE
        t0 AS (
          SELECT row_number() OVER () AS tid, regexp_extract_all(tok, '.') AS syms
          FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE len(tok) BETWEEN 2 AND 20),
        p1 AS (SELECT syms[i] AS a, syms[i+1] AS b, COUNT(*) AS n
               FROM (SELECT syms, unnest(range(1, len(syms))) AS i FROM t0)
               GROUP BY 1, 2),
        w1 AS (SELECT a, b, n FROM p1 ORDER BY n DESC, a, b LIMIT 1),
        r1 AS (
          SELECT tid, syms, 0 AS i, CAST([] AS VARCHAR[]) AS acc FROM t0
          UNION ALL
          SELECT tid, syms, i + 1,
            CASE WHEN len(acc) > 0 AND acc[-1] = (SELECT a FROM w1)
                      AND syms[i + 1] = (SELECT b FROM w1)
                 THEN list_append(acc[1:len(acc)-1], (SELECT a || b FROM w1))
                 ELSE list_append(acc, syms[i + 1]) END
          FROM r1 WHERE i < len(syms)),
        t1 AS (SELECT tid, acc AS syms FROM r1 WHERE i = len(syms)),
        p2 AS (SELECT syms[i] AS a, syms[i+1] AS b, COUNT(*) AS n
               FROM (SELECT syms, unnest(range(1, len(syms))) AS i
                     FROM t1 WHERE len(syms) >= 2)
               GROUP BY 1, 2),
        w2 AS (SELECT a, b, n FROM p2 ORDER BY n DESC, a, b LIMIT 1),
        r2 AS (
          SELECT tid, syms, 0 AS i, CAST([] AS VARCHAR[]) AS acc FROM t1
          UNION ALL
          SELECT tid, syms, i + 1,
            CASE WHEN len(acc) > 0 AND acc[-1] = (SELECT a FROM w2)
                      AND syms[i + 1] = (SELECT b FROM w2)
                 THEN list_append(acc[1:len(acc)-1], (SELECT a || b FROM w2))
                 ELSE list_append(acc, syms[i + 1]) END
          FROM r2 WHERE i < len(syms)),
        t2 AS (SELECT tid, acc AS syms FROM r2 WHERE i = len(syms)),
        p3 AS (SELECT syms[i] AS a, syms[i+1] AS b, COUNT(*) AS n
               FROM (SELECT syms, unnest(range(1, len(syms))) AS i
                     FROM t2 WHERE len(syms) >= 2)
               GROUP BY 1, 2),
        w3 AS (SELECT a, b, n FROM p3 ORDER BY n DESC, a, b LIMIT 1)
        SELECT step, a, b, a || b AS merged, CAST(n AS BIGINT) AS n FROM (
          SELECT 1 AS step, a, b, n FROM w1
          UNION ALL SELECT 2, a, b, n FROM w2
          UNION ALL SELECT 3, a, b, n FROM w3)
        ORDER BY step
      """.stripMargin.trim)),

    // extended_bounds ∪ data-span union (r14, ADVICE): data buckets
    // OUTSIDE the bounds don't just survive the outer join — the
    // interior gaps between them and the bounded series fill too (the
    // OpenSearch widening rule). Fixture: a sparse far cluster (every
    // 97th doc at 2000+) beyond bounds [0, 600]; the series must run
    // dense to the data's own max bucket. The oracle generates the
    // union range from the same construction.
    GraftQuery(
      "q386_dsl_histogram_bounds_union",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val d = Tables.load(s, dir, "documents").withColumn("v", expr(
          "CASE WHEN doc_id % 97 = 0 THEN 2000 + (doc_id % 7) * 100 " +
            "ELSE n_chars END"))
        QueryDsl.search(d,
          """{"size": 0,
             "aggs": {"hist": {"histogram": {"field": "v", "interval": 50,
               "min_doc_count": 0,
               "extended_bounds": {"min": 0, "max": 600}}}}}""")
      },
      Some("""
        WITH d AS (
          SELECT CASE WHEN doc_id % 97 = 0 THEN 2000 + (doc_id % 7) * 100
                      ELSE n_chars END AS v
          FROM documents),
        g AS (
          SELECT CAST(FLOOR(v / 50) * 50 AS BIGINT) AS hist, COUNT(*) AS doc_count
          FROM d WHERE v IS NOT NULL GROUP BY 1),
        mx AS (
          SELECT LEAST(0, CAST(FLOOR(MIN(v) / 50) * 50 AS BIGINT)) AS lo,
                 GREATEST(600, CAST(FLOOR(MAX(v) / 50) * 50 AS BIGINT)) AS hi
          FROM d WHERE v IS NOT NULL),
        b AS (
          SELECT unnest(range((SELECT lo FROM mx),
                              (SELECT hi FROM mx) + 50, 50)) AS hist)
        SELECT COALESCE(b.hist, g.hist) AS hist,
               COALESCE(g.doc_count, 0) AS doc_count
        FROM b FULL OUTER JOIN g ON b.hist = g.hist
        ORDER BY doc_count DESC, hist
      """.stripMargin.trim)),

    // doc GEOMETRYCOLLECTION (r14 — the last GeoJSON doc shape): each
    // row carries mixed typed components (a square polygon, a
    // horizontal track, a bare point) and intersects is the
    // per-component OR, each component judged by its own kind's walk.
    // Truth from construction: box-vs-square interval overlap ∨
    // track-in-band-and-lon-overlap ∨ point-in-box. Dirty arm (NULL
    // collection) drops.
    GraftQuery(
      "q387_dsl_geo_shape_geometrycollection",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("cx", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("rh", expr("CAST(1 + c_custkey % 4 AS DOUBLE)"))
          .withColumn("len", expr("CAST(1 + c_custkey % 7 AS DOUBLE)"))
          .withColumn("shapes", expr(
            """CASE WHEN c_custkey % 11 = 0
                 THEN CAST(NULL AS ARRAY<STRUCT<kind: STRING,
                   pts: ARRAY<ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>>>>)
               ELSE array(
                 struct('polygon' AS kind, array(array(
                   struct(cx - rh AS lat, cy - rh AS lon),
                   struct(cx - rh AS lat, cy + rh AS lon),
                   struct(cx + rh AS lat, cy + rh AS lon),
                   struct(cx + rh AS lat, cy - rh AS lon))) AS pts),
                 struct('linestring' AS kind, array(array(
                   struct(cx + 8 AS lat, cy AS lon),
                   struct(cx + 8 AS lat, cy + len AS lon))) AS pts),
                 struct('point' AS kind, array(array(
                   struct(cx AS lat, cy + 15 AS lon))) AS pts)) END"""))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "geometrycollection",
                             "shapes_field": "shapes"},
               "shape": {"type": "envelope",
                 "coordinates": [[-9.0001, 4.0003], [3.0009, -4.0007]]},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 400,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(1 + c_custkey % 4 AS DOUBLE) AS rh,
                 CAST(1 + c_custkey % 7 AS DOUBLE) AS len
          FROM customer
          WHERE c_custkey % 11 <> 0)
        SELECT c_custkey FROM t
        WHERE (cx - rh < 4.0003 AND cx + rh > -4.0007
               AND cy - rh < 3.0009 AND cy + rh > -9.0001)
           OR (cx + 8 > -4.0007 AND cx + 8 < 4.0003
               AND cy < 3.0009 AND cy + len > -9.0001)
           OR (cx > -4.0007 AND cx < 4.0003
               AND cy + 15 > -9.0001 AND cy + 15 < 3.0009)
        ORDER BY c_custkey
        LIMIT 400
      """.stripMargin.trim)),

    // ORDERS-keyed growth twin of the q377 staircase (r14): ScaleBench
    // replicates orders (customer stays fixed as the has_child parent
    // side), so the kernel-walk growth curve needs an orders-keyed
    // member — 34-vertex per-row staircases, contains(P), the same
    // keyed step arithmetic as the oracle.
    GraftQuery(
      "q388_dsl_geo_shape_doc_ring_orders",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = Tables.load(s, dir, "orders")
          .withColumn("cx", expr(
            "CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("ring", expr(
            """CASE WHEN o_orderkey % 11 = 0
                 THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
               WHEN o_orderkey % 13 = 0
                 THEN array(struct(CAST(1.0 AS DOUBLE) AS lat, CAST(2.0 AS DOUBLE) AS lon),
                            struct(CAST(3.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon))
               ELSE concat(
                 array(struct(cx AS lat, cy AS lon)),
                 flatten(transform(sequence(0, 15), j -> array(
                   struct(cx + 0.25 + CAST((o_orderkey + j) % 8 AS DOUBLE) * 0.25 AS lat,
                          cy + CAST(j AS DOUBLE) * 0.5 AS lon),
                   struct(cx + 0.25 + CAST((o_orderkey + j) % 8 AS DOUBLE) * 0.25 AS lat,
                          cy + CAST(j + 1 AS DOUBLE) * 0.5 AS lon)))),
                 array(struct(cx AS lat, cy + 8.0 AS lon))) END"""))
        QueryDsl.search(o,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "ring_field": "ring"},
               "shape": {"type": "point", "coordinates": [-2.0007, 0.0004]},
               "relation": "contains"}},
             "sort": ["o_orderkey"], "size": 300,
             "_source": ["o_orderkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
                 CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy
          FROM orders
          WHERE o_orderkey % 11 <> 0 AND o_orderkey % 13 <> 0)
        SELECT o_orderkey FROM t
        WHERE (-2.0007 - cy) > 0 AND (-2.0007 - cy) < 8
          AND 0.0004 > cx
          AND 0.0004 < cx + 0.25 + CAST((o_orderkey
                + CAST(floor((-2.0007 - cy) * 2) AS BIGINT)) % 8 AS DOUBLE) * 0.25
        ORDER BY o_orderkey
        LIMIT 300
      """.stripMargin.trim)),

    // ORDERS-keyed growth twin of the q387 geometrycollection (r14):
    // the mixed-component kernel walk over the replicated table.
    GraftQuery(
      "q389_dsl_geo_shape_collection_orders",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = Tables.load(s, dir, "orders")
          .withColumn("cx", expr(
            "CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("rh", expr("CAST(1 + o_orderkey % 4 AS DOUBLE)"))
          .withColumn("len", expr("CAST(1 + o_orderkey % 7 AS DOUBLE)"))
          .withColumn("shapes", expr(
            """CASE WHEN o_orderkey % 11 = 0
                 THEN CAST(NULL AS ARRAY<STRUCT<kind: STRING,
                   pts: ARRAY<ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>>>>)
               ELSE array(
                 struct('polygon' AS kind, array(array(
                   struct(cx - rh AS lat, cy - rh AS lon),
                   struct(cx - rh AS lat, cy + rh AS lon),
                   struct(cx + rh AS lat, cy + rh AS lon),
                   struct(cx + rh AS lat, cy - rh AS lon))) AS pts),
                 struct('linestring' AS kind, array(array(
                   struct(cx + 8 AS lat, cy AS lon),
                   struct(cx + 8 AS lat, cy + len AS lon))) AS pts),
                 struct('point' AS kind, array(array(
                   struct(cx AS lat, cy + 15 AS lon))) AS pts)) END"""))
        QueryDsl.search(o,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "geometrycollection",
                             "shapes_field": "shapes"},
               "shape": {"type": "envelope",
                 "coordinates": [[-9.0001, 4.0003], [3.0009, -4.0007]]},
               "relation": "intersects"}},
             "sort": ["o_orderkey"], "size": 400,
             "_source": ["o_orderkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
                 CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(1 + o_orderkey % 4 AS DOUBLE) AS rh,
                 CAST(1 + o_orderkey % 7 AS DOUBLE) AS len
          FROM orders
          WHERE o_orderkey % 11 <> 0)
        SELECT o_orderkey FROM t
        WHERE (cx - rh < 4.0003 AND cx + rh > -4.0007
               AND cy - rh < 3.0009 AND cy + rh > -9.0001)
           OR (cx + 8 > -4.0007 AND cx + 8 < 4.0003
               AND cy < 3.0009 AND cy + len > -9.0001)
           OR (cx > -4.0007 AND cx < 4.0003
               AND cy + 15 > -9.0001 AND cy + 15 < 3.0009)
        ORDER BY o_orderkey
        LIMIT 400
      """.stripMargin.trim)),

    // query-side GEOMETRYCOLLECTION over point docs (r14): one request
    // carrying mixed component shapes — membership is the OR of the
    // per-component walks (a square zone, a haversine circle, a
    // viewport box). The oracle replays each component from its own
    // construction: box algebra twice + the q125 pinned haversine.
    GraftQuery(
      "q390_dsl_geo_shape_query_collection",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val c = Tables.load(s, dir, "customer")
          .withColumn("plat", expr(
            "CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("plon", expr(
            "CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
        QueryDsl.search(c,
          """{"query": {"geo_shape": {"lat_field": "plat", "lon_field": "plon",
               "shape": {"type": "geometrycollection", "geometries": [
                 {"type": "polygon", "coordinates":
                   [[[-16.0001, -7.0003], [-10.0001, -7.0003],
                     [-10.0001, -2.0003], [-16.0001, -2.0003],
                     [-16.0001, -7.0003]]]},
                 {"type": "circle", "coordinates": [10.0003, 3.0001],
                  "radius": "350km"},
                 {"type": "envelope",
                  "coordinates": [[-2.0007, 7.0009], [2.0009, 5.0001]]}]}}},
             "sort": ["c_custkey"], "size": 400,
             "_source": ["c_custkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT c_custkey,
                 CAST((c_custkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS plat,
                 CAST((c_custkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS plon
          FROM customer),
        d AS (
          SELECT c_custkey, plat, plon,
                 round(CAST(12742.0176 AS DOUBLE) * asin(sqrt(
                   sin((plat - 3.0001) * pi() / 180.0 / 2.0)
                     * sin((plat - 3.0001) * pi() / 180.0 / 2.0)
                   + cos(3.0001 * pi() / 180.0) * cos(plat * pi() / 180.0)
                     * sin((plon - 10.0003) * pi() / 180.0 / 2.0)
                     * sin((plon - 10.0003) * pi() / 180.0 / 2.0))), 6) AS dist_km
          FROM t)
        SELECT c_custkey FROM d
        WHERE (plat > -7.0003 AND plat < -2.0003
               AND plon > -16.0001 AND plon < -10.0001)
           OR dist_km <= 350.0
           OR (plat > 5.0001 AND plat < 7.0009
               AND plon > -2.0007 AND plon < 2.0009)
        ORDER BY c_custkey
        LIMIT 400
      """.stripMargin.trim)),

    // circle × ENVELOPE docs (r14 — the circle now serves every doc
    // kind): intersects ⟺ the box-clamped closest point within the
    // radius, pure Column corner arithmetic + the pinned haversine.
    // Oracle: the same clamp from the box CONSTRUCTION + the q125
    // haversine replay.
    GraftQuery(
      "q391_dsl_geo_shape_envelope_circle",
      (s, dir) => {
        val boxes = GeoFixtures.syntheticBoxes(Tables.load(s, dir, "customer"))
        QueryDsl.search(boxes,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "envelope",
                 "lat_min_field": "lat0", "lat_max_field": "lat1",
                 "lon_min_field": "lon0", "lon_max_field": "lon1"},
               "shape": {"type": "circle", "coordinates": [12.0003, 8.0001],
                         "radius": "2500km"},
               "relation": "intersects"}},
             "sort": ["c_custkey"], "size": 200,
             "_source": ["c_custkey"]}""")
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
          FROM customer),
        cl AS (
          SELECT c_custkey,
            greatest(lat0, least(lat1, 8.0001)) AS clat,
            greatest(lon0, least(lon1, 12.0003)) AS clon
          FROM boxes)
        SELECT c_custkey FROM cl
        WHERE round(CAST(12742.0176 AS DOUBLE) * asin(sqrt(
            sin((clat - 8.0001) * pi() / 180.0 / 2.0)
              * sin((clat - 8.0001) * pi() / 180.0 / 2.0)
            + cos(8.0001 * pi() / 180.0) * cos(clat * pi() / 180.0)
              * sin((clon - 12.0003) * pi() / 180.0 / 2.0)
              * sin((clon - 12.0003) * pi() / 180.0 / 2.0))), 6) <= 2500.0
        ORDER BY c_custkey
        LIMIT 200
      """.stripMargin.trim)),

    // SIDECAR twin of q388 (r15, VERDICT r14 #1): the SAME staircase
    // kernel query over the SAME orders-keyed fixture, but through
    // `GeoEnvelope.materialize` + `envelope_fields` — the pushable
    // corner pre-filter prunes, the kernel walks survivors, and the
    // oracle is BYTE-IDENTICAL to q388's (the sidecar must never
    // change an answer).
    GraftQuery(
      "q392_dsl_geo_sidecar_ring_orders",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = graft.etl.GeoEnvelope.materialize(
          Tables.load(s, dir, "orders")
            .withColumn("cx", expr(
              "CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
            .withColumn("cy", expr(
              "CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
            .withColumn("ring", expr(
              """CASE WHEN o_orderkey % 11 = 0
                   THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
                 WHEN o_orderkey % 13 = 0
                   THEN array(struct(CAST(1.0 AS DOUBLE) AS lat, CAST(2.0 AS DOUBLE) AS lon),
                              struct(CAST(3.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon))
                 ELSE concat(
                   array(struct(cx AS lat, cy AS lon)),
                   flatten(transform(sequence(0, 15), j -> array(
                     struct(cx + 0.25 + CAST((o_orderkey + j) % 8 AS DOUBLE) * 0.25 AS lat,
                            cy + CAST(j AS DOUBLE) * 0.5 AS lon),
                     struct(cx + 0.25 + CAST((o_orderkey + j) % 8 AS DOUBLE) * 0.25 AS lat,
                            cy + CAST(j + 1 AS DOUBLE) * 0.5 AS lon)))),
                   array(struct(cx AS lat, cy + 8.0 AS lon))) END""")),
          "ring", "polygon")
        QueryDsl.search(o,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "ring_field": "ring",
                 "envelope_fields": ["lat_min", "lat_max", "lon_min", "lon_max"]},
               "shape": {"type": "point", "coordinates": [-2.0007, 0.0004]},
               "relation": "contains"}},
             "sort": ["o_orderkey"], "size": 300,
             "_source": ["o_orderkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
                 CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy
          FROM orders
          WHERE o_orderkey % 11 <> 0 AND o_orderkey % 13 <> 0)
        SELECT o_orderkey FROM t
        WHERE (-2.0007 - cy) > 0 AND (-2.0007 - cy) < 8
          AND 0.0004 > cx
          AND 0.0004 < cx + 0.25 + CAST((o_orderkey
                + CAST(floor((-2.0007 - cy) * 2) AS BIGINT)) % 8 AS DOUBLE) * 0.25
        ORDER BY o_orderkey
        LIMIT 300
      """.stripMargin.trim)),

    // Sidecar DISJOINT (r15): no pushable positive form exists for the
    // complement, so the compile short-circuits bbox-disjoint rows TRUE
    // without the kernel walk — dirty rows (NULL corners) still fall
    // through and drop. Square rings make the oracle pure interval
    // algebra; 4th-decimal bounds keep boundary hits measure-zero.
    GraftQuery(
      "q393_dsl_geo_sidecar_disjoint_orders",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = graft.etl.GeoEnvelope.materialize(
          Tables.load(s, dir, "orders")
            .withColumn("cx", expr(
              "CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
            .withColumn("cy", expr(
              "CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
            .withColumn("rh", expr("CAST(1 + o_orderkey % 4 AS DOUBLE)"))
            .withColumn("ring", expr(
              """CASE WHEN o_orderkey % 11 = 0
                   THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
                 ELSE array(struct(cx - rh AS lat, cy - rh AS lon),
                            struct(cx - rh AS lat, cy + rh AS lon),
                            struct(cx + rh AS lat, cy + rh AS lon),
                            struct(cx + rh AS lat, cy - rh AS lon)) END""")),
          "ring", "polygon")
        QueryDsl.search(o,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "ring_field": "ring",
                 "envelope_fields": ["lat_min", "lat_max", "lon_min", "lon_max"]},
               "shape": {"type": "envelope",
                 "coordinates": [[-9.0001, 4.0003], [3.0009, -4.0007]]},
               "relation": "disjoint"}},
             "sort": ["o_orderkey"], "size": 400,
             "_source": ["o_orderkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
                 CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(1 + o_orderkey % 4 AS DOUBLE) AS rh
          FROM orders
          WHERE o_orderkey % 11 <> 0)
        SELECT o_orderkey FROM t
        WHERE NOT (cx - rh < 4.0003 AND cx + rh > -4.0007
               AND cy - rh < 3.0009 AND cy + rh > -9.0001)
        ORDER BY o_orderkey
        LIMIT 400
      """.stripMargin.trim)),

    // ENGLISH analyzer (r15, VERDICT r14 #2): standard pass + the
    // 33-word stop list + the pinned suffix stemmer — "Running"
    // matches "run" on an inflected mixed-case corpus. The oracle
    // replays the WHOLE chain in DuckDB (the EnglishFold recipe:
    // list_filter stop removal, CASE-chain stemming), so any drift in
    // a rule, the rule order, or the stop list hash-fails.
    GraftQuery(
      "q394_dsl_match_english",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val docs = Tables.load(s, dir, "documents").withColumn("body",
          expr("""concat(upper(substring(text, 1, 12)), substring(text, 13),
            CASE WHEN doc_id % 3 = 0 THEN ' The JOINS were Running fast.'
                 WHEN doc_id % 3 = 1 THEN ' Parties wanted dresses!'
                 ELSE ' nothing of note' END)"""))
        QueryDsl.search(docs,
          """{"query": {"bool": {"should": [
               {"match": {"body": {"query": "Run", "analyzer": "english"}}},
               {"match": {"body": {"query": "Party", "analyzer": "english"}}}],
               "minimum_should_match": 1}},
             "sort": ["doc_id"], "size": 500, "_source": ["doc_id"]}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 upper(substr(text, 1, 12)) || substr(text, 13) ||
                 CASE WHEN doc_id % 3 = 0 THEN ' The JOINS were Running fast.'
                      WHEN doc_id % 3 = 1 THEN ' Parties wanted dresses!'
                      ELSE ' nothing of note' END AS body
          FROM documents),
        an AS (
          SELECT doc_id,
            list_transform(list_filter(
              string_split(trim(lower(regexp_replace(body, '[^A-Za-z0-9]+', ' ', 'g'))), ' '),
              t -> t <> '' AND t NOT IN ('a','an','and','are','as','at','be',
                'but','by','for','if','in','into','is','it','no','not','of',
                'on','or','such','that','the','their','then','there','these',
                'they','this','to','was','will','with')),
              t -> CASE
                WHEN t LIKE '%sses' THEN substr(t, 1, length(t)-2)
                WHEN t LIKE '%ies' AND length(t) >= 5 THEN substr(t, 1, length(t)-3) || 'y'
                WHEN t LIKE '%ss' OR t LIKE '%us' THEN t
                WHEN t LIKE '%s' AND length(t) >= 4 THEN substr(t, 1, length(t)-1)
                WHEN t LIKE '%ing' AND length(t) >= 6 THEN CASE
                  WHEN substr(t, length(t)-3, 1) = substr(t, length(t)-4, 1)
                   AND substr(t, length(t)-3, 1) IN ('b','d','f','g','m','n','p','r','t')
                  THEN substr(t, 1, length(t)-4) ELSE substr(t, 1, length(t)-3) END
                WHEN t LIKE '%ed' AND length(t) >= 5 THEN CASE
                  WHEN substr(t, length(t)-2, 1) = substr(t, length(t)-3, 1)
                   AND substr(t, length(t)-2, 1) IN ('b','d','f','g','m','n','p','r','t')
                  THEN substr(t, 1, length(t)-3) ELSE substr(t, 1, length(t)-2) END
                ELSE t END) AS toks
          FROM mixed)
        SELECT doc_id FROM an
        WHERE list_contains(toks, 'run') OR list_contains(toks, 'party')
        ORDER BY doc_id
        LIMIT 500
      """.stripMargin.trim)),

    // english PHRASE contract (r15): positions run over the FILTERED
    // token stream, so "join run" phrase-matches "...JOINS were
    // Running..." (the stop word "were"? not in the list — but "the"
    // preceding "JOINS" is removed). Documented divergence from
    // OpenSearch's position-gap behavior; the oracle replays the
    // padded-contains over the same analyzed stream.
    GraftQuery(
      "q395_dsl_phrase_english",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val docs = Tables.load(s, dir, "documents").withColumn("body",
          expr("""concat(text,
            CASE WHEN doc_id % 5 = 0 THEN ' The Dresses and Parties!'
                 WHEN doc_id % 5 = 1 THEN ' dress party time'
                 ELSE '' END)"""))
        QueryDsl.search(docs,
          """{"query": {"match_phrase": {"body": {
               "query": "the dress PARTY", "analyzer": "english"}}},
             "sort": ["doc_id"], "size": 500, "_source": ["doc_id"]}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 5 = 0 THEN ' The Dresses and Parties!'
                              WHEN doc_id % 5 = 1 THEN ' dress party time'
                              ELSE '' END AS body
          FROM documents),
        an AS (
          SELECT doc_id,
            array_to_string(list_transform(list_filter(
              string_split(trim(lower(regexp_replace(body, '[^A-Za-z0-9]+', ' ', 'g'))), ' '),
              t -> t <> '' AND t NOT IN ('a','an','and','are','as','at','be',
                'but','by','for','if','in','into','is','it','no','not','of',
                'on','or','such','that','the','their','then','there','these',
                'they','this','to','was','will','with')),
              t -> CASE
                WHEN t LIKE '%sses' THEN substr(t, 1, length(t)-2)
                WHEN t LIKE '%ies' AND length(t) >= 5 THEN substr(t, 1, length(t)-3) || 'y'
                WHEN t LIKE '%ss' OR t LIKE '%us' THEN t
                WHEN t LIKE '%s' AND length(t) >= 4 THEN substr(t, 1, length(t)-1)
                WHEN t LIKE '%ing' AND length(t) >= 6 THEN CASE
                  WHEN substr(t, length(t)-3, 1) = substr(t, length(t)-4, 1)
                   AND substr(t, length(t)-3, 1) IN ('b','d','f','g','m','n','p','r','t')
                  THEN substr(t, 1, length(t)-4) ELSE substr(t, 1, length(t)-3) END
                WHEN t LIKE '%ed' AND length(t) >= 5 THEN CASE
                  WHEN substr(t, length(t)-2, 1) = substr(t, length(t)-3, 1)
                   AND substr(t, length(t)-2, 1) IN ('b','d','f','g','m','n','p','r','t')
                  THEN substr(t, 1, length(t)-3) ELSE substr(t, 1, length(t)-2) END
                ELSE t END), ' ') AS nb
          FROM mixed)
        SELECT doc_id FROM an
        WHERE (' ' || nb || ' ') LIKE '% dress party %'
        ORDER BY doc_id
        LIMIT 500
      """.stripMargin.trim)),

    // BPE ENCODE (r15, VERDICT r14 #3): train k=3 on the q385 corpus,
    // then APPLY the learned table back through the one-pass broadcast
    // kernel and count the encoded symbol stream. The oracle extends
    // q385's recursive-CTE replay with the third fold and counts the
    // same stream — any drift in the encode order, the leftmost-greedy
    // fold, or the table collection hash-fails.
    GraftQuery(
      "q396_bpe_encode",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val toks = Tables.load(s, dir, "documents")
          .select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
          .filter(length(col("tok")).between(2, 20))
          .select(split(col("tok"), "").as("syms"))
        val table = graft.operators.Bpe.merges(toks, 3)
        graft.operators.Bpe.encode(toks, table)
          .select(explode(col("syms")).as("sym"))
          .groupBy(col("sym")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("sym").asc)
          .limit(30)
      },
      Some("""
        WITH RECURSIVE
        t0 AS (
          SELECT row_number() OVER () AS tid, regexp_extract_all(tok, '.') AS syms
          FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE len(tok) BETWEEN 2 AND 20),
        p1 AS (SELECT syms[i] AS a, syms[i+1] AS b, COUNT(*) AS n
               FROM (SELECT syms, unnest(range(1, len(syms))) AS i FROM t0)
               GROUP BY 1, 2),
        w1 AS (SELECT a, b FROM p1 ORDER BY n DESC, a, b LIMIT 1),
        r1 AS (
          SELECT tid, syms, 0 AS i, CAST([] AS VARCHAR[]) AS acc FROM t0
          UNION ALL
          SELECT tid, syms, i + 1,
            CASE WHEN len(acc) > 0 AND acc[-1] = (SELECT a FROM w1)
                      AND syms[i + 1] = (SELECT b FROM w1)
                 THEN list_append(acc[1:len(acc)-1], (SELECT a || b FROM w1))
                 ELSE list_append(acc, syms[i + 1]) END
          FROM r1 WHERE i < len(syms)),
        t1 AS (SELECT tid, acc AS syms FROM r1 WHERE i = len(syms)),
        p2 AS (SELECT syms[i] AS a, syms[i+1] AS b, COUNT(*) AS n
               FROM (SELECT syms, unnest(range(1, len(syms))) AS i
                     FROM t1 WHERE len(syms) >= 2)
               GROUP BY 1, 2),
        w2 AS (SELECT a, b FROM p2 ORDER BY n DESC, a, b LIMIT 1),
        r2 AS (
          SELECT tid, syms, 0 AS i, CAST([] AS VARCHAR[]) AS acc FROM t1
          UNION ALL
          SELECT tid, syms, i + 1,
            CASE WHEN len(acc) > 0 AND acc[-1] = (SELECT a FROM w2)
                      AND syms[i + 1] = (SELECT b FROM w2)
                 THEN list_append(acc[1:len(acc)-1], (SELECT a || b FROM w2))
                 ELSE list_append(acc, syms[i + 1]) END
          FROM r2 WHERE i < len(syms)),
        t2 AS (SELECT tid, acc AS syms FROM r2 WHERE i = len(syms)),
        p3 AS (SELECT syms[i] AS a, syms[i+1] AS b, COUNT(*) AS n
               FROM (SELECT syms, unnest(range(1, len(syms))) AS i
                     FROM t2 WHERE len(syms) >= 2)
               GROUP BY 1, 2),
        w3 AS (SELECT a, b FROM p3 ORDER BY n DESC, a, b LIMIT 1),
        r3 AS (
          SELECT tid, syms, 0 AS i, CAST([] AS VARCHAR[]) AS acc FROM t2
          UNION ALL
          SELECT tid, syms, i + 1,
            CASE WHEN len(acc) > 0 AND acc[-1] = (SELECT a FROM w3)
                      AND syms[i + 1] = (SELECT b FROM w3)
                 THEN list_append(acc[1:len(acc)-1], (SELECT a || b FROM w3))
                 ELSE list_append(acc, syms[i + 1]) END
          FROM r3 WHERE i < len(syms)),
        t3 AS (SELECT tid, acc AS syms FROM r3 WHERE i = len(syms))
        SELECT sym, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(syms) AS sym FROM t3)
        GROUP BY sym
        ORDER BY cnt DESC, sym
        LIMIT 30
      """.stripMargin.trim)),

    // geohash_grid over doc SHAPES (r15, VERDICT r14 #4): each square
    // ring buckets into EVERY precision-3 cell it intersects. Square
    // fixtures make the cell truth pure quantizer algebra (bbox ==
    // shape, so the candidate index rectangle IS the answer): the
    // oracle enumerates each row's index ranges with the same
    // floor-quantizer and replays the engine's own interleave+base-32
    // encode bit-for-bit (geohashSqlParts).
    GraftQuery(
      "q397_dsl_geohash_grid_doc_shape",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = Tables.load(s, dir, "orders")
          .withColumn("cx", expr(
            "CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("rh", expr("CAST(1 + o_orderkey % 4 AS DOUBLE)"))
          .withColumn("ring", expr(
            """CASE WHEN o_orderkey % 11 = 0
                 THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
               ELSE array(struct(cx - rh AS lat, cy - rh AS lon),
                          struct(cx - rh AS lat, cy + rh AS lon),
                          struct(cx + rh AS lat, cy + rh AS lon),
                          struct(cx + rh AS lat, cy - rh AS lon)) END"""))
        QueryDsl.search(o,
          """{"size": 0, "aggs": {"cells": {"geohash_grid": {
               "doc_shape": {"type": "polygon", "ring_field": "ring"},
               "precision": 3, "size": 60}}}}""")
      },
      Some {
        val (_, _, code, hash) = geohashSqlParts(3)
        s"""
        WITH t AS (
          SELECT o_orderkey,
                 CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(1 + o_orderkey % 4 AS DOUBLE) AS rh
          FROM orders
          WHERE o_orderkey % 11 <> 0),
        rng AS (
          SELECT o_orderkey,
            CAST(least(greatest(floor((cy - rh + 180.0) / 360.0 * 256.0), 0.0), 255.0) AS BIGINT) AS ix0,
            CAST(least(greatest(floor((cy + rh + 180.0) / 360.0 * 256.0), 0.0), 255.0) AS BIGINT) AS ix1,
            CAST(least(greatest(floor((cx - rh + 90.0) / 180.0 * 128.0), 0.0), 127.0) AS BIGINT) AS iy0,
            CAST(least(greatest(floor((cx + rh + 90.0) / 180.0 * 128.0), 0.0), 127.0) AS BIGINT) AS iy1
          FROM t),
        e1 AS (SELECT o_orderkey, unnest(range(ix0, ix1 + 1)) AS ix, iy0, iy1 FROM rng),
        e2 AS (SELECT o_orderkey, ix, unnest(range(iy0, iy1 + 1)) AS iy FROM e1),
        enc AS (SELECT o_orderkey, $code AS code FROM e2),
        h AS (SELECT o_orderkey, $hash AS cell FROM enc)
        SELECT cell AS cells, CAST(COUNT(*) AS BIGINT) AS doc_count
        FROM h GROUP BY 1
        ORDER BY doc_count DESC, cells
        LIMIT 60
      """.stripMargin.trim
      }),

    // geotile_grid over doc SHAPES (r15): the same squares at z=6 —
    // x from the linear lon quantizer, y rows from the web-mercator
    // quantizer applied to the square's top/bottom (monotone, so the
    // tile-row range IS [qy(top), qy(bottom)]), keys replayed as
    // z/x/y (the q260 recipe).
    GraftQuery(
      "q398_dsl_geotile_grid_doc_shape",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = Tables.load(s, dir, "orders")
          .withColumn("cx", expr(
            "CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("rh", expr("CAST(1 + o_orderkey % 4 AS DOUBLE)"))
          .withColumn("ring", expr(
            """CASE WHEN o_orderkey % 11 = 0
                 THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
               ELSE array(struct(cx - rh AS lat, cy - rh AS lon),
                          struct(cx - rh AS lat, cy + rh AS lon),
                          struct(cx + rh AS lat, cy + rh AS lon),
                          struct(cx + rh AS lat, cy - rh AS lon)) END"""))
        QueryDsl.search(o,
          """{"size": 0, "aggs": {"tiles": {"geotile_grid": {
               "doc_shape": {"type": "polygon", "ring_field": "ring"},
               "precision": 6, "size": 60}}}}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
                 CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(1 + o_orderkey % 4 AS DOUBLE) AS rh
          FROM orders
          WHERE o_orderkey % 11 <> 0),
        rng AS (
          SELECT o_orderkey,
            CAST(least(greatest(floor((cy - rh + 180.0) / 360.0 * 64.0), 0.0), 63.0) AS BIGINT) AS x0,
            CAST(least(greatest(floor((cy + rh + 180.0) / 360.0 * 64.0), 0.0), 63.0) AS BIGINT) AS x1,
            CAST(least(greatest(floor((1.0 - ln(tan(least(greatest(cx + rh, -85.05112878), 85.05112878) * (pi() / 180.0))
              + 1.0 / cos(least(greatest(cx + rh, -85.05112878), 85.05112878) * (pi() / 180.0))) / pi()) / 2.0 * 64.0), 0.0), 63.0) AS BIGINT) AS y0,
            CAST(least(greatest(floor((1.0 - ln(tan(least(greatest(cx - rh, -85.05112878), 85.05112878) * (pi() / 180.0))
              + 1.0 / cos(least(greatest(cx - rh, -85.05112878), 85.05112878) * (pi() / 180.0))) / pi()) / 2.0 * 64.0), 0.0), 63.0) AS BIGINT) AS y1
          FROM t),
        e1 AS (SELECT o_orderkey, unnest(range(x0, x1 + 1)) AS x, y0, y1 FROM rng),
        e2 AS (SELECT o_orderkey, x, unnest(range(y0, y1 + 1)) AS y FROM e1),
        h AS (SELECT o_orderkey,
                     '6/' || CAST(x AS VARCHAR) || '/' || CAST(y AS VARCHAR) AS cell
              FROM e2)
        SELECT cell AS tiles, CAST(COUNT(*) AS BIGINT) AS doc_count
        FROM h GROUP BY 1
        ORDER BY doc_count DESC, tiles
        LIMIT 60
      """.stripMargin.trim)),

    // ANALYZED highlight (r15, VERDICT r14 #5 — the everyday Kibana
    // view): an object-bodied match with the standard analyzer anchors
    // fragments on the RAW text at the analyzed token's case-insensitive
    // token-bounded occurrences, each wrapped keeping its original
    // casing. Mixed-case corpus (q228's transform): "Match" finds
    // "SPARK" and "spark" alike. The oracle locates occurrences on
    // lower(body) (positions carry over — ASCII fold is length-
    // preserving) and wraps with a case-insensitive regex; the fixed
    // 31-word corpus vocabulary never embeds 'spark' inside a longer
    // token, so position() IS the bounded occurrence.
    GraftQuery(
      "q399_dsl_highlight_analyzed",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val mixed = Tables.load(s, dir, "documents").withColumn("body",
          expr("replace(concat(upper(substring(text, 1, 20)), " +
            "substring(text, 21)), ' ', ', ')"))
        QueryDsl.search(mixed,
          """{"query": {"match": {"body": {"query": "Spark",
               "analyzer": "standard"}}},
             "highlight": {"fields": {"body": {"fragment_size": 40,
               "number_of_fragments": 2}}},
             "sort": ["doc_id"], "size": 60,
             "_source": ["doc_id", "highlight"]}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 replace(upper(substr(text, 1, 20)) || substr(text, 21),
                         ' ', ', ') AS body
          FROM documents),
        h AS (
          SELECT doc_id, body, lower(body) AS lb FROM mixed
          WHERE list_contains(string_split(
            trim(lower(regexp_replace(body, '[^A-Za-z0-9]+', ' ', 'g'))), ' '),
            'spark')),
        f AS (
          SELECT doc_id, body, lb, position('spark' IN lb) AS p1 FROM h),
        g AS (
          SELECT doc_id, body, p1,
                 CASE WHEN position('spark' IN substr(lb, p1 + 5)) > 0
                      THEN p1 + 5 + position('spark' IN substr(lb, p1 + 5)) - 1
                      END AS p2
          FROM f)
        SELECT doc_id,
               concat_ws(' ... ',
                 CASE WHEN p1 > 0
                      THEN regexp_replace(substr(body, GREATEST(p1 - 20, 1), 40),
                                          '(?i)spark', '<em>\0</em>', 'g') END,
                 CASE WHEN p2 IS NOT NULL
                      THEN regexp_replace(substr(body, GREATEST(p2 - 20, 1), 40),
                                          '(?i)spark', '<em>\0</em>', 'g') END)
                 AS highlight
        FROM g ORDER BY doc_id LIMIT 60
      """.stripMargin.trim)),

    // PIT pagination over a CDC-maintained ENTITY TABLE (r15, VERDICT
    // r14 #6): open a point-in-time pin on the merged table, then land
    // a delete-heavy merge AND a vacuum mid-session — the three
    // search_after pages must still reconstruct the PINNED ranking
    // exactly (the oracle pages the original state with row_number,
    // knowing nothing of the later merges).
    GraftQuery(
      "q400_pit_paged_entity",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.load(s, dir, "documents").select(
          col("doc_id").cast("string").as("_doc_id"),
          lit("upsert").as("_action"),
          col("doc_id").as("_seq"),
          col("n_chars").cast("long").as("rank"))
        val target = java.nio.file.Files
          .createTempDirectory("graft-pit-q400").toString
        graft.streaming.CdcStream.mergeBatch(s, docs, target, 1L)
        val pit = graft.streaming.TablePit.open(target)
        // mutations land mid-session: delete 1 in 3, re-rank 1 in 5
        graft.streaming.CdcStream.mergeBatch(s,
          docs.filter(col("_seq") % 3 === 0)
            .withColumn("_action", lit("delete"))
            .withColumn("_seq", col("_seq") + 1000000L), target, 2L)
        graft.streaming.CdcStream.mergeBatch(s,
          docs.filter(col("_seq") % 5 === 0)
            .withColumn("rank", col("rank") + 10000L)
            .withColumn("_seq", col("_seq") + 2000000L), target, 3L)
        graft.streaming.CdcStream.vacuum(target): Unit
        var after: Option[(Long, String)] = None
        val pages = (1 to 3).map { pno =>
          val sa = after.map { case (r, id) =>
            s""""search_after": [$r, "$id"],""" }.getOrElse("")
          val p = graft.streaming.TablePit.page(s, pit,
            s"""{"query": {"match_all": {}}, $sa
                "sort": [{"rank": "desc"}, "_doc_id"], "size": 100,
                "_source": ["_doc_id", "rank"]}""")
          val rows = p.collect()
          after = rows.lastOption.map(r => (r.getLong(1), r.getString(0)))
          import s.implicits._
          rows.toSeq.map(r => (pno.toLong, r.getString(0), r.getLong(1)))
            .toDF("page_no", "_doc_id", "rank")
        }
        graft.streaming.TablePit.release(pit)
        pages.reduce(_.unionByName(_))
          .orderBy(col("page_no"), col("rank").desc, col("_doc_id"))
      },
      Some("""
        WITH ranked AS (
          SELECT CAST(doc_id AS VARCHAR) AS _doc_id,
                 CAST(n_chars AS BIGINT) AS rank,
                 row_number() OVER (ORDER BY n_chars DESC,
                                    CAST(doc_id AS VARCHAR)) AS rn
          FROM documents)
        SELECT CAST((rn - 1) // 100 + 1 AS BIGINT) AS page_no, _doc_id, rank
        FROM ranked
        WHERE rn <= 300
        ORDER BY page_no, rank DESC, _doc_id
      """.stripMargin.trim)),

    // sidecar'd MULTIPOLYGON × circle query (r15 widening): the circle
    // pre-filter path — the compile expands the disk to a conservative
    // OUTER box (spherical bounds under the pinned haversine) for the
    // pushable corner conjunction, then kernel-walks survivors. Island
    // pairs make the oracle the q380 recipe twice: the box-clamped
    // closest point within the radius for EITHER square.
    GraftQuery(
      "q401_dsl_geo_sidecar_polys_circle",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = graft.etl.GeoEnvelope.materialize(
          Tables.load(s, dir, "orders")
            .withColumn("cx", expr(
              "CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
            .withColumn("cy", expr(
              "CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
            .withColumn("rh", expr("CAST(1 + o_orderkey % 4 AS DOUBLE)"))
            .withColumn("polys", expr(
              """CASE WHEN o_orderkey % 11 = 0
                   THEN CAST(NULL AS ARRAY<ARRAY<ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>>>)
                 ELSE array(
                   array(array(struct(cx - rh AS lat, cy - rh AS lon),
                               struct(cx - rh AS lat, cy + rh AS lon),
                               struct(cx + rh AS lat, cy + rh AS lon),
                               struct(cx + rh AS lat, cy - rh AS lon))),
                   array(array(struct(cx + 9.0 AS lat, cy + 9.0 AS lon),
                               struct(cx + 9.0 AS lat, cy + 11.0 AS lon),
                               struct(cx + 11.0 AS lat, cy + 11.0 AS lon),
                               struct(cx + 11.0 AS lat, cy + 9.0 AS lon)))) END""")),
          "polys", "polys")
        QueryDsl.search(o,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "multipolygon", "polys_field": "polys",
                 "envelope_fields": ["lat_min", "lat_max", "lon_min", "lon_max"]},
               "shape": {"type": "circle", "coordinates": [1.0009, 0.0007],
                         "radius": "300km"},
               "relation": "intersects"}},
             "sort": ["o_orderkey"], "size": 400,
             "_source": ["o_orderkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
                 CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(1 + o_orderkey % 4 AS DOUBLE) AS rh
          FROM orders
          WHERE o_orderkey % 11 <> 0),
        cl AS (
          SELECT o_orderkey,
                 greatest(cx - rh, least(cx + rh, 0.0007)) AS a_lat,
                 greatest(cy - rh, least(cy + rh, 1.0009)) AS a_lon,
                 greatest(cx + 9.0, least(cx + 11.0, 0.0007)) AS b_lat,
                 greatest(cy + 9.0, least(cy + 11.0, 1.0009)) AS b_lon
          FROM t)
        SELECT o_orderkey FROM cl
        WHERE round(CAST(12742.0176 AS DOUBLE) * asin(sqrt(
                sin((a_lat - 0.0007) * pi() / 180.0 / 2.0)
                  * sin((a_lat - 0.0007) * pi() / 180.0 / 2.0)
                + cos(0.0007 * pi() / 180.0) * cos(a_lat * pi() / 180.0)
                  * sin((a_lon - 1.0009) * pi() / 180.0 / 2.0)
                  * sin((a_lon - 1.0009) * pi() / 180.0 / 2.0))), 6) <= 300.0
           OR round(CAST(12742.0176 AS DOUBLE) * asin(sqrt(
                sin((b_lat - 0.0007) * pi() / 180.0 / 2.0)
                  * sin((b_lat - 0.0007) * pi() / 180.0 / 2.0)
                + cos(0.0007 * pi() / 180.0) * cos(b_lat * pi() / 180.0)
                  * sin((b_lon - 1.0009) * pi() / 180.0 / 2.0)
                  * sin((b_lon - 1.0009) * pi() / 180.0 / 2.0))), 6) <= 300.0
        ORDER BY o_orderkey
        LIMIT 400
      """.stripMargin.trim)),

    // geotile grid over GEOMETRYCOLLECTION docs (r15 widening): a
    // square component plus a far point component — a doc counts ONCE
    // per cell even when components overlap a cell, so the oracle
    // UNIONs (distinct) the square's tile rectangle with the point's
    // tile per row before counting. Corners carry a 4th-decimal offset:
    // inside a COLLECTION the candidate rectangle spans the whole
    // bbox, so a square edge exactly on a cell boundary (lat 0 is the
    // one clean mercator line; lon boundaries are 5.625-multiples,
    // 3-decimal) would expose the kernel's inclusive-touch cells that
    // a standalone square's own quantizer range crops away.
    GraftQuery(
      "q402_dsl_geotile_grid_collection",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = Tables.load(s, dir, "orders")
          .withColumn("cx", expr(
            "CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
          .withColumn("cy", expr(
            "CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
          .withColumn("rh", expr("CAST(1 + o_orderkey % 4 AS DOUBLE) + 0.0003"))
          .withColumn("shapes", expr(
            """CASE WHEN o_orderkey % 11 = 0
                 THEN CAST(NULL AS ARRAY<STRUCT<kind: STRING,
                   pts: ARRAY<ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>>>>)
               ELSE array(
                 struct('polygon' AS kind, array(array(
                   struct(cx - rh AS lat, cy - rh AS lon),
                   struct(cx - rh AS lat, cy + rh AS lon),
                   struct(cx + rh AS lat, cy + rh AS lon),
                   struct(cx + rh AS lat, cy - rh AS lon))) AS pts),
                 struct('point' AS kind, array(array(
                   struct(cx + 12.0007 AS lat, cy + 12.0003 AS lon))) AS pts)) END"""))
        QueryDsl.search(o,
          """{"size": 0, "aggs": {"tiles": {"geotile_grid": {
               "doc_shape": {"type": "geometrycollection",
                             "shapes_field": "shapes"},
               "precision": 6, "size": 60}}}}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
                 CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy,
                 CAST(1 + o_orderkey % 4 AS DOUBLE) + 0.0003 AS rh
          FROM orders
          WHERE o_orderkey % 11 <> 0),
        rng AS (
          SELECT o_orderkey,
            CAST(least(greatest(floor((cy - rh + 180.0) / 360.0 * 64.0), 0.0), 63.0) AS BIGINT) AS x0,
            CAST(least(greatest(floor((cy + rh + 180.0) / 360.0 * 64.0), 0.0), 63.0) AS BIGINT) AS x1,
            CAST(least(greatest(floor((1.0 - ln(tan(least(greatest(cx + rh, -85.05112878), 85.05112878) * (pi() / 180.0))
              + 1.0 / cos(least(greatest(cx + rh, -85.05112878), 85.05112878) * (pi() / 180.0))) / pi()) / 2.0 * 64.0), 0.0), 63.0) AS BIGINT) AS y0,
            CAST(least(greatest(floor((1.0 - ln(tan(least(greatest(cx - rh, -85.05112878), 85.05112878) * (pi() / 180.0))
              + 1.0 / cos(least(greatest(cx - rh, -85.05112878), 85.05112878) * (pi() / 180.0))) / pi()) / 2.0 * 64.0), 0.0), 63.0) AS BIGINT) AS y1,
            CAST(least(greatest(floor((cy + 12.0003 + 180.0) / 360.0 * 64.0), 0.0), 63.0) AS BIGINT) AS px,
            CAST(least(greatest(floor((1.0 - ln(tan(least(greatest(cx + 12.0007, -85.05112878), 85.05112878) * (pi() / 180.0))
              + 1.0 / cos(least(greatest(cx + 12.0007, -85.05112878), 85.05112878) * (pi() / 180.0))) / pi()) / 2.0 * 64.0), 0.0), 63.0) AS BIGINT) AS py
          FROM t),
        e1 AS (SELECT o_orderkey, unnest(range(x0, x1 + 1)) AS x, y0, y1, px, py FROM rng),
        e2 AS (SELECT o_orderkey, x, unnest(range(y0, y1 + 1)) AS y FROM e1),
        allc AS (
          SELECT o_orderkey, x, y FROM e2
          UNION
          SELECT o_orderkey, px AS x, py AS y FROM rng),
        h AS (SELECT '6/' || CAST(x AS VARCHAR) || '/' || CAST(y AS VARCHAR) AS cell
              FROM allc)
        SELECT cell AS tiles, CAST(COUNT(*) AS BIGINT) AS doc_count
        FROM h GROUP BY 1
        ORDER BY doc_count DESC, tiles
        LIMIT 60
      """.stripMargin.trim)),

    // ENGLISH highlight (r16, VERDICT r15 #2 — demoting the last
    // everyday fail-loud): anchors are raw TOKENS whose EnglishFold
    // stem equals the query stem ("Run" → "run" wraps "Running",
    // "running", "RUNS"), located by the token/separator interleave
    // walk; fragments stay on the RAW text, matched tokens fully
    // inside the window wrap keeping their casing, edge-cut tokens
    // stay unwrapped. The oracle replays the SAME walk with window-
    // function prefix sums over the unnested tokens plus the stem CASE
    // chain — any drift in a position, a wrap, or the window clamp
    // hash-fails.
    GraftQuery(
      "q403_dsl_highlight_english",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val mixed = Tables.load(s, dir, "documents").withColumn("body",
          expr("""concat(text,
            CASE WHEN doc_id % 4 = 0 THEN ' The JOINS were Running fast.'
                 WHEN doc_id % 4 = 1 THEN ' Parties wanted running shoes!'
                 ELSE ' nothing of note' END)"""))
        QueryDsl.search(mixed,
          """{"query": {"match": {"body": {"query": "Run",
               "analyzer": "english"}}},
             "highlight": {"fields": {"body": {"fragment_size": 30}}},
             "sort": ["doc_id"], "size": 80,
             "_source": ["doc_id", "highlight"]}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 4 = 0 THEN ' The JOINS were Running fast.'
                              WHEN doc_id % 4 = 1 THEN ' Parties wanted running shoes!'
                              ELSE ' nothing of note' END AS body
          FROM documents),
        tk AS (
          SELECT doc_id, body,
                 list_filter(string_split_regex(body, '[^A-Za-z0-9]+'),
                             t -> t <> '') AS toks,
                 string_split_regex(body, '[A-Za-z0-9]+') AS seps
          FROM mixed),
        u0 AS (
          SELECT doc_id, body, toks, seps,
                 unnest(generate_series(1, len(toks))) AS i
          FROM tk),
        u AS (
          SELECT doc_id, body, i, lower(toks[i]) AS lt, length(toks[i]) AS tl,
                 CAST(1 + SUM(length(seps[i])) OVER (PARTITION BY doc_id ORDER BY i)
                   + COALESCE(SUM(length(toks[i])) OVER (PARTITION BY doc_id
                       ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS pos
          FROM u0),
        st AS (
          SELECT doc_id, body, pos, tl,
            CASE WHEN lt IN ('a','an','and','are','as','at','be','but','by',
              'for','if','in','into','is','it','no','not','of','on','or',
              'such','that','the','their','then','there','these','they',
              'this','to','was','will','with') THEN ''
            ELSE CASE
              WHEN lt LIKE '%sses' THEN substr(lt, 1, length(lt)-2)
              WHEN lt LIKE '%ies' AND length(lt) >= 5 THEN substr(lt, 1, length(lt)-3) || 'y'
              WHEN lt LIKE '%ss' OR lt LIKE '%us' THEN lt
              WHEN lt LIKE '%s' AND length(lt) >= 4 THEN substr(lt, 1, length(lt)-1)
              WHEN lt LIKE '%ing' AND length(lt) >= 6 THEN CASE
                WHEN substr(lt, length(lt)-3, 1) = substr(lt, length(lt)-4, 1)
                 AND substr(lt, length(lt)-3, 1) IN ('b','d','f','g','m','n','p','r','t')
                THEN substr(lt, 1, length(lt)-4) ELSE substr(lt, 1, length(lt)-3) END
              WHEN lt LIKE '%ed' AND length(lt) >= 5 THEN CASE
                WHEN substr(lt, length(lt)-2, 1) = substr(lt, length(lt)-3, 1)
                 AND substr(lt, length(lt)-2, 1) IN ('b','d','f','g','m','n','p','r','t')
                THEN substr(lt, 1, length(lt)-3) ELSE substr(lt, 1, length(lt)-2) END
              ELSE lt END END AS stem
          FROM u),
        m AS (SELECT doc_id, pos, tl FROM st WHERE stem = 'run'),
        a AS (SELECT doc_id, MIN(pos) AS ap FROM m GROUP BY 1),
        b AS (
          SELECT a.doc_id, mixed.body, GREATEST(ap - 20, 1) AS fs,
                 LEAST(GREATEST(ap - 20, 1) + 29, length(mixed.body)) AS lc
          FROM a JOIN mixed ON a.doc_id = mixed.doc_id),
        w2 AS (
          SELECT m.doc_id, m.pos, m.tl, b.fs, b.lc, b.body
          FROM m JOIN b ON m.doc_id = b.doc_id
          WHERE m.pos >= b.fs AND m.pos + m.tl - 1 <= b.lc),
        asm AS (
          SELECT doc_id,
                 string_agg(substr(body, prev, pos - prev) || '<em>' ||
                            substr(body, pos, tl) || '</em>', ''
                            ORDER BY pos) AS mid,
                 MAX(pos + tl) AS ts,
                 ANY_VALUE(lc) AS lc, ANY_VALUE(body) AS body
          FROM (SELECT *, COALESCE(LAG(pos + tl) OVER (PARTITION BY doc_id
                  ORDER BY pos), fs) AS prev FROM w2)
          GROUP BY doc_id)
        SELECT b.doc_id,
               COALESCE(asm.mid || substr(asm.body, asm.ts, asm.lc - asm.ts + 1),
                        substr(b.body, b.fs, b.lc - b.fs + 1)) AS highlight
        FROM b LEFT JOIN asm ON b.doc_id = asm.doc_id
        ORDER BY b.doc_id
        LIMIT 80
      """.stripMargin.trim)),

    // CUSTOM analyzer: synonyms + stop list (r16, VERDICT r15 #6 — the
    // two knobs every real search deployment turns): an inline
    // {type: custom} analyzer over the standard base maps
    // "television" → "tv" (canonical = first member) and stops
    // "nothing", so `match "TV"` finds television docs and the stopped
    // token never matches. The oracle replays the full chain —
    // standard fold, custom stop filter, CASE synonym map — so any
    // drift in the fold order or the canonical choice hash-fails.
    GraftQuery(
      "q404_dsl_match_custom_synonyms",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val docs = Tables.load(s, dir, "documents").withColumn("body",
          expr("""concat(text,
            CASE WHEN doc_id % 3 = 0 THEN ' Big television sale'
                 WHEN doc_id % 3 = 1 THEN ' my TV broke'
                 ELSE ' nothing else' END)"""))
        QueryDsl.search(docs,
          """{"query": {"match": {"body": {"query": "TV",
               "analyzer": {"type": "custom", "base": "standard",
                 "stopwords": ["nothing"],
                 "synonyms": [["tv", "television"]]}}}},
             "sort": ["doc_id"], "size": 500, "_source": ["doc_id"]}""")
      },
      Some("""
        WITH mixed AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 3 = 0 THEN ' Big television sale'
                              WHEN doc_id % 3 = 1 THEN ' my TV broke'
                              ELSE ' nothing else' END AS body
          FROM documents),
        an AS (
          SELECT doc_id,
            list_transform(list_filter(
              string_split(trim(lower(regexp_replace(body, '[^A-Za-z0-9]+', ' ', 'g'))), ' '),
              t -> t <> '' AND t <> 'nothing'),
              t -> CASE WHEN t = 'television' THEN 'tv' ELSE t END) AS toks
          FROM mixed)
        SELECT doc_id FROM an
        WHERE list_contains(toks, 'tv')
        ORDER BY doc_id
        LIMIT 500
      """.stripMargin.trim)),

    // Sidecar AUTO-WIRING (r16, VERDICT r15 #4): q392's exact query
    // with NO `envelope_fields` spelled — the materialize-time schema
    // metadata injects the pushable corner pre-filter at compile, so
    // the answer (and this oracle) stays byte-identical to q392's
    // while the request is what a user who forgot the option writes.
    GraftQuery(
      "q405_dsl_geo_sidecar_autowired",
      (s, dir) => {
        import org.apache.spark.sql.functions.expr
        val o = graft.etl.GeoEnvelope.materialize(
          Tables.load(s, dir, "orders")
            .withColumn("cx", expr(
              "CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8"))
            .withColumn("cy", expr(
              "CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17"))
            .withColumn("ring", expr(
              """CASE WHEN o_orderkey % 11 = 0
                   THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
                 WHEN o_orderkey % 13 = 0
                   THEN array(struct(CAST(1.0 AS DOUBLE) AS lat, CAST(2.0 AS DOUBLE) AS lon),
                              struct(CAST(3.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon))
                 ELSE concat(
                   array(struct(cx AS lat, cy AS lon)),
                   flatten(transform(sequence(0, 15), j -> array(
                     struct(cx + 0.25 + CAST((o_orderkey + j) % 8 AS DOUBLE) * 0.25 AS lat,
                            cy + CAST(j AS DOUBLE) * 0.5 AS lon),
                     struct(cx + 0.25 + CAST((o_orderkey + j) % 8 AS DOUBLE) * 0.25 AS lat,
                            cy + CAST(j + 1 AS DOUBLE) * 0.5 AS lon)))),
                   array(struct(cx AS lat, cy + 8.0 AS lon))) END""")),
          "ring", "polygon")
        QueryDsl.search(o,
          """{"query": {"geo_shape": {
               "doc_shape": {"type": "polygon", "ring_field": "ring"},
               "shape": {"type": "point", "coordinates": [-2.0007, 0.0004]},
               "relation": "contains"}},
             "sort": ["o_orderkey"], "size": 300,
             "_source": ["o_orderkey"]}""")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
                 CAST((o_orderkey * 2654435761) % 16000 AS DOUBLE) / 1000 - 8 AS cx,
                 CAST((o_orderkey * 40503 + 7) % 34000 AS DOUBLE) / 1000 - 17 AS cy
          FROM orders
          WHERE o_orderkey % 11 <> 0 AND o_orderkey % 13 <> 0)
        SELECT o_orderkey FROM t
        WHERE (-2.0007 - cy) > 0 AND (-2.0007 - cy) < 8
          AND 0.0004 > cx
          AND 0.0004 < cx + 0.25 + CAST((o_orderkey
                + CAST(floor((-2.0007 - cy) * 2) AS BIGINT)) % 8 AS DOUBLE) * 0.25
        ORDER BY o_orderkey
        LIMIT 300
      """.stripMargin.trim)),

    // FILTERED kNN on the PAYLOAD index layout (r16, VERDICT r15 #1 —
    // the top real-user gap): the IVF layout carries the `label`
    // payload column, so the DSL filter compiles into the pruned
    // partition scan (candidates drop BEFORE the top-k heaps; the
    // corpus is never read at serve time). nprobe == nlist degenerates
    // the probe to the exact filtered ranking, which DuckDB replays
    // over the SAME unit vectors — the raw (unnormalized) query vector
    // in the oracle's dot product only scales sims by the positive
    // constant |q|, so the ranking is identical; sims are projected
    // away (IEEE division order differs across engines).
    GraftQuery(
      "q406_knn_index_filtered_payload",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val emb = Tables.load(s, dir, "embeddings")
        val idx = java.nio.file.Files
          .createTempDirectory("graft-q406-ivf").toString
        graft.operators.IvfIndex.writeIndex(emb, "vec_id", "embedding",
          graft.operators.IvfIndex.Params(nlist = 8, nprobe = 8, iters = 2),
          idx, payloadCols = Seq("label"))
        val qv = (0 until 64).map(i => ((i * 3) % 11 - 5) / 20.0)
        QueryDsl.search(emb,
          s"""{"knn": {"field": "embedding", "id_field": "vec_id",
               "query_vector": [${qv.mkString(",")}], "k": 10,
               "filter": {"range": {"label": {"lte": 4}}},
               "index": {"path": "$idx", "nprobe": 8}}}""")
          .select(col("vec_id"), col("rank"))
      },
      Some {
        val qlit = (0 until 64).map(i =>
          s"CAST(${((i * 3) % 11 - 5) / 20.0} AS DOUBLE)").mkString("[", ",", "]")
        s"""
        WITH e AS (
          SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q
          FROM embeddings),
        n AS (
          SELECT vec_id, label,
                 CASE WHEN list_dot_product(q, q) > 0
                      THEN list_transform(q, x -> x / sqrt(list_dot_product(q, q)))
                      ELSE q END AS u
          FROM e),
        s AS (SELECT vec_id, list_dot_product(u, $qlit) AS sim
              FROM n WHERE label <= 4),
        rk AS (SELECT vec_id,
                      CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
               FROM s)
        SELECT vec_id, rank FROM rk WHERE rank <= 10 ORDER BY rank
        """.stripMargin.trim
      }),

    // PIT over the VERSIONED vector store (r16, VERDICT r15 #5 — the
    // q400 contract on the IVF serving layout): open a pin, land a
    // delete-heavy copy-on-write merge AND a vacuum mid-session, and
    // the pinned probe must still reconstruct the ORIGINAL ranking —
    // the oracle ranks the original corpus by unit-vector cosine,
    // knowing nothing of the later merge. nprobe == nlist makes the
    // probe exact; sims are projected away (IEEE division order).
    GraftQuery(
      "q407_ivf_pit_across_merge",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val emb = Tables.load(s, dir, "embeddings")
        val root = java.nio.file.Files
          .createTempDirectory("graft-q407-ivf").toString
        val p = graft.operators.IvfIndex.Params(nlist = 8, nprobe = 8,
          iters = 2, k = 10)
        graft.operators.IvfAlias.build(emb, "vec_id", "embedding", p, root)
        val pit = graft.operators.IvfAlias.openPit(s, root)
        // mutations land mid-session: every third vector deleted
        graft.operators.IvfAlias.merge(s, root,
          emb.filter(col("vec_id") % 3 === 0)
            .select(col("vec_id"), col("embedding"),
              lit("delete").as("_action")),
          "vec_id", "embedding")
        graft.operators.IvfAlias.vacuum(s, root): Unit
        val qv = (0 until 64).map(i => ((i * 3) % 11 - 5) / 20.0)
        import s.implicits._
        val qdf = Seq((-1L, qv.map(_.toFloat).toArray)).toDF("q_id", "q_emb")
        val out = graft.operators.IvfAlias.topK(s, root, qdf,
            "q_id", "q_emb", p, pit = Some(pit))
          .select(col("neighbor_id").as("vec_id"), col("rank"))
          .orderBy(col("rank"))
          // materialize before release unpins the frozen composition
          .localCheckpoint(true)
        graft.operators.IvfAlias.release(s, pit)
        out
      },
      Some {
        val qlit = (0 until 64).map(i =>
          s"CAST(${((i * 3) % 11 - 5) / 20.0} AS DOUBLE)").mkString("[", ",", "]")
        s"""
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q
          FROM embeddings),
        n AS (
          SELECT vec_id,
                 CASE WHEN list_dot_product(q, q) > 0
                      THEN list_transform(q, x -> x / sqrt(list_dot_product(q, q)))
                      ELSE q END AS u
          FROM e),
        s AS (SELECT vec_id, list_dot_product(u, $qlit) AS sim FROM n),
        rk AS (SELECT vec_id,
                      CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
               FROM s)
        SELECT vec_id, rank FROM rk WHERE rank <= 10 ORDER BY rank
        """.stripMargin.trim
      })
  )
}

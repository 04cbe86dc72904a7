package graft.queries

import graft.GraftQuery
import graft.search.QueryDsl
import graft.sources.Tables

/** [[DslSearch]] continued — the middle third of the query-DSL sweep
  * (terms `missing` through the span/geo/endpoint families). Pure
  * registry data: the split is mechanical (one Seq cut at entry
  * boundaries), gated by the identical full-registry oracle run.
  */
object DslSearchMid {
  import DslSearch.geohashSqlParts
  private[queries] def queries: Seq[GraftQuery] = Seq(
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

  )
}

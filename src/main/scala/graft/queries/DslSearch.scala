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
  */
object DslSearch {

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
      """.stripMargin.trim))
  )
}

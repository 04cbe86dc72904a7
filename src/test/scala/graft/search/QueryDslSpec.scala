package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** The query-DSL compiler's contract: a compiled JSON request is
  * indistinguishable from the handwritten DataFrame plan it mirrors —
  * same rows, same order, same schema — and malformed/unsupported
  * requests fail loud at compile time (never a silently-wrong plan).
  */
class QueryDslSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf(), "documents")

  private def sameAs(name: String, dslName: String): Unit = {
    val hand = graft.Registry.byName(name).run(spark, sf())
    val dsl = graft.Registry.byName(dslName).run(spark, sf())
    assert(dsl.columns.toSeq === hand.columns.toSeq, s"$dslName columns")
    assert(dsl.collect().toSeq === hand.collect().toSeq, s"$dslName rows")
  }

  test("compiled bool request == handwritten q40 (rows, order, schema)") {
    sameAs("q40_search_bool", "q135_dsl_bool")
  }

  test("compiled match request == handwritten q41 incl. LONG scores") {
    sameAs("q41_search_match", "q136_dsl_match")
  }

  test("compiled terms+stats aggs == handwritten q43") {
    sameAs("q43_search_terms_stats", "q137_dsl_terms_stats")
  }

  test("sort + from/size paginates like the handwritten q42") {
    val hand = graft.Registry.byName("q42_search_pagination").run(spark, sf())
    val dsl = QueryDsl.search(docs,
      """{"sort": [{"n_chars": "desc"}, "doc_id"],
          "from": 20, "size": 10,
          "_source": ["doc_id", "n_chars", "source"]}""")
    assert(dsl.collect().toSeq === hand.collect().toSeq)
  }

  test("filter pushdown survives compilation: PushedFilters reach the scan") {
    val dsl = QueryDsl.search(docs,
      """{"query": {"bool": {"must": [
           {"term": {"lang": "en"}},
           {"range": {"n_chars": {"gte": 200}}}]}},
         "_source": ["doc_id"]}""")
    val plan = dsl.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(500))
    assert(plan.contains("IsNotNull(lang)") || plan.contains("EqualTo(lang,en)"),
      plan.take(2000))
  }

  test("wildcard translates OpenSearch globs and escapes LIKE metachars") {
    assert(QueryDsl.wildcardToLike("src*") === "src%")
    assert(QueryDsl.wildcardToLike("a?c") === "a_c")
    assert(QueryDsl.wildcardToLike("50%_x") === "50\\%\\_x")
    val hits = QueryDsl.search(docs,
      """{"query": {"wildcard": {"source": "src1*"}}, "_source": ["source"]}""")
      .distinct().collect().map(_.getString(0))
    assert(hits.nonEmpty && hits.forall(_.startsWith("src1")))
  }

  test("exists / match_phrase / match_all compile to the engine contracts") {
    val total = docs.count()
    assert(QueryDsl.search(docs, """{"query": {"match_all": {}}}""").count() === total)
    assert(QueryDsl.search(docs,
      """{"query": {"exists": {"field": "lang"}}}""").count() ===
      docs.filter(col("lang").isNotNull).count())
    val phrase = QueryDsl.search(docs,
      """{"query": {"match_phrase": {"text": "spark join"}}}""").count()
    val direct = docs.filter(
      concat(lit(" "), col("text"), lit(" ")).contains(" spark join ")).count()
    assert(phrase === direct && phrase > 0)
  }

  test("bool should-only defaults minimum_should_match to 1") {
    val dsl = QueryDsl.search(docs,
      """{"query": {"bool": {"should": [
           {"term": {"lang": "de"}}, {"term": {"lang": "fr"}}]}},
         "_source": ["lang"]}""")
      .distinct().collect().map(_.getString(0)).toSet
    assert(dsl === Set("de", "fr"))
  }

  test("bool with must ignores unmatched shoulds but scores matched ones") {
    val rows = QueryDsl.search(docs,
      """{"query": {"bool": {
           "must": [{"term": {"lang": "en"}}],
           "should": [{"term": {"source": "src1"}}]}},
         "_source": ["source", "score"]}""").collect()
    assert(rows.map(_.getString(0)).toSet.size > 1) // unmatched shoulds kept
    rows.foreach { r =>
      val expected = if (r.getString(0) == "src1") 2L else 1L
      assert(r.getLong(1) === expected)
    }
  }

  test("metric-only aggs produce one global row; cardinality is exact") {
    val row = QueryDsl.search(docs,
      """{"aggs": {
           "n_langs": {"cardinality": {"field": "lang"}},
           "chars": {"stats": {"field": "n_chars"}}}}""").collect()
    assert(row.length === 1)
    val r = row.head
    assert(r.getAs[Long]("n_langs") ===
      docs.select(countDistinct(col("lang"))).head().getLong(0))
    assert(r.getAs[Long]("chars_count") === docs.count())
    assert(r.getAs[Long]("chars_min") ===
      docs.agg(min(col("n_chars"))).head().getLong(0))
  }

  test("date_histogram buckets by calendar day") {
    val events = Tables.load(spark, sf(), "events")
    val dsl = QueryDsl.search(events,
      """{"aggs": {"day": {"date_histogram":
           {"field": "ts", "calendar_interval": "day"}}}}""")
    val direct = events.groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("day").asc)
    assert(dsl.collect().toSeq === direct.collect().toSeq)
  }

  test("unsupported clauses, sections and request keys fail loud") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"query": {"fuzzy": {"lang": "en"}}}""", "unsupported query clause")
    bad("""{"query": {"bool": {"mustt": []}}}""", "unsupported bool section")
    bad("""{"query": {"range": {"n_chars": {"between": 3}}}}""", "range bound")
    bad("""{"knn": {}}""", "unsupported request key")
    bad("""{"query": {"match": {"text": {"query": "x", "fuzziness": 2}}}}""",
      "unsupported match option")
    bad("""{"aggs": {"a": {"percentiles": {"field": "n_chars"}}}}""",
      "unsupported metric agg")
  }
}

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

  test("post_filter predicate pushes into the scan when nothing blocks it") {
    val dsl = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}},
         "post_filter": {"range": {"n_chars": {"lt": 500}}},
         "_source": ["doc_id"]}""")
    val plan = dsl.queryExecution.executedPlan.toString
    // applied after scoring SEMANTICALLY, but with no window/rescore
    // in between Catalyst still pushes the predicate to the scan
    assert(plan.contains("PushedFilters"), plan.take(500))
    assert(plan.contains("LessThan(n_chars,500)"), plan.take(2000))
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
    bad("""{"query": {"geo_circle": {"area": {}}}}""", "unsupported query clause")
    bad("""{"query": {"bool": {"mustt": []}}}""", "unsupported bool section")
    bad("""{"query": {"range": {"n_chars": {"between": 3}}}}""", "range bound")
    bad("""{"pit": {}}""", "unsupported request key")
    bad("""{"query": {"match": {"text": {"query": "x", "fuzzinesss": 2}}}}""",
      "unsupported match option")
    bad("""{"aggs": {"a": {"weighted_median": {"field": "n_chars"}}}}""",
      "unsupported metric agg")
    bad("""{"query": {"dis_max": {"queries": [], "tie_breaker": 0.3}}}""",
      "non-empty queries")
    bad("""{"query": {"dis_max": {"queries": [{"match_all": {}}], "tie_breaker": 1.5}}}""",
      "tie_breaker must be in [0, 1]")
    bad("""{"query": {"boosting": {"positive": {"match_all": {}},
           "negative": {"match_all": {}}}}}""", "negative_boost")
    bad("""{"query": {"terms_set": {"text": {"terms": ["a"]}}}}""",
      "minimum_should_match")
    bad("""{"search_after": [1], "sort": ["doc_id"], "from": 3}""",
      "cannot be combined with from")
    bad("""{"search_after": [1, 2], "sort": ["doc_id"]}""",
      "one value per sort key")
    bad("""{"search_after": [1]}""", "requires an explicit sort")
    bad("""{"aggs": {"a": {"range": {"field": "n_chars",
           "ranges": [{}]}}}}""", "unbounded range")
    bad("""{"aggs": {"a": {"terms": {"field": "lang"},
           "aggs": {"t": {"top_hits": {"size": 2, "sort": ["doc_id"]}}}}}}""",
      "_source")
  }

  test("search_after page == from-offset page (keyset paging contract)") {
    val sort = """[{"n_chars": "desc"}, "doc_id"]"""
    val p1 = QueryDsl.search(docs,
      s"""{"sort": $sort, "size": 10, "_source": ["doc_id", "n_chars"]}""").collect()
    val last = p1.last
    val viaAfter = QueryDsl.search(docs,
      s"""{"sort": $sort, "search_after": [${last.getLong(1)}, ${last.getLong(0)}],
           "size": 10, "_source": ["doc_id", "n_chars"]}""").collect()
    val viaFrom = QueryDsl.search(docs,
      s"""{"sort": $sort, "from": 10, "size": 10,
           "_source": ["doc_id", "n_chars"]}""").collect()
    assert(viaAfter.toSeq === viaFrom.toSeq)
    assert(viaAfter.nonEmpty)
  }

  test("fuzzy scores distinct in-edit-distance tokens; prefix_length gates") {
    val dsl = QueryDsl.search(docs,
      """{"query": {"fuzzy": {"text":
           {"value": "spark", "fuzziness": 1, "prefix_length": 1}}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""").collect()
    val direct = docs
      .withColumn("score", size(filter(array_distinct(split(col("text"), " ")),
        t => t.startsWith("s") && levenshtein(t, lit("spark")) <= 1)).cast("long"))
      .filter(col("score") >= 1)
      .orderBy("doc_id").select("doc_id", "score").collect()
    assert(dsl.toSeq === direct.toSeq)
    assert(dsl.nonEmpty)
  }

  test("match fuzziness: per-term edit distance, AUTO, fuzzy-clause hit-set parity") {
    import spark.implicits._
    val t = Seq((1L, "spark joins"), (2L, "sprk window"), (3L, "apache sparks"),
      (4L, "nothing here"), (5L, "go gone")).toDF("id", "text")
    def ids(q: String): Seq[Long] = QueryDsl.search(t,
      s"""{"query": $q, "sort": ["id"], "_source": ["id"]}""")
      .as[Long].collect().toSeq
    // fuzziness 1: "spark" also matches sprk / sparks
    assert(ids("""{"match": {"text": {"query": "spark",
      "fuzziness": 1}}}""") === Seq(1L, 2L, 3L))
    // hit-set parity with the standalone fuzzy clause (scores differ
    // by design: fuzzy counts matched TOKENS, match counts matched
    // query TERMS)
    assert(ids("""{"fuzzy": {"text": {"value": "spark",
      "fuzziness": 1}}}""") === Seq(1L, 2L, 3L))
    // the exact path is untouched
    assert(ids("""{"match": {"text": "spark"}}""") === Seq(1L))
    // prefix_length bounds candidates: "sprk" fails the "spa" prefix
    assert(ids("""{"match": {"text": {"query": "spark", "fuzziness": 1,
      "prefix_length": 3}}}""") === Seq(1L, 3L))
    // AUTO: 2-char terms get 0 edits (exact only), 3-5 chars get 1
    assert(ids("""{"match": {"text": {"query": "go",
      "fuzziness": "AUTO"}}}""") === Seq(5L))
    assert(ids("""{"match": {"text": {"query": "gos",
      "fuzziness": "AUTO"}}}""") === Seq(5L))
    // score counts fuzzy-matched QUERY TERMS; msm gates on it
    val scored = QueryDsl.search(t,
      """{"query": {"match": {"text": {"query": "spark window",
           "fuzziness": 1, "minimum_should_match": 2}}},
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(scored === Seq((2L, 2L)))
    // multi_match threads the same option across fields
    val mm = QueryDsl.search(
      t.withColumnRenamed("text", "a").withColumn("b", lit("zzz")),
      """{"query": {"multi_match": {"query": "sprak", "fuzziness": 2,
           "fields": ["a", "b"], "type": "most_fields"}},
         "sort": ["id"], "_source": ["id"]}""")
    assert(mm.as[Long].collect().toSeq === Seq(1L, 2L),
      "sprak~2 reaches spark(2)/sprk(1) but not sparks(3)")
    def bad(q: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t,
        s"""{"query": $q}"""))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"match": {"text": {"query": "x", "fuzziness": 3}}}""",
      "fuzziness must be 0-2")
    bad("""{"match": {"text": {"query": "x", "fuzziness": "AUTO:3,6"}}}""",
      "fuzziness must be an int")
    bad("""{"match": {"text": {"query": "x", "prefix_length": 1}}}""",
      "prefix_length requires fuzziness")
    bad("""{"match": {"text": {"query": "x", "fuzziness": 1,
      "prefix_length": -1}}}""", "prefix_length must be >= 0")
  }

  test("fuzziness transpositions: adjacent swap is one edit when opted in") {
    import spark.implicits._
    val t = Seq((1L, "spark rules"), (2L, "sprak typo"), (3L, "spa short"))
      .toDF("id", "text")
    def ids(q: String): Seq[Long] = QueryDsl.search(t,
      s"""{"query": $q, "sort": ["id"], "_source": ["id"]}""")
      .as[Long].collect().toSeq
    // sprak = spark with one adjacent swap: DL 1, levenshtein 2 — the
    // engine default (false) keeps the plain-levenshtein model
    assert(ids("""{"fuzzy": {"text": {"value": "sprak",
      "fuzziness": 1}}}""") === Seq(2L))
    assert(ids("""{"fuzzy": {"text": {"value": "sprak",
      "fuzziness": 1, "transpositions": true}}}""") === Seq(1L, 2L))
    assert(ids("""{"fuzzy": {"text": {"value": "sprak",
      "fuzziness": 1, "transpositions": false}}}""") === Seq(2L))
    // the match-family option threads through overlapScore
    assert(ids("""{"match": {"text": {"query": "sprak",
      "fuzziness": 1, "transpositions": true}}}""") === Seq(1L, 2L))
    assert(ids("""{"match": {"text": {"query": "sprak",
      "fuzziness": 1}}}""") === Seq(2L))
    // and multi_match
    assert(ids("""{"multi_match": {"query": "sprak", "fields": ["text"],
      "fuzziness": 1, "transpositions": true}}""") === Seq(1L, 2L))
    // span_multi fuzzy takes it too (position count over the swap)
    val spans = QueryDsl.search(t,
      """{"query": {"span_multi": {
          "match": {"fuzzy": {"text": {"value": "sprak", "fuzziness": 1,
            "transpositions": true}}},
          "id_field": "id"}}, "_source": ["id", "n_spans"]}""")
      .as[(Long, Long)].collect().toMap
    assert(spans === Map(1L -> 1L, 2L -> 1L))
    def bad(q: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t,
        s"""{"query": $q}"""))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"match": {"text": {"query": "x", "transpositions": true}}}""",
      "transpositions requires fuzziness")
    bad("""{"match": {"text": {"query": "x", "fuzziness": 1,
      "transpositions": 1}}}""", "transpositions must be a boolean")
    bad("""{"fuzzy": {"text": {"value": "x", "transpositions": "yes"}}}""",
      "transpositions must be a boolean")
  }

  test("terms lookup resolves the values array from one row of the table") {
    import spark.implicits._
    val t = Seq(
      (1L, "news", "a", Seq("a", "b"), Some(10L)),
      (2L, "blog", "b", Seq("b"), Some(20L)),
      (3L, "news", "c", Seq.empty[String], None),
      (4L, "wiki", "a", Seq("a"), Some(10L)))
      .toDF("id", "kind", "tag1", "tags", "score_ref")
    def ids(req: String): Seq[Long] = QueryDsl.search(t, req)
      .as[Long].collect().toSeq
    // array path: doc 1's tags become the values list
    assert(ids("""{"query": {"terms": {"kind":
        {"id_field": "id", "id": 1, "path": "kind"}}},
      "sort": ["id"], "_source": ["id"]}""") === Seq(1L, 3L))
    // scalar path on a LONG column keeps the type
    assert(ids("""{"query": {"terms": {"score_ref":
        {"id_field": "id", "id": 4, "path": "score_ref"}}},
      "sort": ["id"], "_source": ["id"]}""") === Seq(1L, 4L))
    // the resolved clause composes inside bool like any terms
    assert(ids("""{"query": {"bool": {
        "must": [{"terms": {"kind":
          {"id_field": "id", "id": 1, "path": "kind"}}}],
        "must_not": [{"term": {"id": 1}}]}},
      "sort": ["id"], "_source": ["id"]}""") === Seq(3L))
    // and in post_filter
    assert(ids("""{"query": {"match_all": {}},
      "post_filter": {"terms": {"kind":
        {"id_field": "id", "id": 2, "path": "kind"}}},
      "sort": ["id"], "_source": ["id"]}""") === Seq(2L))
    def bad(req: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, req))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"terms": {"kind":
      {"index": "other", "id": 1, "path": "kind"}}}}""",
      "'index' is unsupported")
    bad("""{"query": {"terms": {"kind":
      {"id_field": "id", "id": 99, "path": "kind"}}}}""",
      "no row with id")
    bad("""{"query": {"terms": {"kind":
      {"id_field": "kind", "id": "news", "path": "kind"}}}}""",
      "not unique")
    bad("""{"query": {"terms": {"kind":
      {"id_field": "id", "id": 3, "path": "score_ref"}}}}""",
      "is NULL at")
    bad("""{"query": {"terms": {"kind":
      {"id_field": "id", "id": 3, "path": "tags"}}}}""",
      "is empty at")
    bad("""{"query": {"terms": {"kind":
      {"id_field": "id", "id": 1, "path": "kind", "routing": "x"}}}}""",
      "unsupported terms lookup option 'routing'")
    bad("""{"query": {"terms": {"kind":
      {"id": 1, "path": "kind"}}}}""", "requires id_field")
    // an array path feeds a terms list with several values
    assert(ids("""{"query": {"terms": {"tag1":
        {"id_field": "id", "id": 1, "path": "tags"}}},
      "sort": ["id"], "_source": ["id"]}""") === Seq(1L, 2L, 4L))
  }

  test("minimum_should_match percentage form resolves against the clause count") {
    import spark.implicits._
    val t = Seq((1L, "a b c d"), (2L, "a b"), (3L, "a"), (4L, "x y"))
      .toDF("id", "text")
    def ids(q: String): Seq[Long] = QueryDsl.search(t,
      s"""{"query": $q, "sort": ["id"], "_source": ["id"]}""")
      .as[Long].collect().toSeq
    // match: "75%" of 4 terms = 3 (floor)
    assert(ids("""{"match": {"text": {"query": "a b c d",
      "minimum_should_match": "75%"}}}""") === Seq(1L))
    // "50%" of 4 = 2
    assert(ids("""{"match": {"text": {"query": "a b c d",
      "minimum_should_match": "50%"}}}""") === Seq(1L, 2L))
    // floor clamps to 1 outside bool (25% of 2 terms = 0 would be a
    // vacuous gate)
    assert(ids("""{"match": {"text": {"query": "a b",
      "minimum_should_match": "25%"}}}""") === Seq(1L, 2L, 3L))
    // bool: percentage of the SHOULD count; 0 stays legal next to must
    assert(ids("""{"bool": {
      "should": [{"term": {"text": "zzz"}}, {"match": {"text": "a"}},
                 {"match": {"text": "b"}}, {"match": {"text": "c"}}],
      "minimum_should_match": "50%"}}""") === Seq(1L, 2L))
    assert(ids("""{"bool": {"must": [{"match": {"text": "a"}}],
      "should": [{"match": {"text": "x"}}],
      "minimum_should_match": 0}}""") === Seq(1L, 2L, 3L))
    // multi_match and match_bool_prefix take the same form
    assert(ids("""{"multi_match": {"query": "a b c d", "fields": ["text"],
      "minimum_should_match": "75%", "type": "most_fields"}}""") === Seq(1L))
    // multi_match operator and = every term, per field
    assert(ids("""{"multi_match": {"query": "a b", "fields": ["text"],
      "operator": "and"}}""") === Seq(1L, 2L))
    assert(ids("""{"multi_match": {"query": "a b", "fields": ["text"],
      "operator": "or"}}""") === Seq(1L, 2L, 3L))
    assert(ids("""{"match_bool_prefix": {"text": {"query": "a b c",
      "minimum_should_match": "100%"}}}""") === Seq(1L))
    def bad(q: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t,
        s"""{"query": $q}"""))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"match": {"text": {"query": "a b", "minimum_should_match": "150%"}}}""",
      "must be 1-100%")
    bad("""{"match": {"text": {"query": "a b", "minimum_should_match": "3<90%"}}}""",
      "percentage must be an integer")
    bad("""{"match": {"text": {"query": "a b", "minimum_should_match": "two"}}}""",
      "must be \"NN%\"")
    bad("""{"match": {"text": {"query": "a b", "minimum_should_match": -1}}}""",
      "must be >= 1")
    bad("""{"bool": {"should": [{"match": {"text": "a"}}],
      "minimum_should_match": -1}}""", "must be >= 0")
    bad("""{"multi_match": {"query": "a b", "fields": ["text"],
      "operator": "and", "minimum_should_match": 1}}""",
      "operator and minimum_should_match cannot be combined")
    bad("""{"multi_match": {"query": "a b", "fields": ["text"],
      "operator": "xor"}}""", "operator must be and/or")
    bad("""{"multi_match": {"query": "a b", "fields": ["text"],
      "type": "phrase", "operator": "and"}}""",
      "type phrase does not take operator")
  }

  test("term-level boost on prefix/wildcard/regexp/fuzzy scales the score") {
    import spark.implicits._
    val t = Seq((1L, "spark fast"), (2L, "spam slow"), (3L, "other"))
      .toDF("id", "text")
    def scores(q: String): Seq[(Long, Long)] = QueryDsl.search(t,
      s"""{"query": $q, "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(scores("""{"prefix": {"text": {"value": "spa", "boost": 4}}}""") ===
      Seq((1L, 4L), (2L, 4L)))
    assert(scores("""{"wildcard": {"text": {"value": "spa*", "boost": 3}}}""") ===
      Seq((1L, 3L), (2L, 3L)))
    assert(scores("""{"regexp": {"text": {"value": "spark.*", "boost": 5}}}""") ===
      Seq((1L, 5L)))
    // fuzzy boost scales the token count, the gate stays unboosted
    // (spark→spar = 1 deletion, spam→spar = 1 substitution)
    assert(scores("""{"fuzzy": {"text": {"value": "spar", "fuzziness": 1,
      "boost": 10}}}""") === Seq((1L, 10L), (2L, 10L)))
    // dis_max over differently-boosted term-level arms ranks by boost
    assert(scores("""{"dis_max": {"queries": [
      {"prefix": {"text": {"value": "spark", "boost": 2}}},
      {"prefix": {"text": {"value": "spa", "boost": 1}}}]}}""")
      .map(_._1) === Seq(1L, 2L))
    def bad(q: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t,
        s"""{"query": $q}"""))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"prefix": {"text": {"value": "spa", "boost": 1.5}}}""",
      "boost must be a positive integer")
    bad("""{"wildcard": {"text": {"value": "spa*", "boost": 0}}}""",
      "boost must be a positive integer")
    bad("""{"fuzzy": {"text": {"value": "spam", "boost": -2}}}""",
      "boost must be a positive integer")
    // span_multi stays boost-less (spans are positional)
    bad("""{"span_multi": {"match": {"prefix": {"text":
      {"value": "spa", "boost": 2}}}, "id_field": "id"}}""",
      "unsupported span_multi prefix option 'boost'")
    // range sibling boost; terms body-level boost (the _name placement)
    assert(scores("""{"range": {"id": {"gte": 2, "boost": 7}}}""") ===
      Seq((2L, 7L), (3L, 7L)))
    assert(scores("""{"terms": {"id": [1, 3], "boost": 6}}""") ===
      Seq((1L, 6L), (3L, 6L)))
    bad("""{"range": {"id": {"gte": 2, "boost": 0.5}}}""",
      "range boost must be a positive integer")
    bad("""{"terms": {"id": [1], "boost": "2"}}""",
      "terms boost must be a positive integer")
  }

  test("intervals any_of/all_of compose span sets over one position stream") {
    import spark.implicits._
    val t = Seq((1L, "a x b y c"), (2L, "b a c"), (3L, "a b a b"),
      (4L, "z z z")).toDF("id", "text")
    def run(json: String): Map[Long, Long] =
      QueryDsl.search(t, json).select("id", "n_spans").as[(Long, Long)]
        .collect().toMap
    // any_of: union of a prefix rule and a two-term chain
    assert(run("""{"query": {"intervals": {"text": {"any_of": {"intervals": [
        {"prefix": {"prefix": "a"}},
        {"match": {"query": "b c", "max_gaps": 1, "ordered": true}}]}},
        "id_field": "id"}}}""") ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // all_of: ordered non-overlapping sequence with a shared gap budget
    assert(run("""{"query": {"intervals": {"text": {"all_of": {
        "intervals": [{"match": {"query": "a"}}, {"match": {"query": "b"}}],
        "max_gaps": 2, "ordered": true}},
        "id_field": "id"}}}""") ===
      Map(1L -> 1L, 3L -> 3L))
    // nesting: any_of inside all_of
    assert(run("""{"query": {"intervals": {"text": {"all_of": {
        "intervals": [
          {"any_of": {"intervals": [{"prefix": {"prefix": "a"}},
                                    {"prefix": {"prefix": "b"}}]}},
          {"match": {"query": "c"}}],
        "max_gaps": 3, "ordered": true}},
        "id_field": "id"}}}""") ===
      Map(1L -> 2L, 2L -> 2L))
    // wildcard / fuzzy pattern rules inside a composition
    val tf = Seq((1L, "alpha beta gamma"), (2L, "alpa beta"), (3L, "beta"))
      .toDF("id", "text")
    val fuzzed = QueryDsl.search(tf,
      """{"query": {"intervals": {"text": {"all_of": {
          "intervals": [{"fuzzy": {"term": "alpha", "fuzziness": 1}},
                        {"wildcard": {"pattern": "bet*"}}],
          "max_gaps": 0, "ordered": true}},
          "id_field": "id"}}}""")
      .select("id", "n_spans").as[(Long, Long)].collect().toMap
    assert(fuzzed === Map(1L -> 1L, 2L -> 1L))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"intervals": {"text": {"any_of": {"intervals": [
      {"fuzzy": {"term": "a", "rewrite": "x"}},
      {"match": {"query": "b"}}]}}, "id_field": "id"}}}""",
      "unsupported intervals fuzzy option 'rewrite'")
    bad("""{"query": {"intervals": {"text": {"any_of": {"intervals": [
      {"wildcard": {"pattern": ""}},
      {"match": {"query": "b"}}]}}, "id_field": "id"}}}""",
      "wildcard pattern is empty")
    bad("""{"query": {"intervals": {"text": {"all_of": {
      "intervals": [{"match": {"query": "a"}}, {"match": {"query": "b"}}],
      "max_gaps": 2}}, "id_field": "id"}}}""",
      "all_of supports ordered: true only")
    bad("""{"query": {"intervals": {"text": {"any_of": {
      "intervals": [{"match": {"query": "a"}}]}}, "id_field": "id"}}}""",
      "needs 2-4 member intervals")
    bad("""{"query": {"intervals": {"text": {"all_of": {
      "intervals": [{"match": {"query": "a"}}, {"match": {"query": "b"}}],
      "max_gaps": 2, "ordered": true, "filter": {}}},
      "id_field": "id"}}}""", "unsupported intervals all_of option 'filter'")
    bad("""{"query": {"intervals": {"text": {"all_of": {"intervals": [
        {"all_of": {"intervals": [
          {"all_of": {"intervals": [{"match": {"query": "a"}},
                                    {"match": {"query": "b"}}],
            "max_gaps": 0, "ordered": true}},
          {"match": {"query": "c"}}],
          "max_gaps": 0, "ordered": true}},
        {"match": {"query": "z"}}],
      "max_gaps": 0, "ordered": true}}, "id_field": "id"}}}""",
      "nest at most 3 levels")
    bad("""{"query": {"intervals": {"text": {"any_of": {"intervals": [
      {"match": {"query": "a", "analyzer": "standard"}},
      {"match": {"query": "b"}}]}}, "id_field": "id"}}}""",
      "members inherit the composition's analyzer")
    bad("""{"query": {"intervals": {"text": {"any_of": {"intervals": [
      {"match": {"query": "a b"}},
      {"match": {"query": "c"}}]}}, "id_field": "id"}}}""",
      "needs max_gaps")
  }

  test("ip_prefix groups by masked network, numeric order, dirt nulls out") {
    import spark.implicits._
    val t = Seq("9.255.0.1", "10.0.3.4", "10.0.200.9", "10.1.0.1",
      "256.1.1.1", "junk", "10.0.0").toDF("ip")
    val got = QueryDsl.search(t,
      """{"aggs": {"net": {"ip_prefix": {"field": "ip",
           "prefix_length": 16}}}}""")
      .as[(String, Long)].collect().toSeq
    // numeric prefix order: 9.255/16 before 10.0/16 before 10.1/16
    // (lexicographic would misplace 9.x); the three dirty rows vanish
    assert(got === Seq(("9.255.0.0/16", 1L), ("10.0.0.0/16", 2L),
      ("10.1.0.0/16", 1L)))
    // /32 keys are the addresses themselves
    val exact = QueryDsl.search(t,
      """{"aggs": {"net": {"ip_prefix": {"field": "ip",
           "prefix_length": 32}}}}""")
      .as[(String, Long)].collect().toSeq
    assert(exact.head === (("9.255.0.1/32", 1L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"net": {"ip_prefix": {"field": "ip"}}}}""",
      "needs a prefix_length")
    bad("""{"aggs": {"net": {"ip_prefix": {"field": "ip",
      "prefix_length": 0}}}}""", "must be 1-32")
    // is_ipv6 true is now SERVED (the v6 arm, Ipv6Spec); here pin
    // that the flag must still be a boolean and that v4-looking data
    // NULLs out under the v6 parser (no bucket, never a crash)
    bad("""{"aggs": {"net": {"ip_prefix": {"field": "ip",
      "prefix_length": 16, "is_ipv6": "yes"}}}}""", "must be a boolean")
    assert(QueryDsl.search(t,
      """{"aggs": {"net": {"ip_prefix": {"field": "ip",
           "prefix_length": 64, "is_ipv6": true}}}}""").count() === 0L)
    bad("""{"aggs": {"net": {"ip_prefix": {"field": "ip",
      "prefix_length": 16, "min_doc_count": 0}}}}""",
      "unsupported ip_prefix option")
  }

  test("hybrid fuses independently-ranked arms by reciprocal rank") {
    import spark.implicits._
    val t = Seq((1L, "spark join fast", 5L), (2L, "spark join", 50L),
      (3L, "window", 100L)).toDF("id", "text", "v")
    val fused = QueryDsl.search(t,
      """{"query": {"hybrid": {
           "queries": [
             {"match": {"text": {"query": "spark join fast"}}},
             {"script_score": {"query": {"exists": {"field": "v"}},
               "script": {"source": "doc['v'].value"}}}],
           "id_field": "id", "window_size": 2}},
         "sort": [{"_score": "desc"}, "id"],
         "_source": ["id", "score", "rank_1", "rank_2"]}""")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    // arm1 ranks: doc1 (overlap 3), doc2 (2); arm2 ranks: doc3 (v=100),
    // doc2 (50) — window 2 cuts arm2's doc1. RRF k=60:
    // doc2 = 2·(10⁶ div 62) = 32258, doc1 = doc3 = 10⁶ div 61 = 16393
    assert(fused === Seq((2L, 32258L, 2L, 2L), (1L, 16393L, 1L, -1L),
      (3L, 16393L, -1L, 1L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"hybrid": {"queries": [{"match_all": {}}],
      "id_field": "id"}}}""", "2-8 clauses")
    bad("""{"query": {"hybrid": {"queries": [{"match_all": {}},
      {"match_all": {}}]}}}""", "requires id_field")
    bad("""{"query": {"hybrid": {"queries": [{"match_all": {}},
      {"match_all": {}}], "id_field": "id", "window_size": 0}}}""",
      "window_size must be in [1, 1000]")
    bad("""{"query": {"hybrid": {"queries": [{"match_all": {}},
      {"match_all": {}}], "id_field": "id", "rank_constant": 0}}}""",
      "rank_constant must be >= 1")
    bad("""{"query": {"hybrid": {"queries": [
      {"term": {"text": {"value": "spark", "_name": "x"}}},
      {"match_all": {}}], "id_field": "id"}}}""",
      "_name inside hybrid arms")
    bad("""{"query": {"bool": {"must": [{"hybrid": {"queries": [],
      "id_field": "id"}}]}}}""", "request-level query")
    bad("""{"query": {"hybrid": {"queries": [{"match_all": {}},
      {"match_all": {}}], "id_field": "id"}},
      "aggs": {"n": {"value_count": {"field": "id"}}}}""",
      "cannot be combined with hybrid")
  }

  test("function_score script_score function computes a unit-scale value") {
    import spark.implicits._
    val t = Seq((1L, "spark", 10L), (2L, "spark", 3L), (3L, "other", 99L))
      .toDF("id", "text", "v")
    val scored = QueryDsl.search(t,
      """{"query": {"function_score": {
           "query": {"match": {"text": "spark"}},
           "functions": [{"script_score": {"script":
             {"source": "doc['v'].value * params.k + 1", "params": {"k": 2}}},
             "weight": 3}],
           "boost_mode": "multiply"}},
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    // score = match(1) × (v·2 + 1) × weight(3)
    assert(scored === Seq((1L, 63L), (2L, 21L)))
    def bad(q: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t,
        s"""{"query": $q}"""))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"function_score": {"query": {"match": {"text": "spark"}},
      "functions": [{"script_score": {"script": {"source": "_score * 2"}}}]}}""",
      "cannot reference _score")
    bad("""{"function_score": {"query": {"match": {"text": "spark"}},
      "functions": [{"script_score": {"script": {"source": "doc['v'].value"}},
        "field_value_factor": {"field": "v"}}]}}""",
      "at most one of")
    bad("""{"function_score": {"query": {"match": {"text": "spark"}},
      "functions": [{"script_score": {"source": "doc['v'].value"}}]}}""",
      "unsupported script_score function option 'source'")
  }

  test("aggregations is accepted as the root-level synonym of aggs") {
    val viaAggs = QueryDsl.search(docs,
      """{"aggs": {"l": {"terms": {"field": "lang"}}}}""").collect().toSeq
    val viaLong = QueryDsl.search(docs,
      """{"aggregations": {"l": {"terms": {"field": "lang"}}}}""").collect().toSeq
    assert(viaAggs === viaLong)
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"a": {"terms": {"field": "lang"}}},
      "aggregations": {"b": {"terms": {"field": "lang"}}}}""",
      "not both")
    // nested sub-agg sections keep the one spelling
    bad("""{"aggs": {"l": {"terms": {"field": "lang"},
      "aggregations": {"m": {"avg": {"field": "n_chars"}}}}}}""",
      "aggregations")
  }

  test("terms_set minimum_should_match_field reads the gate per document") {
    import spark.implicits._
    val t = Seq(
      (1L, "a b c", Some(2L)), (2L, "a x y", Some(2L)),
      (3L, "a x y", Some(1L)), (4L, "a b c", Option.empty[Long]))
      .toDF("id", "tags", "req")
    val got = QueryDsl.search(t,
      """{"query": {"terms_set": {"tags": {"terms": ["a", "b", "c"],
           "minimum_should_match_field": "req"}}},
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    // doc1: overlap 3 >= 2; doc2: 1 < 2; doc3: 1 >= 1; doc4: NULL gate drops
    assert(got === Seq((1L, 3L), (3L, 1L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"terms_set": {"tags": {"terms": ["a"],
      "minimum_should_match": 1, "minimum_should_match_field": "req"}}}}""",
      "not both")
    bad("""{"query": {"terms_set": {"tags": {"terms": ["a"]}}}}""",
      "requires an integer minimum_should_match or a")
  }

  test("terms_set gates on minimum_should_match and scores the overlap") {
    val dsl = QueryDsl.search(docs,
      """{"query": {"terms_set": {"text":
           {"terms": ["spark", "join", "window"], "minimum_should_match": 2}}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""").collect()
    val overlap = size(array_intersect(array_distinct(split(col("text"), " ")),
      array(lit("spark"), lit("join"), lit("window")))).cast("long")
    val direct = docs.withColumn("score", overlap).filter(col("score") >= 2)
      .orderBy("doc_id").select("doc_id", "score").collect()
    assert(dsl.toSeq === direct.toSeq)
    assert(dsl.nonEmpty)
  }

  test("constant_score wraps a filter and emits the boost as the score") {
    val rows = QueryDsl.search(docs,
      """{"query": {"constant_score": {"filter": {"term": {"lang": "en"}},
           "boost": 7}},
         "_source": ["lang", "score"]}""").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) === "en")
      assert(r.getLong(1) === 7L)
    }
  }

  test("dis_max: best clause × 1e6 plus others × tie_breaker ppm") {
    val rows = QueryDsl.search(docs,
      """{"query": {"dis_max": {"queries": [
           {"match": {"text": "spark join"}},
           {"match": {"text": "window merge data"}}],
           "tie_breaker": 0.3}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""").collect()
    val toks = array_distinct(split(col("text"), " "))
    val s1 = size(array_intersect(toks, array(lit("spark"), lit("join")))).cast("long")
    val s2 = size(array_intersect(toks,
      array(lit("window"), lit("merge"), lit("data")))).cast("long")
    val direct = docs.withColumn("s1", s1).withColumn("s2", s2)
      .filter(col("s1") >= 1 || col("s2") >= 1)
      .withColumn("score",
        greatest(col("s1"), col("s2")) * lit(1000000L) +
          (col("s1") + col("s2") - greatest(col("s1"), col("s2"))) * lit(300000L))
      .orderBy("doc_id").select("doc_id", "score").collect()
    assert(rows.toSeq === direct.toSeq)
    assert(rows.nonEmpty)
  }

  test("boosting demotes (never drops) hits matching the negative clause") {
    val rows = QueryDsl.search(docs,
      """{"query": {"boosting": {
           "positive": {"match": {"text": "spark"}},
           "negative": {"term": {"source": "src3"}},
           "negative_boost": 0.25}},
         "sort": ["doc_id"], "_source": ["doc_id", "source", "score"]}""").collect()
    assert(rows.map(_.getString(1)).toSet.contains("src3"), "demoted hits kept")
    val toks = array_distinct(split(col("text"), " "))
    val s = size(array_intersect(toks, array(lit("spark")))).cast("long")
    val direct = docs.withColumn("s", s).filter(col("s") >= 1)
      .withColumn("score", col("s") *
        when(col("source") === "src3", lit(250000L)).otherwise(lit(1000000L)))
      .orderBy("doc_id").select("doc_id", "source", "score").collect()
    assert(rows.toSeq === direct.toSeq)
  }

  test("pinned ranks curated ids first, in order, above any organic score") {
    val rows = QueryDsl.search(docs,
      """{"query": {"pinned": {"ids": [42, 7, 123], "id_field": "doc_id",
           "organic": {"match": {"text": "spark"}}}},
         "sort": [{"_score": "desc"}, "doc_id"],
         "_source": ["doc_id", "score"]}""").collect()
    assert(rows.take(3).map(_.getLong(0)).toSeq === Seq(42L, 7L, 123L))
    assert(rows.take(3).map(_.getLong(1)).toSeq ===
      Seq(1000000000002L, 1000000000001L, 1000000000000L))
    assert(rows.drop(3).forall(_.getLong(1) < 1000000000000L))
  }

  test("match_phrase_prefix matches when the final term is a prefix") {
    val dsl = QueryDsl.search(docs,
      """{"query": {"match_phrase_prefix": {"text": "stream mer"}},
         "_source": ["doc_id"]}""").count()
    val direct = docs.filter(
      concat(lit(" "), col("text"), lit(" ")).contains(" stream mer")).count()
    assert(dsl === direct && dsl > 0)
  }

  test("range agg: overlapping buckets in request order with sub-metrics") {
    val out = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}},
         "aggs": {"len": {"range": {"field": "n_chars",
             "ranges": [{"to": 200}, {"from": 150, "to": 350}, {"from": 300}]},
           "aggs": {"sum_chars": {"sum": {"field": "n_chars"}}}}}}""").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("*-200", "150-350", "300-*"))
    val en = docs.filter(col("lang") === "en")
    val expected = Seq(
      en.filter(col("n_chars") < 200),
      en.filter(col("n_chars") >= 150 && col("n_chars") < 350),
      en.filter(col("n_chars") >= 300)).map(d =>
      (d.count(), d.agg(sum(col("n_chars"))).head().getLong(0)))
    out.zip(expected).foreach { case (r, (dc, s)) =>
      assert(r.getAs[Long]("doc_count") === dc)
      assert(r.getAs[Long]("sum_chars") === s)
    }
    // overlap: docs in [150, 200) are counted in BOTH bucket 0 and 1
    val both = en.filter(col("n_chars") >= 150 && col("n_chars") < 200).count()
    assert(both > 0 &&
      out(0).getAs[Long]("doc_count") + out(1).getAs[Long]("doc_count") >
        en.filter(col("n_chars") < 350).count())
  }

  test("significant_terms scores foreground-vs-background ratio in ppm") {
    val out = QueryDsl.search(docs,
      """{"query": {"match": {"text": "spark"}},
         "aggs": {"sig": {"significant_terms":
           {"field": "source", "min_doc_count": 1, "size": 100}}}}""").collect()
    val fg = docs.filter(array_contains(split(col("text"), " "), "spark"))
    val nAll = docs.count()
    val nFg = fg.count()
    out.foreach { r =>
      val src = r.getString(0)
      val dc = fg.filter(col("source") === src).count()
      val bg = docs.filter(col("source") === src).count()
      assert(r.getAs[Long]("doc_count") === dc)
      assert(r.getAs[Long]("bg_count") === bg)
      assert(r.getAs[Long]("score_ppm") === dc * nAll * 1000000L / (bg * nFg))
    }
    assert(out.nonEmpty)
  }

  test("top_hits returns the top-N hit rows per bucket, window-ranked") {
    import org.apache.spark.sql.expressions.Window
    val out = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}},
         "aggs": {"by_source": {"terms": {"field": "source"},
           "aggs": {"top": {"top_hits": {"size": 2,
             "sort": [{"n_chars": "desc"}, "doc_id"],
             "_source": ["doc_id", "n_chars"]}}}}}}""").collect()
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val direct = docs.filter(col("lang") === "en")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 2)
      .select(col("source").as("by_source"), col("rank"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("by_source"), col("rank")).collect()
    assert(out.toSeq === direct.toSeq)
    assert(out.nonEmpty)
  }

  test("ids compiles to a pushed IN over the named field") {
    val out = QueryDsl.search(docs,
      """{"query": {"ids": {"values": [3, 7, 11], "field": "doc_id"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(3L, 7L, 11L))
    assert(out.forall(_.getLong(1) === 1L))
    val plan = QueryDsl.search(docs,
      """{"query": {"ids": {"values": [3, 7], "field": "doc_id"}},
         "_source": ["doc_id"]}""").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(doc_id"), plan.take(2000))
  }

  test("regexp anchors to the whole value (src1 does not match src1x)") {
    val hits = QueryDsl.search(docs,
      """{"query": {"regexp": {"source": {"value": "src1[02]"}}},
         "_source": ["source"]}""").distinct().collect().map(_.getString(0)).sorted
    assert(hits.toSeq === Seq("src10", "src12"))
    // unanchored substring semantics would also admit src1, src11, …
    val one = QueryDsl.search(docs,
      """{"query": {"regexp": {"source": "src1"}}, "_source": ["source"]}""")
      .distinct().collect().map(_.getString(0))
    assert(one.toSeq === Seq("src1"))
  }

  test("multi_match most_fields sums matched per-field overlaps") {
    val out = QueryDsl.search(docs,
      """{"query": {"multi_match": {"query": "spark src3",
           "fields": ["text", "source"], "type": "most_fields"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""")
    val sText = size(array_intersect(array_distinct(split(col("text"), " ")),
      array(lit("spark"), lit("src3")))).cast("long")
    val sSrc = size(array_intersect(array_distinct(split(col("source"), " ")),
      array(lit("spark"), lit("src3")))).cast("long")
    val direct = docs
      .withColumn("score",
        when(sText >= 1, sText).otherwise(0L) + when(sSrc >= 1, sSrc).otherwise(0L))
      .filter(sText >= 1 || sSrc >= 1)
      .select(col("doc_id"), col("score")).orderBy("doc_id")
    assert(out.collect().toSeq === direct.collect().toSeq)
    assert(out.count() > 0)
  }

  test("multi_match best_fields over one field == match scaled to ppm") {
    val best = QueryDsl.search(docs,
      """{"query": {"multi_match": {"query": "spark join",
           "fields": ["text"], "type": "best_fields"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""").collect()
    val plain = QueryDsl.search(docs,
      """{"query": {"match": {"text": "spark join"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""").collect()
    assert(best.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      plain.map(r => (r.getLong(0), r.getLong(1) * 1000000L)).toSeq)
  }

  test("simple_query_string: +must -mustNot bare-should and quoted phrase") {
    val sqs = QueryDsl.search(docs,
      """{"query": {"simple_query_string": {
           "query": "spark +join -merge \"data window\"",
           "fields": ["text"]}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""")
    val toks = split(col("text"), " ")
    val hasJoin = array_contains(toks, "join")
    val hasMerge = array_contains(toks, "merge")
    val hasSpark = array_contains(toks, "spark")
    val hasPhrase = concat(lit(" "), col("text"), lit(" ")).contains(" data window ")
    // + pins a must (scores 1); bare tokens and the quoted phrase are
    // shoulds (matched ones add 1); must present → no should gate
    val direct = docs.filter(hasJoin && !hasMerge)
      .withColumn("score",
        lit(1L) + when(hasSpark, 1L).otherwise(0L) + when(hasPhrase, 1L).otherwise(0L))
      .select(col("doc_id"), col("score")).orderBy("doc_id")
    assert(sqs.collect().toSeq === direct.collect().toSeq)

    // and-default promotes every bare token to must
    val andReq = QueryDsl.search(docs,
      """{"query": {"simple_query_string": {
           "query": "spark join", "fields": ["text"],
           "default_operator": "and"}},
         "sort": ["doc_id"], "_source": ["doc_id"]}""")
    val andDirect = docs.filter(hasSpark && hasJoin)
      .select(col("doc_id")).orderBy("doc_id")
    assert(andReq.collect().toSeq === andDirect.collect().toSeq)
  }

  test("function_score: multiply is neutral when no function matches; sum adds") {
    val req =
      """{"query": {"function_score": {
           "query": {"match": {"text": "spark"}},
           "functions": [
             {"filter": {"term": {"lang": "en"}}, "weight": 3},
             {"filter": {"range": {"n_chars": {"gte": 400}}}, "weight": 2}],
           "score_mode": "sum", "boost_mode": "%MODE%"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}"""
    val overlap = size(array_intersect(array_distinct(split(col("text"), " ")),
      array(lit("spark")))).cast("long")
    val fsum = when(col("lang") === "en", 3L).otherwise(0L) +
      when(col("n_chars") >= 400, 2L).otherwise(0L)
    val anyFn = col("lang") === "en" || col("n_chars") >= 400
    val mult = docs.filter(overlap >= 1)
      .withColumn("score", overlap * when(anyFn, fsum).otherwise(1L))
      .select(col("doc_id"), col("score")).orderBy("doc_id")
    assert(QueryDsl.search(docs, req.replace("%MODE%", "multiply")).collect().toSeq
      === mult.collect().toSeq)
    val add = docs.filter(overlap >= 1)
      .withColumn("score", overlap + fsum)
      .select(col("doc_id"), col("score")).orderBy("doc_id")
    assert(QueryDsl.search(docs, req.replace("%MODE%", "sum")).collect().toSeq
      === add.collect().toSeq)
  }

  test("function_score score_mode min/multiply combine MATCHED functions only") {
    val req =
      """{"query": {"function_score": {
           "query": {"match": {"text": "spark"}},
           "functions": [
             {"filter": {"term": {"lang": "en"}}, "weight": 3},
             {"filter": {"range": {"n_chars": {"gte": 400}}}, "weight": 2}],
           "score_mode": "%SM%", "boost_mode": "multiply"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}"""
    val overlap = size(array_intersect(array_distinct(split(col("text"), " ")),
      array(lit("spark")))).cast("long")
    val anyFn = col("lang") === "en" || col("n_chars") >= 400
    // min: least over matched only — an unmatched entry must NOT
    // contribute a 0 that shadows the real values
    val fmin = when(col("lang") === "en" && col("n_chars") >= 400, 2L)
      .when(col("lang") === "en", 3L)
      .when(col("n_chars") >= 400, 2L)
    val minExp = docs.filter(overlap >= 1)
      .withColumn("score", overlap * when(anyFn, fmin).otherwise(1L))
      .select(col("doc_id"), col("score")).orderBy("doc_id")
    assert(QueryDsl.search(docs, req.replace("%SM%", "min")).collect().toSeq
      === minExp.collect().toSeq)
    // multiply: product over matched only — unmatched entries are the x1 neutral
    val fprod = when(col("lang") === "en", 3L).otherwise(1L) *
      when(col("n_chars") >= 400, 2L).otherwise(1L)
    val prodExp = docs.filter(overlap >= 1)
      .withColumn("score", overlap * when(anyFn, fprod).otherwise(1L))
      .select(col("doc_id"), col("score")).orderBy("doc_id")
    assert(QueryDsl.search(docs, req.replace("%SM%", "multiply")).collect().toSeq
      === prodExp.collect().toSeq)
    // avg is the documented integer-model scope-out; ppm functions
    // cannot multiply (scales compound); unknown modes fail loud
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad(req.replace("%SM%", "avg"), "score_mode avg is fractional")
    bad(req.replace("%SM%", "geometric"), "unsupported score_mode")
    bad("""{"query": {"function_score": {
           "query": {"match_all": {}},
           "functions": [
             {"random_score": {"seed": 7, "field": "doc_id"}},
             {"filter": {"term": {"lang": "en"}},
              "random_score": {"seed": 9, "field": "doc_id"}}],
           "score_mode": "multiply", "boost_mode": "replace"}},
         "_source": ["doc_id", "score"]}""",
      "score_mode multiply requires unit-scale functions")
  }

  test("function_score value functions: field_value_factor, random_score, linear") {
    import spark.implicits._
    val t = Seq((1L, "spark x", Some(100L)), (2L, "spark y", Some(25L)),
      (3L, "hive", Some(9L))).toDF("id", "text", "n")
    // field_value_factor sqrt: score = 1 × 3·floor(sqrt(n))
    val fvf = QueryDsl.search(t,
      """{"query": {"function_score": {
           "query": {"match": {"text": "spark"}},
           "functions": [{"field_value_factor":
             {"field": "n", "factor": 3, "modifier": "sqrt"}}]}},
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(fvf === Seq((1L, 30L), (2L, 15L)))
    // `missing` fills NULLs; without it the row fails loud at run time
    val tn = Seq((1L, "spark", Option.empty[Long])).toDF("id", "text", "n")
    val filled = QueryDsl.search(tn,
      """{"query": {"function_score": {
           "query": {"match": {"text": "spark"}},
           "functions": [{"field_value_factor": {"field": "n", "missing": 7}}]}},
         "_source": ["id", "score"]}""").as[(Long, Long)].collect().toSeq
    assert(filled === Seq((1L, 7L)))
    intercept[Exception](QueryDsl.search(tn,
      """{"query": {"function_score": {
           "query": {"match": {"text": "spark"}},
           "functions": [{"field_value_factor": {"field": "n"}}]}},
         "_source": ["id", "score"]}""").collect())
    // random_score: stable across runs, ppm-bounded, field-keyed
    val rsReq =
      """{"query": {"function_score": {
           "query": {"match_all": {}},
           "functions": [{"random_score": {"seed": 7, "field": "id"}}],
           "boost_mode": "replace"}},
         "sort": ["id"], "_source": ["id", "score"]}"""
    val rs1 = QueryDsl.search(t, rsReq).as[(Long, Long)].collect().toSeq
    val rs2 = QueryDsl.search(t, rsReq).as[(Long, Long)].collect().toSeq
    assert(rs1 === rs2)
    assert(rs1.map(_._2).forall(v => v >= 0L && v < 1000000L))
    assert(rs1.map(_._2).distinct.size === 3) // three ids, three draws
    // linear decay: exact ppm — σ = 50·10⁶/500000 = 100
    val lin = QueryDsl.search(t,
      """{"query": {"function_score": {
           "query": {"match_all": {}},
           "functions": [{"linear": {"n": {"origin": 100, "scale": 50}}}],
           "boost_mode": "replace"}},
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(lin === Seq((1L, 1000000L), (2L, 250000L), (3L, 90000L)))
    // weight multiplies the function value
    val linW = QueryDsl.search(t,
      """{"query": {"function_score": {
           "query": {"match_all": {}},
           "functions": [{"linear": {"n": {"origin": 100, "scale": 50}},
             "weight": 2}],
           "boost_mode": "replace"}},
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(linW.map(_._2) === lin.map(_._2).map(_ * 2))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    // gauss decay is ppm-scaled like linear (served by the pinned
    // exp kernel — semantics spec'd in PinnedExpSpec); here just pin
    // that it rides the same ppm-mixing rails
    bad("""{"query": {"function_score": {"query": {"match_all": {}},
      "functions": [{"gauss": {"n": {"origin": 0, "scale": 10}}},
        {"weight": 2}]}}}""", "cannot mix ppm-scaled functions")
    // the log family is now SERVED via the pinned ln kernel (ppm —
    // PinnedExpSpec); reciprocal remains out
    bad("""{"query": {"function_score": {"query": {"match_all": {}},
      "functions": [{"field_value_factor": {"field": "n", "modifier": "reciprocal"}}]}}}""",
      "reciprocal")
    bad("""{"query": {"function_score": {"query": {"match_all": {}},
      "functions": [{"random_score": {"seed": 1}}]}}}""",
      "random_score requires a field")
    bad("""{"query": {"function_score": {"query": {"match_all": {}},
      "functions": [{"random_score": {"seed": 1, "field": "id"}},
        {"weight": 2}]}}}""", "cannot mix ppm-scaled functions")
    bad("""{"query": {"function_score": {"query": {"match_all": {}},
      "functions": [{"linear": {"n": {"origin": 0, "scale": 10}}}],
      "boost_mode": "sum"}}}""", "cannot add ppm-scaled")
    bad("""{"query": {"function_score": {
      "query": {"distance_feature": {"field": "n", "origin": 0, "pivot": 5}},
      "functions": [{"linear": {"n": {"origin": 0, "scale": 10}}}]}}}""",
      "already ppm-scaled query score")
    bad("""{"query": {"function_score": {"query": {"match_all": {}},
      "functions": [{"field_value_factor": {"field": "n"},
        "random_score": {"seed": 1, "field": "id"}}]}}}""",
      "at most one of")
    bad("""{"query": {"function_score": {"query": {"match_all": {}},
      "functions": [{"linear": {"n": {"origin": 0, "scale": 10, "decay": 1.5}}}]}}}""",
      "must be in [0, 1]")
  }

  test("distance_feature decays in exact integer ppm around the origin") {
    val out = QueryDsl.search(docs,
      """{"query": {"distance_feature":
           {"field": "n_chars", "origin": 300, "pivot": 50}},
         "sort": [{"_score": "desc"}, "doc_id"], "size": 30,
         "_source": ["doc_id", "n_chars", "score"]}""").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val d = math.abs(r.getLong(1) - 300L)
      assert(r.getLong(2) === 50L * 1000000L / (50L + d))
    }
    // descending score ⇒ non-decreasing distance from the origin
    val dists = out.map(r => math.abs(r.getLong(1) - 300L))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
  }

  test("filters agg: named overlapping buckets, one pass, request order") {
    val out = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}},
         "aggs": {"kind": {"filters": {"filters": {
             "short": {"range": {"n_chars": {"lt": 250}}},
             "sparky": {"match": {"text": "spark"}},
             "src_one": {"prefix": {"source": "src1"}}}},
           "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}}}""").collect()
    val en = docs.filter(col("lang") === "en")
    val expect = Seq(
      "short"   -> en.filter(col("n_chars") < 250),
      "sparky"  -> en.filter(array_contains(array_distinct(split(col("text"), " ")), "spark")),
      "src_one" -> en.filter(col("source").startsWith("src1")))
    assert(out.map(_.getString(0)).toSeq === expect.map(_._1))
    out.zip(expect).foreach { case (r, (_, df)) =>
      assert(r.getAs[Long]("doc_count") === df.count())
      val sum = df.agg(org.apache.spark.sql.functions.sum("n_chars")).head.getLong(0)
      assert(r.getAs[Double]("avg_chars") === sum.toDouble / df.count())
    }
  }

  test("nested matches on the SAME element, never across elements") {
    import spark.implicits._
    // doc 1: one element satisfies both bounds; doc 2 satisfies them
    // only across DIFFERENT elements — flattened semantics would match
    // both, nested semantics must keep doc 1 only
    val t = Seq(
      (1L, Seq((50.0, 0.01), (10.0, 0.9))),
      (2L, Seq((50.0, 0.9), (10.0, 0.01))))
      .toDF("id", "raw")
      .select(col("id"), expr(
        "transform(raw, x -> named_struct('qty', x._1, 'disc', x._2))").as("items"))
    val out = QueryDsl.search(t,
      """{"query": {"nested": {"path": "items",
           "query": {"bool": {"must": [
             {"range": {"items.qty": {"gte": 48.0}}},
             {"range": {"items.disc": {"lte": 0.02}}}]}}}},
         "_source": ["id", "score"]}""").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(out.head.getLong(1) === 1L) // score_mode sum = matching elements
    // score_mode none scores 1 regardless of element count
    val none = QueryDsl.search(t,
      """{"query": {"nested": {"path": "items", "score_mode": "none",
           "query": {"range": {"items.qty": {"gte": 5.0}}}}},
         "sort": ["id"], "_source": ["id", "score"]}""").collect()
    assert(none.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1L), (2L, 1L)))
  }

  test("percentiles agg is discrete: results are actual data values") {
    val out = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}},
         "aggs": {"len": {"percentiles":
           {"field": "n_chars", "percents": [50, 90]}}}}""").collect()
    assert(out.length === 1)
    val present = docs.filter(col("lang") === "en")
      .select(col("n_chars").cast("double")).distinct()
      .collect().map(_.getDouble(0)).toSet
    val (p50, p90) = (out.head.getDouble(0), out.head.getDouble(1))
    assert(present.contains(p50) && present.contains(p90))
    assert(p50 <= p90)
  }

  test("compiled more_like_this request == handwritten q118 facade pipeline") {
    sameAs("q118_search_more_like_this", "q159_dsl_more_like_this")
  }

  test("compiled span_near requests == handwritten q126/q133 (both orders)") {
    sameAs("q126_search_span_near", "q160_dsl_span_near")
    sameAs("q133_search_span_ordered", "q161_dsl_span_ordered")
  }

  test("span_near validates clauses, field agreement and slop") {
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"query": {"span_near": {"clauses": [
           {"span_term": {"text": "a"}}],
           "slop": 2, "id_field": "doc_id"}}}""")          // one clause
    bad("""{"query": {"span_near": {"clauses": [
           {"span_term": {"text": "a"}}, {"span_term": {"lang": "b"}}],
           "slop": 2, "id_field": "doc_id"}}}""")          // field mismatch
    bad("""{"query": {"span_near": {"clauses": [
           {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
           "id_field": "doc_id"}}}""")                     // no slop
    bad("""{"query": {"span_near": {"clauses": [
           {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
           "slop": 2}}}""")                                // no id_field
  }

  test("suggest request == handwritten q117 term suggester") {
    sameAs("q117_search_term_suggest", "q162_dsl_term_suggest")
  }

  test("phrase suggest request == handwritten q121 bigram re-rank") {
    sameAs("q121_search_phrase_suggest", "q167_dsl_phrase_suggest")
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"suggest": {"s": {"text": "one two three",
           "phrase": {"field": "text"}}}}""")   // >2 words
    bad("""{"suggest": {"s": {"text": "a b",
           "term": {"field": "text"}, "phrase": {"field": "text"}}}}""")
  }

  test("suggest / rank_feature validate their bodies loudly") {
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"suggest": {"s": {"text": "x",
           "term": {"field": "text"}}},
         "query": {"match_all": {}}}""")              // suggest + query
    bad("""{"suggest": {"s": {"term": {"field": "text"}}}}""")  // no text
    bad("""{"suggest": {"s": {"text": "x",
           "phrase": {"field": "text"}}}}""")          // non-term suggester
    bad("""{"query": {"rank_feature": {"field": "n_chars"}}}""") // no saturation
    bad("""{"query": {"rank_feature": {"field": "n_chars",
           "saturation": {"pivot": 0}}}}""")           // pivot 0
    bad("""{"query": {"geo_distance": {"distance_km": 10,
           "lat_field": "a", "lon_field": "b"}}}""")   // no origin
    bad("""{"query": {"geo_distance": {"distance_km": -1,
           "lat_field": "a", "lon_field": "b",
           "origin": {"lat": 0, "lon": 0}}}}""")       // bad radius
  }

  test("rank_feature scores the exact integer saturation curve") {
    val out = QueryDsl.search(docs,
      """{"query": {"rank_feature": {"field": "n_chars",
           "saturation": {"pivot": 100}}},
         "sort": [{"_score": "desc"}, "doc_id"], "size": 20,
         "_source": ["doc_id", "n_chars", "score"]}""").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val x = r.getLong(1)
      assert(r.getLong(2) === x * 1000000L / (x + 100L))
    }
  }

  test("composite agg == handwritten q45 keyset bucket paging") {
    sameAs("q45_search_composite_after", "q165_dsl_composite_after")
  }

  test("highlight wraps occurrences and respects custom tags") {
    val out = QueryDsl.search(docs,
      """{"query": {"term": {"source": "src3"}},
         "highlight": {"fields": {"source": {"fragment_size": 10}},
           "pre_tags": ["<b>"], "post_tags": ["</b>"]},
         "sort": ["doc_id"], "size": 3,
         "_source": ["doc_id", "highlight"]}""").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(1) === "<b>src3</b>"))
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"query": {"match": {"text": "spark join"}},
         "highlight": {"fields": {"text": {}}}}""")   // multi-term anchor
    bad("""{"query": {"term": {"lang": "en"}},
         "highlight": {"fields": {"text": {}}}}""")   // field mismatch
    bad("""{"query": {"term": {"lang": "en"}},
         "highlight": {"fields": {"lang": {}}},
         "aggs": {"a": {"avg": {"field": "n_chars"}}}}""") // with aggs
  }

  test("highlight on analyzed match: raw fragments, case-kept wraps, bounds") {
    import spark.implicits._
    val t = Seq(
      (1L, "He said SPARK, then Spark again; sparkle stays"),
      (2L, "nothing here"),
      (3L, "spark")).toDF("doc_id", "a")
    val out = QueryDsl.search(t,
      """{"query": {"match": {"a": {"query": "Spark",
           "analyzer": "standard"}}},
         "highlight": {"fields": {"a": {"fragment_size": 30,
           "number_of_fragments": 2}}},
         "sort": ["doc_id"], "size": 10,
         "_source": ["doc_id", "highlight"]}""")
      .as[(Long, String)].collect().toSeq
    // doc 2 has no analyzed hit; docs 1 and 3 match case-insensitively
    assert(out.map(_._1) === Seq(1L, 3L))
    val h1 = out.head._2
    // both bounded occurrences wrap KEEPING their raw casing; the
    // embedded "sparkle" never wraps
    assert(h1.contains("<em>SPARK</em>") && h1.contains("<em>Spark</em>"), h1)
    assert(!h1.contains("<em>spark</em>le") && !h1.contains("sparkle</em>"), h1)
    assert(out(1)._2 === "<em>spark</em>")
    def bad(req: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, req))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    // other match options keep the fail-loud (anchor is ranking-dependent)
    bad("""{"query": {"match": {"a": {"query": "spark",
           "analyzer": "standard", "operator": "and"}}},
         "highlight": {"fields": {"a": {}}}}""", "requires a term")
    // analyzed multi-token query: same single-token contract
    bad("""{"query": {"match": {"a": {"query": "Spark, Join!",
           "analyzer": "standard"}}},
         "highlight": {"fields": {"a": {}}}}""", "single-token")
  }

  test("highlight on english match: stem-anchored token wraps (r16)") {
    import spark.implicits._
    val t = Seq(
      (1L, "The RUNS were Running fast; runner stays raw"),
      (2L, "nothing here matches"),
      (3L, "runs"),
      (4L, "abc Running")).toDF("doc_id", "a")
    def hl(req: String): Seq[(Long, String)] =
      QueryDsl.search(t, req).as[(Long, String)].collect().toSeq
    // "Running" stems to "run"; so do RUNS and runs — "runner" does NOT
    // (no rule strips -er), and raw casing is kept inside the wraps
    val out = hl(
      """{"query": {"match": {"a": {"query": "Running",
           "analyzer": "english"}}},
         "highlight": {"fields": {"a": {"fragment_size": 30}}},
         "sort": ["doc_id"], "size": 10,
         "_source": ["doc_id", "highlight"]}""")
    assert(out.map(_._1) === Seq(1L, 3L, 4L))
    // doc 1, anchor at RUNS (p=5), window chars 1..30: both stem
    // matches wrapped, tail cut mid-word
    assert(out.head._2 ===
      "The <em>RUNS</em> were <em>Running</em> fast; ru", out.head._2)
    assert(out(1)._2 === "<em>runs</em>")
    // doc 4 with fragment_size 10: "Running" ends past the window —
    // a token CUT at the window edge stays unwrapped (pinned
    // divergence from the standard arm's end-of-fragment boundary)
    val cut = hl(
      """{"query": {"match": {"a": {"query": "run",
           "analyzer": "english"}}},
         "highlight": {"fields": {"a": {"fragment_size": 10}}},
         "sort": ["doc_id"], "size": 10,
         "_source": ["doc_id", "highlight"]}""")
    assert(cut.find(_._1 == 4L).get._2 === "abc Runnin")
    // a stop-word query folds to nothing — the match clause itself
    // fails loud before the highlight's own guard is reached
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"query": {"match": {"a": {"query": "the",
           "analyzer": "english"}}},
         "highlight": {"fields": {"a": {}}}}"""))
    assert(e.getMessage.contains("empty query"), e.getMessage)
  }

  test("highlight: multiple fields and fragments, deterministic anchors") {
    import spark.implicits._
    val t = Seq(
      (1L, "alpha spark beta spark gamma spark", "note spark"),
      (2L, "no match here at all today", "spark note"),
      (3L, "spark", "plain")).toDF("doc_id", "a", "b")
    val out = QueryDsl.search(t,
      """{"query": {"bool": {
           "should": [{"match": {"a": "spark"}}, {"match": {"b": "spark"}}],
           "minimum_should_match": 1}},
         "highlight": {"fields": {
           "a": {"fragment_size": 12, "number_of_fragments": 2},
           "b": {}}},
         "sort": ["doc_id"], "size": 10,
         "_source": ["doc_id", "highlight_a", "highlight_b"]}""")
      .as[(Long, String, String)].collect().toSeq
    // doc 1: fragments at occurrence 1 (pos 7 → start 1) and
    // occurrence 2 (pos 18 → start 1... no: 18-20 -> 1) each 12 chars
    assert(out.map(_._1) === Seq(1L, 2L, 3L))
    val (_, h1a, h1b) = out.head
    assert(h1a.contains(" ... "), s"expected two fragments: $h1a")
    assert(h1a.contains("<em>spark</em>"))
    assert(h1b === "note <em>spark</em>")
    val (_, h2a, h2b) = out(1)
    assert(h2a == null, s"no occurrence → NULL, got $h2a")
    assert(h2b === "<em>spark</em> note")
    // single requested field keeps the historical `highlight` name
    val single = QueryDsl.search(t,
      """{"query": {"match": {"a": "spark"}},
         "highlight": {"fields": {"a": {}}},
         "sort": ["doc_id"], "_source": ["doc_id", "highlight"]}""")
    assert(single.columns.contains("highlight"))
    def bad(req: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, req))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    // two clauses on one field: ambiguous anchor
    bad("""{"query": {"bool": {"should": [
           {"match": {"a": "spark"}}, {"match": {"a": "beta"}}]}},
         "highlight": {"fields": {"a": {}}}}""", "several clauses")
    bad("""{"query": {"match": {"a": "spark"}},
         "highlight": {"fields": {"a": {"number_of_fragments": 0}}}}""",
      "number_of_fragments must be >= 1")
  }

  test("composite validates sources and the after cursor") {
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"aggs": {"p": {"composite": {"sources": []}}}}""")
    bad("""{"aggs": {"p": {"composite": {"sources": [
           {"x": {"terms": {"field": "lang"}}}]}}}}""")  // name != field
    bad("""{"aggs": {"p": {"composite": {"sources": [
           {"lang": {"terms": {"field": "lang"}}}],
           "after": {"source": "x"}}}}}""")              // cursor missing key
  }

  test("knn ranks a planted identical vector first and validates its body") {
    import spark.implicits._
    val t = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f)))
      .toDF("id", "embedding")
    val out = QueryDsl.search(t,
      """{"knn": {"field": "embedding", "id_field": "id",
           "query_vector": [1.0, 0.0, 0.0], "k": 2}}""").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 1L), (2L, 2L)))
    assert(out.head.getDouble(2) === 1.0)
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(t, req))
    bad("""{"knn": {"field": "embedding", "id_field": "id",
           "query_vector": [], "k": 2}}""")
    bad("""{"knn": {"field": "embedding",
           "query_vector": [1.0], "k": 2}}""")     // no id_field
    bad("""{"knn": {"field": "embedding", "id_field": "id",
           "query_vector": [1.0], "k": 0}}""")     // k 0
    bad("""{"knn": {"field": "embedding", "id_field": "id",
           "query_vector": [1.0], "k": 2},
         "sort": ["id"]}""")                       // knn + other sections
    // wrong-dimension vectors fail loud at run time, not silently drop
    val mismatched = QueryDsl.search(t,
      """{"knn": {"field": "embedding", "id_field": "id",
           "query_vector": [1.0, 0.0], "k": 2}}""")
    val e = intercept[Exception](mismatched.collect())
    assert(e.getMessage.contains("dimension"), e.getMessage)
  }

  test("more_like_this rejects aggs and malformed like/fields") {
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"query": {"more_like_this": {"fields": ["text"],
           "like": {"doc_id": 7}}},
         "aggs": {"a": {"avg": {"field": "n_chars"}}}}""")
    bad("""{"query": {"more_like_this": {"like": {"doc_id": 7}}}}""")
    bad("""{"query": {"more_like_this": {"fields": ["text", "lang"],
           "like": {"doc_id": 7}}}}""")
    bad("""{"query": {"more_like_this": {"fields": ["text"],
           "like": "raw text"}}}""")
    bad("""{"query": {"more_like_this": {"fields": ["text"],
           "like": {"doc_id": 7}, "max_query_terms": 0}}}""")
    // a multi-row seed would silently inflate scores — fail loud
    val multi = intercept[IllegalArgumentException](QueryDsl.search(docs,
      """{"query": {"more_like_this": {"fields": ["text"],
           "like": {"lang": "en"}}}}""").collect())
    assert(multi.getMessage.contains("matches"), multi.getMessage)
    // request-level clauses nested in bool get a pointed error, not
    // the generic unsupported-clause list
    val nested = intercept[IllegalArgumentException](QueryDsl.search(docs,
      """{"query": {"bool": {"must": [{"more_like_this": {
           "fields": ["text"], "like": {"doc_id": 7}}}]}}}"""))
    assert(nested.getMessage.contains("TOP-LEVEL"), nested.getMessage)
  }

  test("ppm/unit score scales never mix silently") {
    def bad(req: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, req))
      assert(e.getMessage.contains("ppm") || e.getMessage.contains("scale"),
        e.getMessage)
    }
    // dis_max over a ppm sub-clause would double-scale
    bad("""{"query": {"dis_max": {"queries": [
           {"boosting": {"positive": {"match": {"text": "spark"}},
            "negative": {"term": {"lang": "fr"}}, "negative_boost": 0.5}}]}}}""")
    // pinned's 1e12 band only clears unit-scale organic scores
    bad("""{"query": {"pinned": {"ids": [1], "id_field": "doc_id",
           "organic": {"dis_max": {"queries": [{"match": {"text": "spark"}}]}}}}}""")
    // bool summing unit + ppm scores
    bad("""{"query": {"bool": {"must": [
           {"match": {"text": "spark"}},
           {"rank_feature": {"field": "n_chars", "saturation": {"pivot": 10}}}]}}}""")
    // additive function_score boost over a ppm query score
    bad("""{"query": {"function_score": {
           "query": {"rank_feature": {"field": "n_chars", "saturation": {"pivot": 10}}},
           "functions": [{"weight": 2}], "boost_mode": "sum"}}}""")
    // boosting wrapping a ppm positive
    bad("""{"query": {"boosting": {
           "positive": {"distance_feature": {"field": "n_chars", "origin": 3, "pivot": 5}},
           "negative": {"term": {"lang": "fr"}}, "negative_boost": 0.5}}}""")
    // a ppm clause ALONE in a scoring slot stays legal (one scale)
    assert(QueryDsl.search(docs,
      """{"query": {"bool": {
           "filter": [{"term": {"lang": "en"}}],
           "must": [{"rank_feature": {"field": "n_chars",
                     "saturation": {"pivot": 10}}}]}},
         "size": 5, "sort": [{"_score": "desc"}, "doc_id"]}""").count() === 5)
  }

  test("top_hits can sort by _score (hits carry the computed score)") {
    val out = QueryDsl.search(docs,
      """{"query": {"match": {"text": "spark"}},
         "aggs": {"by_lang": {"terms": {"field": "lang"},
           "aggs": {"top": {"top_hits": {"size": 1,
             "sort": [{"_score": "desc"}, "doc_id"],
             "_source": ["doc_id", "score"]}}}}}}""").collect()
    assert(out.nonEmpty)
    // each bucket's single hit carries the bucket-maximal score
    val overlap = size(array_intersect(array_distinct(split(col("text"), " ")),
      array(lit("spark")))).cast("long")
    val best = docs.withColumn("s", overlap).filter(col("s") >= 1)
      .groupBy("lang").agg(max(col("s")).as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(r.getAs[Long]("score") === best(r.getString(0))))
  }

  test("intOpt-typed options reject floats instead of defaulting") {
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"query": {"match_all": {}},
         "aggs": {"s": {"significant_terms":
           {"field": "source", "min_doc_count": 2.0}}}}""")
    bad("""{"query": {"fuzzy": {"text": {"value": "spark",
           "prefix_length": 1.5}}}}""")
    bad("""{"query": {"fuzzy": {"text": {"value": "spark",
           "fuzziness": -1}}}}""")
    bad("""{"query": {"constant_score":
           {"filter": {"term": {"lang": "en"}}, "boost": -5}}}""")
    bad("""{"aggs": {"a": {"range": {"field": "n_chars",
           "ranges": [{"to": 200}], "keyed": true}}}}""")  // unknown range opt
    bad("""{"aggs": {"a": {"range": {"field": "n_chars",
           "ranges": [{"to": 200}]}, "terms": {"field": "lang"}}}}""") // two kinds
    bad("""{"query": {"match_all": {}}, "search_after": [3],
         "sort": ["doc_id"],
         "aggs": {"a": {"avg": {"field": "n_chars"}}}}""")  // cursor + aggs
  }

  test("new clauses fail loud on malformed bodies") {
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"query": {"ids": {"values": [1]}}}""")                  // no field
    bad("""{"query": {"ids": {"values": [], "field": "doc_id"}}}""") // empty
    bad("""{"query": {"multi_match": {"query": "x"}}}""")           // no fields
    bad("""{"query": {"multi_match": {"query": "x", "fields": ["a"],
           "type": "nope"}}}""")                                    // bad type
    bad("""{"query": {"multi_match": {"query": "x", "fields": ["a"],
           "type": "most_fields", "tie_breaker": 0.3}}}""")         // tb on most
    bad("""{"query": {"simple_query_string": {"query": "x",
           "fields": ["a", "b"]}}}""")                              // two fields
    bad("""{"query": {"function_score": {"functions": [
           {"weight": 1.5}]}}}""")                                  // float weight
    bad("""{"query": {"distance_feature": {"field": "n_chars",
           "origin": 1.5, "pivot": 10}}}""")                        // float origin
    bad("""{"query": {"distance_feature": {"field": "n_chars",
           "origin": 3, "pivot": 0}}}""")                           // pivot 0
    bad("""{"query": {"regexp": {"source": 3}}}""")                 // non-string
    bad("""{"query": {"nested": {"query": {"match_all": {}}}}}""")  // no path
    bad("""{"query": {"nested": {"path": "items",
           "query": {"match": {"items.t": "x"}}}}}""")              // unsupported inner
    bad("""{"query": {"nested": {"path": "items", "score_mode": "avg",
           "query": {"match_all": {}}}}}""")                        // bad score_mode
    bad("""{"query": {"term": {"lang": "en"}},
         "aggs": {"p": {"percentiles": {"field": "n_chars",
           "percents": [0]}}}}""")                                  // percent 0
    bad("""{"query": {"term": {"lang": "en"}},
         "aggs": {"p": {"percentiles": {"field": "n_chars",
           "percents": [50.5]}}}}""")                               // non-integer
  }

  test("query_string: precedence, grouping, boosts, prohibit NOT") {
    // NOT > AND > OR; `x NOT y` is prohibit (AND NOT), per Lucene
    val dsl = QueryDsl.search(docs,
      """{"query": {"query_string": {
           "query": "text:spark AND (join OR \"data window\"^2) NOT source:src4",
           "default_field": "text"}},
         "sort": [{"_score": "desc"}, "doc_id"],
         "_source": ["doc_id", "score"]}""")
    val tok = array_distinct(split(col("text"), " "))
    val hasSpark = array_contains(tok, "spark")
    val hasJoin = array_contains(tok, "join")
    val hasPhrase = concat(lit(" "), col("text"), lit(" ")).contains(" data window ")
    val hand = docs
      .filter(hasSpark && (hasJoin || hasPhrase) &&
        !array_contains(split(col("source"), " "), "src4"))
      .select(col("doc_id"),
        (lit(1L) + when(hasJoin, 1L).otherwise(0L)
          + when(hasPhrase, 2L).otherwise(0L)).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
    assert(dsl.collect().toSeq === hand.collect().toSeq)
  }

  test("terms lookup and geo_shape predicates push to the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tlgs").toString
    (1 to 200).map(i => (i.toLong, s"k${i % 5}", (i % 90).toDouble,
        (i % 180).toDouble - 90.0))
      .toDF("id", "kind", "lat", "lon").write.mode("overwrite").parquet(dir)
    val pts = spark.read.parquet(dir)
    // terms lookup: the resolved values compile to a pushed In filter
    val viaLookup = QueryDsl.search(pts,
      """{"query": {"terms": {"kind":
           {"id_field": "id", "id": 7, "path": "kind"}}},
         "sort": ["id"], "_source": ["id"]}""")
    val lookupPlan = viaLookup.queryExecution.executedPlan.toString
    assert(lookupPlan.contains("PushedFilters") && lookupPlan.contains("kind"),
      lookupPlan.take(800))
    assert(viaLookup.count() === 40L) // k2: 200/5
    // geo_shape envelope: four pushed band comparisons
    val viaShape = QueryDsl.search(pts,
      """{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon",
           "shape": {"type": "envelope",
             "coordinates": [[-20.0, 50.0], [40.0, 10.0]]}}},
         "sort": ["id"], "_source": ["id"]}""")
    val shapePlan = viaShape.queryExecution.executedPlan.toString
    assert(shapePlan.contains("PushedFilters") &&
      shapePlan.contains("LessThanOrEqual(lat,50.0"), shapePlan.take(800))
    // doc_shape envelopes: the corner comparisons also reach the scan
    val boxDir = java.nio.file.Files.createTempDirectory("tlgs_box").toString
    (1 to 200).map { i =>
      val la = (i % 80).toDouble; val lo = (i % 160).toDouble - 80.0
      (i.toLong, la, la + 2.0, lo, lo + 2.0)
    }.toDF("id", "la0", "la1", "lo0", "lo1")
      .write.mode("overwrite").parquet(boxDir)
    val boxes = spark.read.parquet(boxDir)
    val viaDoc = QueryDsl.search(boxes,
      """{"query": {"geo_shape": {
           "doc_shape": {"type": "envelope",
             "lat_min_field": "la0", "lat_max_field": "la1",
             "lon_min_field": "lo0", "lon_max_field": "lo1"},
           "shape": {"type": "envelope",
             "coordinates": [[-20.0, 50.0], [40.0, 10.0]]},
           "relation": "within"}},
         "sort": ["id"], "_source": ["id"]}""")
    val docPlan = viaDoc.queryExecution.executedPlan.toString
    assert(docPlan.contains("PushedFilters") &&
      docPlan.contains("GreaterThanOrEqual(la0,10.0"), docPlan.take(800))
  }

  test("search_type / stored_fields / terminate_after wire compat") {
    import spark.implicits._
    val t = Seq((1L, "spark"), (2L, "hive")).toDF("id", "text")
    // search_type: both values accepted, identical results (the engine
    // always computes corpus-global stats — dfs semantics)
    val base = QueryDsl.search(t,
      """{"query": {"match": {"text": "spark"}},
         "sort": ["id"], "_source": ["id"]}""").as[Long].collect().toSeq
    for (st <- Seq("query_then_fetch", "dfs_query_then_fetch")) {
      val withSt = QueryDsl.search(t,
        s"""{"query": {"match": {"text": "spark"}},
           "search_type": "$st", "sort": ["id"], "_source": ["id"]}""")
        .as[Long].collect().toSeq
      assert(withSt === base)
    }
    // stored_fields: canonicalizes to _source (every column is stored)
    val viaStored = QueryDsl.search(t,
      """{"query": {"match_all": {}}, "sort": ["id"],
         "stored_fields": ["id", "text"]}""").collect().toSeq
    val viaSource = QueryDsl.search(t,
      """{"query": {"match_all": {}}, "sort": ["id"],
         "_source": ["id", "text"]}""").collect().toSeq
    assert(viaStored === viaSource)
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"match_all": {}}, "search_type": "scan"}""",
      "search_type must be")
    bad("""{"query": {"match_all": {}}, "stored_fields": ["id"],
      "_source": ["id"]}""", "not both")
    bad("""{"query": {"match_all": {}}, "stored_fields": "_none_"}""",
      "no metadata-only shape")
    bad("""{"query": {"match_all": {}}, "terminate_after": 100}""",
      "non-deterministic by construction")
  }

  test("query_string: trailing-wildcard and fuzzy terms expand in the token model") {
    val dsl = QueryDsl.search(docs,
      """{"query": {"query_string": {"query": "spar* OR sprk~1",
           "default_field": "text"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""")
    val toks = split(col("text"), " ")
    val hasPrefix = exists(toks, t => t.startsWith("spar"))
    val hasFuzzy = exists(array_distinct(toks),
      t => levenshtein(t, lit("sprk")) <= 1)
    val hand = docs.filter(hasPrefix || hasFuzzy)
      .select(col("doc_id"),
        (when(hasPrefix, 1L).otherwise(0L) + when(hasFuzzy, 1L).otherwise(0L))
          .as("score"))
      .orderBy(col("doc_id"))
    assert(dsl.collect().toSeq === hand.collect().toSeq)
    // bare `term~` is maxEdits 2, the Lucene default
    def run(q: String) = QueryDsl.search(docs,
      s"""{"query": {"query_string": {"query": "$q",
            "default_field": "text"}}, "_source": ["doc_id"]}""").count()
    assert(run("sprk~") === run("sprk~2"))
  }

  test("query_string: default_operator and / or change adjacency") {
    def run(op: String) = QueryDsl.search(docs,
      s"""{"query": {"query_string": {
            "query": "spark join", "default_field": "text",
            "default_operator": "$op"}},
          "_source": ["doc_id"]}""").count()
    val both = docs.filter(array_contains(split(col("text"), " "), "spark") &&
      array_contains(split(col("text"), " "), "join")).count()
    val either = docs.filter(array_contains(split(col("text"), " "), "spark") ||
      array_contains(split(col("text"), " "), "join")).count()
    assert(run("and") === both)
    assert(run("or") === either)
    assert(both < either, "test data must distinguish the operators")
  }

  test("query_string fails loud outside the grammar") {
    def bad(q: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs,
        s"""{"query": {"query_string": {"query": ${q},
             "default_field": "text"}}, "_source": ["doc_id"]}"""))
    bad("\"sp*rk\"")            // mid-token wildcard
    bad("\"*park\"")            // leading wildcard
    bad("\"sp?rk\"")            // ? glob
    bad("\"spark~3\"")          // fuzziness out of range
    bad("\"join^1.5\"")         // float boost
    bad("\"join^0\"")           // boost < 1
    bad("\"(spark join\"")      // unbalanced (
    bad("\"spark join)\"")      // unbalanced )
    bad("\"spark AND\"")        // dangling operator
    bad("\"AND spark\"")        // operator without left clause
    bad("\"spark NOT\"")        // dangling NOT
    bad("\"[1 TO 5]\"")         // range syntax
    bad("\"\\\"unterminated\"") // unterminated phrase
    bad("\"\"")                 // empty
    // bare term with no default_field
    assertThrows[IllegalArgumentException](QueryDsl.search(docs,
      """{"query": {"query_string": {"query": "spark"}},
         "_source": ["doc_id"]}"""))
  }

  test("collapse keeps the top hit per key; one window, no join") {
    val dsl = QueryDsl.search(docs,
      """{"query": {"match": {"text": "spark join"}},
         "collapse": {"field": "source"},
         "sort": [{"_score": "desc"}, "doc_id"],
         "_source": ["source", "doc_id", "score"]}""")
    import org.apache.spark.sql.expressions.Window
    val scored = docs.withColumn("score",
        size(array_intersect(array_distinct(split(col("text"), " ")),
          array(lit("spark"), lit("join")))).cast("long"))
      .filter(col("score") >= 1)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id"))
    val hand = scored.withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col("source"), col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
    assert(dsl.collect().toSeq === hand.collect().toSeq)
    // plan pin: collapse is ONE window over the hit set, never a
    // self-join re-scanning the hits per group
    val plan = dsl.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("window"), plan.take(800))
    assert(!plan.contains("Join"), s"collapse must not plan a join:\n${plan.take(2000)}")
  }

  test("collapse validates its body and combinations loudly") {
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"query": {"match_all": {}},
         "collapse": {"field": "source"},
         "_source": ["doc_id"]}""")                         // no sort
    bad("""{"query": {"match_all": {}}, "sort": ["doc_id"],
         "collapse": {"field": "source",
           "inner_hits": {"size": 0}}}""")                  // size < 1
    bad("""{"query": {"match_all": {}}, "sort": ["doc_id"],
         "collapse": {"field": "source", "max_concurrent_group_searches": 2}}""")
    bad("""{"query": {"term": {"lang": "en"}},
         "collapse": {"field": "source"}, "sort": ["doc_id"],
         "aggs": {"a": {"avg": {"field": "n_chars"}}}}""")  // with aggs
    bad("""{"query": {"match_all": {}},
         "sort": ["doc_id"], "search_after": [10],
         "collapse": {"field": "source"}}""")               // with cursor
    bad("""{"query": {"more_like_this": {"fields": ["text"],
           "like": {"doc_id": 7}}},
         "sort": ["doc_id"], "collapse": {"field": "doc_id"}}""")
  }

  test("date_range buckets are calendar-anchored [from, to) in request order") {
    val orders = Tables.load(spark, sf(), "orders")
    val dsl = QueryDsl.search(orders,
      """{"query": {"match_all": {}},
         "aggs": {"period": {"date_range": {"field": "o_orderdate",
             "ranges": [{"to": "1994-01-01"}, {"from": "1994-01-01"}]}}}}""")
    val rows = dsl.collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("*-1994-01-01", "1994-01-01-*"))
    val before = orders.filter(col("o_orderdate") < lit("1994-01-01").cast("date")).count()
    val after = orders.filter(col("o_orderdate") >= lit("1994-01-01").cast("date")).count()
    assert(rows.map(_.getLong(1)).toSeq === Seq(before, after))

    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(orders, req))
    bad("""{"aggs": {"p": {"date_range": {"field": "o_orderdate",
           "ranges": [{"from": "not-a-date"}]}}}}""")
    bad("""{"aggs": {"p": {"date_range": {"field": "o_orderdate",
           "ranges": [{}]}}}}""")                            // unbounded
    bad("""{"aggs": {"p": {"date_range": {"field": "o_orderdate",
           "ranges": [{"from": 19940101}]}}}}""")            // non-string
  }

  test("geo_bounding_box pushes its four band predicates to the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gbb").toString
    (1 to 200).map(i => (i.toLong, (i % 90).toDouble, (i % 180).toDouble - 90.0))
      .toDF("id", "lat", "lon").write.mode("overwrite").parquet(dir)
    val pts = spark.read.parquet(dir)
    val dsl = QueryDsl.search(pts,
      """{"query": {"geo_bounding_box": {
           "lat_field": "lat", "lon_field": "lon",
           "top_left": {"lat": 50.0, "lon": -20.0},
           "bottom_right": {"lat": 10.0, "lon": 40.0}}},
         "sort": ["id"], "_source": ["id"]}""")
    val hand = pts.filter(col("lat") <= 50.0 && col("lat") >= 10.0 &&
      col("lon") >= -20.0 && col("lon") <= 40.0)
      .select(col("id")).orderBy(col("id"))
    assert(dsl.collect().toSeq === hand.collect().toSeq)
    val plan = dsl.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan.take(500))
    // (the toString truncates long filter lists — the lat band plus the
    // DataFilters rendering of the lon band is evidence enough)
    assert(plan.contains("LessThanOrEqual(lat,50.0)") &&
      plan.contains("GreaterThanOrEqual(lat,10.0)") &&
      plan.contains("lon") && plan.contains(">= -20.0"),
      s"box bands must reach the parquet scan:\n${plan.take(2000)}")

    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(pts, req))
    bad("""{"query": {"geo_bounding_box": {"lat_field": "lat",
           "lon_field": "lon",
           "top_left": {"lat": 10.0, "lon": 0.0},
           "bottom_right": {"lat": 50.0, "lon": 10.0}}}}""")  // inverted lat
    bad("""{"query": {"geo_bounding_box": {"lat_field": "lat",
           "lon_field": "lon",
           "top_left": {"lat": 50.0, "lon": 170.0},
           "bottom_right": {"lat": 10.0, "lon": -170.0}}}}""") // antimeridian
    bad("""{"query": {"geo_bounding_box": {"lat_field": "lat",
           "top_left": {"lat": 50.0, "lon": 0.0},
           "bottom_right": {"lat": 10.0, "lon": 10.0}}}}""")   // no lon_field
  }

  test("pipeline aggs: key-ordered windows over the bucket series") {
    val dsl = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}},
         "aggs": {"bucket": {"histogram": {"field": "n_chars", "interval": 100},
           "aggs": {
             "sum_chars": {"sum": {"field": "n_chars"}},
             "cum": {"cumulative_sum": {"buckets_path": "sum_chars"}},
             "delta": {"derivative": {"buckets_path": "_count"}}}}}}""")
    val rows = dsl.collect()
    // key order (not doc_count order), running total strictly increasing
    val keys = rows.map(_.getLong(0)).toSeq
    assert(keys === keys.sorted, "pipeline output must be in bucket-key order")
    val cums = rows.map(r => r.getLong(r.fieldIndex("cum"))).toSeq
    assert(cums === cums.sorted && cums.last ===
      rows.map(r => r.getLong(r.fieldIndex("sum_chars"))).sum)
    assert(rows.head.isNullAt(rows.head.fieldIndex("delta")),
      "first bucket's derivative is NULL (OpenSearch omits it)")

    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"aggs": {"b": {"terms": {"field": "source"},
           "aggs": {"c": {"cumulative_sum": {"buckets_path": "_count"}}}}}}""")
    bad("""{"aggs": {"b": {"histogram": {"field": "n_chars", "interval": 100},
           "aggs": {"c": {"cumulative_sum": {"buckets_path": "nope"}}}}}}""")
    bad("""{"aggs": {"b": {"histogram": {"field": "n_chars", "interval": 100},
           "aggs": {"c": {"cumulative_sum": {}}}}}}""")      // no path
    bad("""{"aggs": {"b": {"histogram": {"field": "n_chars", "interval": 100},
           "aggs": {"c": {"moving_avg": {"buckets_path": "_count",
             "window": 0}}}}}}""")                           // window 0
    bad("""{"aggs": {"b": {"histogram": {"field": "n_chars", "interval": 100},
           "aggs": {"c": {"derivative": {"buckets_path": "_count",
             "unit": "day"}}}}}}""")                         // unsupported opt
  }

  test("bucket_script: per-bucket arithmetic over sibling metrics, fail-loud grammar") {
    // the ratio idiom: exact integer a*100, one IEEE divide
    val dsl = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}},
         "aggs": {"bucket": {"histogram": {"field": "n_chars", "interval": 100},
           "aggs": {
             "sum_chars": {"sum": {"field": "n_chars"}},
             "avg100": {"bucket_script": {
               "buckets_path": {"a": "sum_chars", "b": "_count"},
               "script": "params.a * 100 / params.b"}}}}}}""")
    val rows = dsl.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getLong(r.fieldIndex("sum_chars"))
      val b = r.getLong(r.fieldIndex("doc_count"))
      assert(r.getDouble(r.fieldIndex("avg100")) === a * 100 / b.toDouble)
    }
    // divide-free scripts stay in the exact integer types (precedence
    // and parentheses honored)
    val ints = QueryDsl.search(docs,
      """{"aggs": {"bucket": {"histogram": {"field": "n_chars", "interval": 200},
           "aggs": {"d": {"bucket_script": {
             "buckets_path": {"c": "_count"},
             "script": "(params.c + 1) * 2 - params.c"}}}}}}""")
    assert(ints.schema("d").dataType ===
      org.apache.spark.sql.types.LongType)
    ints.collect().foreach(r =>
      assert(r.getLong(r.fieldIndex("d")) ===
        r.getLong(r.fieldIndex("doc_count")) + 2))
    // no order dependence → allowed under a terms parent, and
    // bucket_selector may reference the derived column
    val t = QueryDsl.search(docs,
      """{"aggs": {"g": {"terms": {"field": "lang"},
           "aggs": {"twice": {"bucket_script": {
               "buckets_path": {"c": "_count"}, "script": "params.c * 2"}},
             "keep": {"bucket_selector": {
               "buckets_path": {"w": "twice"},
               "script": "params.w >= 20"}}}}}}""")
    t.collect().foreach { r =>
      val dc = r.getLong(r.fieldIndex("doc_count"))
      assert(r.getLong(r.fieldIndex("twice")) === 2 * dc && 2 * dc >= 20)
    }
    def bad(script: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs,
        s"""{"aggs": {"b": {"histogram": {"field": "n_chars", "interval": 100},
             "aggs": {"x": {"bucket_script": {
               "buckets_path": {"a": "_count"},
               "script": "$script"}}}}}}"""))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("params.zz + 1", "undeclared param")
    bad("params.a + ", "ends unexpectedly")
    bad("(params.a + 1", "ends unexpectedly")
    bad("params.a 5", "trailing tokens")
    bad("params.a ^ 2", "unrecognized token")
    bad("* params.a", "misplaced operator")
    bad("", "is empty")
    val e1 = intercept[IllegalArgumentException](QueryDsl.search(docs,
      """{"aggs": {"b": {"histogram": {"field": "n_chars", "interval": 100},
           "aggs": {"x": {"bucket_script": {
             "buckets_path": "sum_chars",
             "script": "params.a"}}}}}}"""))
    assert(e1.getMessage.contains("buckets_path object"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](QueryDsl.search(docs,
      """{"aggs": {"b": {"histogram": {"field": "n_chars", "interval": 100},
           "aggs": {"x": {"bucket_script": {
             "buckets_path": {"a": "_count"},
             "script": "params.a", "gap_policy": "skip"}}}}}}"""))
    assert(e2.getMessage.contains("unsupported bucket_script option"),
      e2.getMessage)
  }

  test("geohash_grid emits real base-32 geohash keys; geo_bounds is the min/max box") {
    import spark.implicits._
    // the public known vector: 57.64911,10.40744 → u4pruydqqvj
    val pts = Seq((1L, 57.64911, 10.40744), (2L, 57.64911, 10.40744),
      (3L, 90.0, 180.0), (4L, -90.0, -180.0)).toDF("id", "lat", "lon")
    def cells(p: Int): Seq[(String, Long)] = QueryDsl.search(pts,
      s"""{"aggs": {"cell": {"geohash_grid":
           {"lat_field": "lat", "lon_field": "lon", "precision": $p}}}}""")
      .as[(String, Long)].collect().toSeq
    assert(cells(11) === Seq(("u4pruydqqvj", 2L), ("00000000000", 1L),
      ("zzzzzzzzzzz", 1L)))
    // odd precision exercises the other interleave parity
    assert(cells(5) === Seq(("u4pru", 2L), ("00000", 1L), ("zzzzz", 1L)))
    assert(cells(1) === Seq(("u", 2L), ("0", 1L), ("z", 1L)))
    // size caps buckets after the count-desc order
    val capped = QueryDsl.search(pts,
      """{"aggs": {"cell": {"geohash_grid":
           {"lat_field": "lat", "lon_field": "lon", "precision": 2,
            "size": 1}}}}""").as[(String, Long)].collect().toSeq
    assert(capped === Seq(("u4", 2L)))
    // null coordinates are omitted (the missing-geo_point rule)
    val withNull = pts.union(Seq((5L, Option.empty[Double], Option(0.0)))
      .toDF("id", "lat", "lon"))
    assert(QueryDsl.search(withNull,
      """{"aggs": {"cell": {"geohash_grid":
           {"lat_field": "lat", "lon_field": "lon", "precision": 1}}}}""")
      .agg(sum("doc_count")).as[Long].head() === 4L)
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(pts, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"c": {"geohash_grid": {"lat_field": "lat",
      "lon_field": "lon", "precision": 13}}}}""", "precision must be 1-12")
    bad("""{"aggs": {"c": {"geohash_grid": {"lat_field": "lat",
      "lon_field": "lon", "bogus": 1}}}}""", "unsupported geohash_grid option")
    bad("""{"aggs": {"c": {"geohash_grid": {"lon_field": "lon"}}}}""",
      "requires lat_field")
    // geo_bounds: exact min/max per axis, gate-aware under filter
    val box = QueryDsl.search(pts,
      """{"aggs": {"box": {"geo_bounds":
           {"lat_field": "lat", "lon_field": "lon"}}}}""")
      .as[(Double, Double, Double, Double)].head()
    assert(box === ((90.0, -180.0, -90.0, 180.0)))
    val gated = QueryDsl.search(pts,
      """{"aggs": {"pos": {"filter": {"range": {"lat": {"gte": 0}}},
           "aggs": {"box": {"geo_bounds":
             {"lat_field": "lat", "lon_field": "lon"}}}}}}""").collect().head
    assert(gated.getAs[Double]("box_bottom_lat") === 57.64911)
    bad("""{"aggs": {"b": {"geo_bounds": {"lat_field": "lat",
      "lon_field": "lon", "wrap_longitude": true}}}}""",
      "unsupported geo_bounds option")
  }

  test("median_absolute_deviation: exact discrete MAD, global and under buckets") {
    import spark.implicits._
    val t = Seq(("a", 1L), ("a", 2L), ("a", 9L), ("b", 5L), ("b", 5L),
      ("b", 6L), ("b", 100L)).toDF("k", "v")
    // global: median(a-vals ∪ b-vals) — medians/deviations by hand:
    // values 1,2,5,5,6,9,100 → median 5; |x−5| = 4,3,0,0,1,4,95 →
    // sorted 0,0,1,3,4,4,95 → MAD 3
    val g = QueryDsl.search(t,
      """{"aggs": {"mad_v": {"median_absolute_deviation": {"field": "v"}}}}""")
      .as[Double].head()
    assert(g === 3.0)
    // beside a one-pass metric (broadcast cross of one-row tables)
    val both = QueryDsl.search(t,
      """{"aggs": {"n": {"value_count": {"field": "v"}},
           "mad_v": {"median_absolute_deviation": {"field": "v"}}}}""")
      .collect().head
    assert(both.getAs[Long]("n") === 7L && both.getAs[Double]("mad_v") === 3.0)
    // under a terms bucket: a → median 2, |1,2,9 − 2| = 1,0,7 → 1;
    // b → median 5, |0,0,1,95| → 0 (ceil(0.5·4)=2nd of 0,0,1,95)
    val bucketed = QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "k"},
           "aggs": {"mx": {"max": {"field": "v"}},
             "mad_v": {"median_absolute_deviation": {"field": "v"}}}}}}""")
      .orderBy("g").as[(String, Long, Long, Double)].collect().toSeq
    assert(bucketed === Seq(("a", 3L, 9L, 1.0), ("b", 4L, 100L, 0.0)))
    // the NULL-key bucket keeps its MAD (null-safe join):
    // NULL → vals 10,14,20 → med 14, devs 0,4,6 → MAD 4;
    // a → vals 1,3,8 → med 3, devs 0,2,5 → MAD 2
    val tn = Seq((Some("a"), 1L), (Some("a"), 3L), (Some("a"), 8L),
      (None, 10L), (None, 14L), (None, 20L)).toDF("k", "v")
    val withNull = QueryDsl.search(tn,
      """{"aggs": {"g": {"terms": {"field": "k"},
           "aggs": {"mad_v": {"median_absolute_deviation": {"field": "v"}}}}}}""")
      .orderBy("g").as[(Option[String], Long, Double)].collect().toSeq
    assert(withNull === Seq((None, 3L, 4.0), (Some("a"), 3L, 2.0)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"m": {"median_absolute_deviation": {"field": "v",
      "compression": 100}}}}""", "unsupported median_absolute_deviation option")
    bad("""{"aggs": {"m": {"median_absolute_deviation": {}}}}""",
      "needs a field")
  }

  test("parent_id matches one parent's children as a per-row predicate") {
    import spark.implicits._
    val t = Seq(
      ("q", 1L, Option.empty[Long], "parent a"),
      ("q", 2L, Option.empty[Long], "parent b"),
      ("a", 10L, Some(1L), "child of a"),
      ("a", 11L, Some(1L), "another child"),
      ("a", 12L, Some(2L), "child of b"))
      .toDF("rel", "id", "pid", "text")
    def ids(json: String): Seq[Long] =
      QueryDsl.search(t, json).select("id").as[Long].collect().toSeq.sorted
    assert(ids("""{"query": {"parent_id": {"type": "a", "id": 1,
      "join_field": "rel", "parent_field": "pid"}}, "_source": ["id"]}""")
      === Seq(10L, 11L))
    // composes inside bool like any predicate clause
    assert(ids("""{"query": {"bool": {"must": [
      {"parent_id": {"type": "a", "id": 1,
        "join_field": "rel", "parent_field": "pid"}},
      {"match": {"text": "another"}}]}}, "_source": ["id"]}""")
      === Seq(11L))
    // a parent row never matches (its join field is the parent type)
    assert(ids("""{"query": {"parent_id": {"type": "q", "id": 1,
      "join_field": "rel", "parent_field": "pid"}}, "_source": ["id"]}""")
      === Seq.empty)
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"parent_id": {"type": "a", "id": 1,
      "join_field": "rel"}}}""", "needs parent_field")
    bad("""{"query": {"parent_id": {"type": "a",
      "join_field": "rel", "parent_field": "pid"}}}""", "needs the parent 'id'")
  }

  test("has_child / has_parent: the relations model compiles to equi-joins") {
    import spark.implicits._
    val t = Seq(
      ("q", 1L, Option.empty[Long], "alpha"),
      ("q", 2L, Option.empty[Long], "beta"),
      ("a", 10L, Some(1L), "spark x"),
      ("a", 11L, Some(1L), "spark y"),
      ("a", 12L, Some(2L), "zzz"),
      ("a", 13L, Some(1L), "zzz")
    ).toDF("rel", "doc_id", "parent_id", "text")
    val relOpts = """"join_field": "rel", "id_field": "doc_id",
      "parent_field": "parent_id""""
    // has_child sum: parent 1 has 2 matching children (score 2);
    // parent 2's only child misses the query → min_children 2 gates
    val hc = QueryDsl.search(t,
      s"""{"query": {"has_child": {"type": "a", $relOpts,
           "query": {"match": {"text": "spark"}},
           "score_mode": "sum", "min_children": 2}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""")
    assert(hc.as[(Long, Long)].collect().toSeq === Seq((1L, 2L)))
    // score_mode none → constant 1; default min_children 1 admits
    // any parent with one matching child
    val hcAll = QueryDsl.search(t,
      s"""{"query": {"has_child": {"type": "a", $relOpts,
           "query": {"match_all": {}}, "score_mode": "none"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(hcAll === Seq((1L, 1L), (2L, 1L)))
    // max_children excludes the 3-child parent
    val hcMax = QueryDsl.search(t,
      s"""{"query": {"has_child": {"type": "a", $relOpts,
           "query": {"match_all": {}}, "max_children": 1}},
         "sort": ["doc_id"], "_source": ["doc_id"]}""")
      .as[Long].collect().toSeq
    assert(hcMax === Seq(2L))
    // has_parent: children of the parent matching "alpha"; score
    // propagates; type gates the returned rows
    val hp = QueryDsl.search(t,
      s"""{"query": {"has_parent": {"parent_type": "q", $relOpts,
           "query": {"match": {"text": "alpha"}}, "score": true,
           "type": "a"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(hp === Seq((10L, 1L), (11L, 1L), (13L, 1L)))
    // id-collision gate: a CHILD row whose id collides with a matched
    // parent pointer must NOT return as a parent hit — the returned
    // side excludes the child type (and parent_type pins the relation
    // exactly). Parents and children numbered independently here:
    // child doc_id 1 collides with parent doc_id 1.
    val coll = Seq(
      ("q", 1L, Option.empty[Long], "alpha"),
      ("a", 1L, Some(1L), "spark"),
      ("a", 2L, Some(1L), "spark")
    ).toDF("rel", "doc_id", "parent_id", "text")
    val hcColl = QueryDsl.search(coll,
      s"""{"query": {"has_child": {"type": "a", $relOpts,
           "query": {"match": {"text": "spark"}}, "score_mode": "sum"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(hcColl === Seq((1L, 2L)), "child row with colliding id leaked")
    val hcPt = QueryDsl.search(coll,
      s"""{"query": {"has_child": {"type": "a", "parent_type": "q", $relOpts,
           "query": {"match": {"text": "spark"}}, "score_mode": "sum"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(hcPt === Seq((1L, 2L)))
    // equi-join plan: never a nested-loop/cartesian
    val plan = hc.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"relations model must stay an equi-join:\n$plan")
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    // avg: one IEEE divide from the exact (sum, count) monoids — the
    // OpenSearch DEFAULT score_mode, score typed DOUBLE for this mode.
    // Child scores: 10 "spark x" → 2, 11 "spark y" → 1, 13 "zzz" → 1
    // (parent 1 avg 4/3); 12 "zzz" → 1 (parent 2 avg 1.0).
    val hcAvg = QueryDsl.search(t,
      s"""{"query": {"has_child": {"type": "a", $relOpts,
           "query": {"match": {"text": "spark x zzz"}},
           "score_mode": "avg"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""")
      .as[(Long, Double)].collect().toSeq
    assert(hcAvg === Seq((1L, 4.0 / 3.0), (2L, 1.0)))
    bad(s"""{"query": {"has_child": {"type": "a", $relOpts,
      "query": {"match_all": {}}, "score_mode": "median"}}}""",
      "score_mode must be none/sum/min/max/avg")
    bad(s"""{"query": {"has_child": {"type": "a", $relOpts,
      "query": {"match_all": {}}, "min_children": 0}}}""",
      "min_children must be >= 1")
    bad(s"""{"query": {"has_child": {"type": "a", $relOpts,
      "query": {"match_all": {}}}}, "aggs": {"n": {"value_count":
      {"field": "doc_id"}}}}""", "cannot be combined with has_child")
    bad(s"""{"query": {"has_parent": {"parent_type": "q", $relOpts,
      "query": {"match_all": {}}, "score": 1}}}""", "must be a boolean")
    // nested inside bool is unsupported (request-level members)
    bad(s"""{"query": {"bool": {"must": [{"has_child": {"type": "a",
      $relOpts, "query": {"match_all": {}}}}]}}}""", "")
  }

  test("inner_hits: matching children alongside relation/nested hits; caps and sorts fail loud") {
    import spark.implicits._
    val t = Seq(
      ("q", 1L, Option.empty[Long], "alpha"),
      ("q", 2L, Option.empty[Long], "beta"),
      ("a", 10L, Some(1L), "spark x"),
      ("a", 11L, Some(1L), "spark y spark"),
      ("a", 12L, Some(2L), "zzz"),
      ("a", 13L, Some(1L), "spark")
    ).toDF("rel", "doc_id", "parent_id", "text")
    val relOpts = """"join_field": "rel", "id_field": "doc_id",
      "parent_field": "parent_id""""
    // has_child inner_hits: parent 1's 3 matching children score
    // (1, 2, 1) under "spark y" (distinct-term membership) — top-2 by
    // (score desc, id asc) = child 11 (score 2) then 10 (score 1)
    val hc = QueryDsl.search(t,
      s"""{"query": {"has_child": {"type": "a", $relOpts,
           "query": {"match": {"text": "spark y"}}, "score_mode": "sum",
           "inner_hits": {"size": 2}}},
         "sort": ["doc_id", "inner_rank"],
         "_source": ["doc_id", "score", "inner_rank", "inner_id",
                     "inner_score"]}""")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(hc === Seq((1L, 4L, 1L, 11L, 2L), (1L, 4L, 2L, 10L, 1L)))
    // the plan stays an equi-join — never a per-row subquery
    val hcPlan = QueryDsl.search(t,
      s"""{"query": {"has_child": {"type": "a", $relOpts,
           "query": {"match": {"text": "spark"}},
           "inner_hits": {"size": 2}}}}""")
      .queryExecution.executedPlan.toString
    assert(!hcPlan.contains("NestedLoop") && !hcPlan.contains("Cartesian"),
      s"inner_hits must keep the equi-join plan:\n$hcPlan")
    // has_parent inner_hits: each child carries its parent (rank 1)
    val hp = QueryDsl.search(t,
      s"""{"query": {"has_parent": {"parent_type": "q", $relOpts,
           "query": {"match": {"text": "alpha"}}, "score": true,
           "type": "a", "inner_hits": {"size": 3}}},
         "sort": ["doc_id"],
         "_source": ["doc_id", "inner_rank", "inner_id", "inner_score"]}""")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(hp === Seq((10L, 1L, 1L, 1L), (11L, 1L, 1L, 1L), (13L, 1L, 1L, 1L)))
    // nested inner_hits: matching elements in document order, capped
    val n = Seq(
      (1L, Seq((1L, 10L), (2L, 60L), (3L, 70L), (4L, 80L))),
      (2L, Seq((1L, 55L))),
      (3L, Seq((1L, 5L)))
    ).toDF("order_key", "items0")
      .selectExpr("order_key",
        "transform(items0, x -> named_struct('ln', x._1, 'qty', x._2)) AS items")
    val ni = QueryDsl.search(n,
      """{"query": {"nested": {"path": "items",
           "query": {"range": {"items.qty": {"gte": 50}}},
           "score_mode": "sum",
           "inner_hits": {"size": 2, "_source": ["items.ln", "items.qty"]}}},
         "sort": ["order_key", "inner_rank"],
         "_source": ["order_key", "score", "inner_rank", "inner_ln",
                     "inner_qty"]}""")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(ni === Seq(
      (1L, 3L, 1L, 2L, 60L), (1L, 3L, 2L, 3L, 70L), // capped at 2 of 3
      (2L, 1L, 1L, 1L, 55L)))
    def bad(df: org.apache.spark.sql.DataFrame, json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(df, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad(t, s"""{"query": {"has_child": {"type": "a", $relOpts,
      "query": {"match_all": {}}, "inner_hits": {}}}}""", "requires a size")
    bad(t, s"""{"query": {"has_child": {"type": "a", $relOpts,
      "query": {"match_all": {}}, "inner_hits": {"size": 0}}}}""",
      "size must be in [1, 10000]")
    bad(t, s"""{"query": {"has_child": {"type": "a", $relOpts,
      "query": {"match_all": {}}, "inner_hits": {"size": 2,
      "sort": ["x"]}}}}""", "unsupported has_child inner_hits option")
    bad(t, s"""{"query": {"has_parent": {"parent_type": "q", $relOpts,
      "query": {"match_all": {}}, "inner_hits": {"size": 0}}}}""",
      "size must be >= 1")
    // non-integral child id cannot key the bounded heap
    val ts = t.withColumn("doc_id", col("doc_id").cast("string"))
    bad(ts, s"""{"query": {"has_child": {"type": "a", $relOpts,
      "query": {"match_all": {}}, "inner_hits": {"size": 1}}}}""",
      "integral")
    bad(n, """{"query": {"nested": {"path": "items",
      "query": {"match_all": {}}, "inner_hits": {"size": 1}}}}""",
      "requires a non-empty _source")
    bad(n, """{"query": {"nested": {"path": "items",
      "query": {"match_all": {}}, "inner_hits": {"size": 1,
      "_source": ["items.ln"], "highlight": {}}}}}""",
      "unsupported nested inner_hits option")
    // inside a bool tree there is no hit row to attach children to
    bad(n, """{"query": {"bool": {"must": [{"nested": {"path": "items",
      "query": {"match_all": {}}, "inner_hits": {"size": 1,
      "_source": ["items.ln"]}}}]}}}""", "unsupported nested option")
  }

  test("fields/docvalue_fields add typed columns alongside _source") {
    import spark.implicits._
    val t = Seq((1L, "spark", 10L, "en")).toDF("id", "text", "n", "lang")
    val out = QueryDsl.search(t,
      """{"query": {"match_all": {}},
         "docvalue_fields": ["n"], "fields": [{"field": "lang"}],
         "_source": ["id"]}""")
    assert(out.columns.toSeq === Seq("id", "n", "lang"))
    // excluded by _source but re-requested via fields -> comes back
    val out2 = QueryDsl.search(t,
      """{"query": {"match_all": {}},
         "_source": {"excludes": ["lang", "text"]},
         "fields": ["lang"]}""")
    assert(out2.columns.contains("lang") && !out2.columns.contains("text"))
    // no _source projection: the section validates, the hit table
    // already carries every column
    assert(QueryDsl.search(t,
      """{"query": {"match_all": {}}, "fields": ["n"]}""")
      .columns.contains("n"))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"match_all": {}},
           "fields": [{"field": "n", "format": "epoch_millis"}]}""",
      "does not take 'format'")
    bad("""{"query": {"match_all": {}}, "docvalue_fields": ["nope"]}""",
      "unknown column 'nope'")
    bad("""{"query": {"match_all": {}}, "fields": []}""",
      "must be a non-empty array")
    bad("""{"query": {"match_all": {}}, "size": 0,
           "docvalue_fields": ["n"],
           "aggs": {"m": {"max": {"field": "n"}}}}""",
      "applies to hits, not aggs")
  }

  test("explain flag decorates hits with part columns summing to score") {
    val df = QueryDsl.search(docs,
      """{"query": {"bool": {
           "must": [{"match": {"text": "spark"}},
                    {"range": {"n_chars": {"gte": 100}}}],
           "should": [{"term": {"lang": "en"}}]}},
         "explain": true,
         "sort": ["doc_id"], "size": 40}""")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val partCols = df.columns.filter(_.startsWith("part_")).toSeq
    assert(partCols === Seq("part_must_0", "part_must_1", "part_should_0"))
    rows.foreach { r =>
      val s = partCols.map(c => r.getLong(r.fieldIndex(c))).sum
      assert(s === r.getLong(r.fieldIndex("score")),
        s"parts must sum to score on row $r")
    }
    // explain: false is inert
    assert(!QueryDsl.search(docs,
      """{"query": {"match_all": {}}, "explain": false, "size": 1}""")
      .columns.exists(_.startsWith("part_")))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"match_all": {}}, "explain": true, "size": 0,
           "aggs": {"m": {"max": {"field": "n_chars"}}}}""",
      "explain applies to hits, not aggs")
    bad("""{"query": {"match": {"text": "spark"}}, "explain": true,
           "rescore": {"window_size": 5, "query": {"rescore_query":
             {"term": {"lang": "en"}}}}}""",
      "explain cannot be combined with rescore")
    bad("""{"query": {"more_like_this": {"fields": ["text"],
             "like": {"doc_id": 1}}}, "explain": true}""",
      "not supported with request-level queries")
    bad("""{"explain": true}""", "explain requires a query")
    bad("""{"query": {"match_all": {}}, "explain": "yes"}""",
      "explain must be a boolean")
  }

  test("_explain: part columns sum to the hit score, one scan") {
    def sumsToScore(df: org.apache.spark.sql.DataFrame): Unit = {
      val rows = df.collect()
      assert(rows.nonEmpty)
      val partCols = df.columns.filter(_.startsWith("part_")).toSeq
      assert(partCols.nonEmpty)
      rows.foreach { r =>
        val s = partCols.map(c => r.getLong(r.fieldIndex(c))).sum
        assert(s === r.getLong(r.fieldIndex("score")),
          s"parts $partCols must sum to score on row $r")
      }
    }
    // bool: must + should parts
    val ex = QueryDsl.explain(docs,
      """{"query": {"bool": {
           "must": [{"match": {"text": "spark"}}],
           "should": [{"match": {"text": "join"}},
                      {"term": {"lang": "en"}}]}}}""", "doc_id")
    sumsToScore(ex)
    assert(ex.columns.toSeq ===
      Seq("doc_id", "score", "part_must_0", "part_should_0", "part_should_1"))
    // zero extra scans: the decomposition is ONE projection over the
    // same filtered corpus pass
    val scans = ex.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("FileScan"))
    assert(scans === 1, s"expected one FileScan, got $scans")
    // dis_max decomposes in ppm units (tie-broken + best bonus)
    sumsToScore(QueryDsl.explain(docs,
      """{"query": {"dis_max": {"queries": [
           {"match": {"text": "spark"}}, {"match": {"text": "join"}}],
           "tie_breaker": 0.3}}}""", "doc_id"))
    // function_score: query part + what the functions added
    sumsToScore(QueryDsl.explain(docs,
      """{"query": {"function_score": {
           "query": {"match": {"text": "spark"}},
           "functions": [{"filter": {"term": {"lang": "en"}}, "weight": 3}],
           "boost_mode": "multiply"}}}""", "doc_id"))
    // constant_score and leaf fallback
    sumsToScore(QueryDsl.explain(docs,
      """{"query": {"constant_score": {"filter": {"term": {"lang": "en"}},
           "boost": 7}}}""", "doc_id"))
    sumsToScore(QueryDsl.explain(docs,
      """{"query": {"match": {"text": "spark join"}}}""", "doc_id"))
    def bad(body: String, id: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](
        QueryDsl.explain(docs, body, id))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"match_all": {}}, "size": 5}""", "doc_id",
      "takes only a query")
    bad("""{"query": {"match_all": {}}}""", "nope", "is not a column")
    bad("""{}""", "doc_id", "requires a query")
  }

  test("moving_percentiles / percentiles_bucket: exact discrete forms") {
    import spark.implicits._
    val t = Seq((0L, 1L), (0L, 3L), (1L, 5L), (1L, 7L), (2L, 2L),
      (3L, 9L), (4L, 4L), (5L, 6L)).toDF("b", "v")
    // moving_percentiles over a histogram sum series, window 3:
    // sums by bucket 0..5 = 4,12,2,9,4,6; windows (trailing 3):
    // [4] [4,12] [2,4,12] [2,9,12] [2,4,9] [4,6,9]
    val mp = QueryDsl.search(t,
      """{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
           "aggs": {"s": {"sum": {"field": "v"}},
             "mv": {"moving_percentiles": {"buckets_path": "s",
               "window": 3, "percents": [50, 99]}}}}}}""")
      .select("h", "mv_p50", "mv_p99").as[(Long, Long, Long)].collect().toSeq
    assert(mp === Seq((0L, 4L, 4L), (1L, 4L, 12L), (2L, 4L, 12L),
      (3L, 9L, 12L), (4L, 4L, 9L), (5L, 6L, 9L)))
    // _count path + default percents column naming
    val mpc = QueryDsl.search(t,
      """{"aggs": {"h": {"histogram": {"field": "b", "interval": 2},
           "aggs": {"mv": {"moving_percentiles": {"buckets_path": "_count",
             "window": 2}}}}}}""")
    assert(mpc.columns.count(_.startsWith("mv_p")) === 7)
    // percentiles_bucket: sibling over all buckets' sums 4,12,2,9,4,6
    // sorted 2,4,4,6,9,12 → p50 = 3rd = 4, p25 = ceil(1.5)=2nd = 4,
    // p95 = ceil(5.7)=6th = 12
    val pb = QueryDsl.search(t,
      """{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
           "aggs": {"s": {"sum": {"field": "v"}}}},
         "pb": {"percentiles_bucket": {"buckets_path": "h>s",
           "percents": [25, 50, 95]}}}}""")
      .as[(Double, Double, Double)].head()
    assert(pb === ((4.0, 4.0, 12.0)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
      "aggs": {"mv": {"moving_percentiles": {"buckets_path": "_count"}}}}}}""",
      "needs a window")
    bad("""{"aggs": {"h": {"terms": {"field": "b"},
      "aggs": {"mv": {"moving_percentiles": {"buckets_path": "_count",
        "window": 2}}}}}}""", "require a histogram or date_histogram parent")
    bad("""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
      "aggs": {"mv": {"moving_percentiles": {"buckets_path": "_count",
        "window": 2, "percents": [150]}}}}}}""", "percents must be integers")
    bad("""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
      "aggs": {"s": {"sum": {"field": "v"}}}},
      "pb": {"percentiles_bucket": {"buckets_path": "h>nope"}}}}""",
      "names no metric")
  }

  test("normalize: pinned-order rescaling methods; softmax fails loud") {
    import spark.implicits._
    val t = Seq((0L, 2L), (1L, 4L), (2L, 10L)).toDF("b", "v")
    def run(method: String): Seq[Double] = QueryDsl.search(t,
      s"""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
           "aggs": {"s": {"sum": {"field": "v"}},
             "n": {"normalize": {"buckets_path": "s",
               "method": "$method"}}}}}}""")
      .select("n").as[Double].collect().toSeq
    assert(run("percent_of_sum") === Seq(2.0 / 16, 4.0 / 16, 10.0 / 16))
    assert(run("rescale_0_1") === Seq(0.0, 0.25, 1.0))
    assert(run("rescale_0_100") === Seq(0.0, 25.0, 100.0))
    val mean = run("mean") // mean = 16/3; den = 8
    assert(math.abs(mean(1) - (4.0 - 16.0 / 3) / 8.0) < 1e-15)
    val z = run("z-score") // var = (3·120 − 256)/9 = 104/9
    assert(math.abs(z(2) - (10.0 - 16.0 / 3) / math.sqrt(104.0 / 9)) < 1e-12)
    // works under a terms parent too (no key order needed)
    val tp = QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "b"},
           "aggs": {"s": {"sum": {"field": "v"}},
             "n": {"normalize": {"buckets_path": "s",
               "method": "percent_of_sum"}}}}}}""")
      .agg(sum("n")).as[Double].head()
    assert(math.abs(tp - 1.0) < 1e-15)
    // degenerate series: a constant metric (max == min, zero
    // variance) yields a documented NULL, never NaN/Infinity
    val tc = Seq((0L, 5L), (1L, 5L), (2L, 5L)).toDF("b", "v")
    for (m <- Seq("rescale_0_1", "rescale_0_100", "mean", "z-score")) {
      val r = QueryDsl.search(tc,
        s"""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
             "aggs": {"s": {"sum": {"field": "v"}},
               "n": {"normalize": {"buckets_path": "s",
                 "method": "$m"}}}}}}""")
        .select("n").collect().toSeq
      assert(r.forall(_.isNullAt(0)), s"$m on a constant series must be NULL")
    }
    val tz = Seq((0L, 3L), (1L, -3L)).toDF("b", "v")
    val pz = QueryDsl.search(tz,
      """{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
           "aggs": {"s": {"sum": {"field": "v"}},
             "n": {"normalize": {"buckets_path": "s",
               "method": "percent_of_sum"}}}}}}""")
      .select("n").collect().toSeq
    assert(pz.forall(_.isNullAt(0)), "percent_of_sum over a zero sum must be NULL")
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
      "aggs": {"n": {"normalize": {"buckets_path": "_count",
        "method": "softmax"}}}}}}""", "softmax is unsupported")
    bad("""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
      "aggs": {"n": {"normalize": {"buckets_path": "_count",
        "method": "minmax"}}}}}}""", "unsupported normalize method")
    bad("""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
      "aggs": {"n": {"normalize": {"buckets_path": "_count"}}}}}}""",
      "needs a method")
  }

  test("geotile_grid emits real z/x/y web-mercator tile keys") {
    import spark.implicits._
    val pts = Seq((1L, 47.6062, -122.3321), (2L, 47.6062, -122.3321),
      (3L, 57.64911, 10.40744), (4L, 90.0, 180.0), (5L, -90.0, -180.0),
      (6L, 0.0, 0.0)).toDF("id", "lat", "lon")
    def cells(z: Int): Seq[(String, Long)] = QueryDsl.search(pts,
      s"""{"aggs": {"cell": {"geotile_grid":
           {"lat_field": "lat", "lon_field": "lon", "precision": $z}}}}""")
      .as[(String, Long)].collect().toSeq
    // slippy-map known vectors (poles clamp to the mercator domain)
    assert(cells(10).head === (("10/164/357", 2L)))
    assert(cells(10).map(_._1).toSet ===
      Set("10/164/357", "10/541/310", "10/1023/0", "10/0/1023", "10/512/512"))
    assert(cells(3) === Seq(("3/1/2", 2L), ("3/0/7", 1L), ("3/4/2", 1L),
      ("3/4/4", 1L), ("3/7/0", 1L)))
    val capped = QueryDsl.search(pts,
      """{"aggs": {"cell": {"geotile_grid": {"lat_field": "lat",
           "lon_field": "lon", "precision": 1, "size": 1}}}}""")
      .as[(String, Long)].collect().toSeq
    assert(capped === Seq(("1/0/0", 2L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(pts, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"c": {"geotile_grid": {"lat_field": "lat",
      "lon_field": "lon", "precision": 30}}}}""", "precision must be 0-29")
    bad("""{"aggs": {"c": {"geotile_grid": {"lat_field": "lat",
      "lon_field": "lon", "bounds": 1}}}}""", "unsupported geotile_grid option")
    bad("""{"aggs": {"c": {"geotile_grid": {"lat_field": "lat"}}}}""",
      "requires lon_field")
  }

  test("t_test: Welch and pooled t statistics from exact moments") {
    import spark.implicits._
    val t = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 10L),
      ("b", 5L), ("b", 6L), ("b", 7L), ("b", 8L)).toDF("g", "v")
    def run(ty: String): Double = QueryDsl.search(t,
      s"""{"aggs": {"t": {"t_test": {
           "a": {"field": "v", "filter": {"term": {"g": "a"}}},
           "b": {"field": "v", "filter": {"term": {"g": "b"}}},
           "type": "$ty"}}}}""").as[Double].head()
    // hand-computed: ma=4, mb=6.5, va=12.5, vb=5/3
    assert(math.abs(run("heteroscedastic") - -1.4638501094227998) < 1e-12)
    assert(math.abs(run("homoscedastic") - -1.3295400586957762) < 1e-12)
    // default type is Welch; composes under a filter bucket
    val gated = QueryDsl.search(t,
      """{"aggs": {"all": {"filter": {"exists": {"field": "v"}},
           "aggs": {"t": {"t_test": {
             "a": {"field": "v", "filter": {"term": {"g": "a"}}},
             "b": {"field": "v", "filter": {"term": {"g": "b"}}}}}}}}}""")
      .select("t").as[Double].head()
    assert(math.abs(gated - -1.4638501094227998) < 1e-12)
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"t": {"t_test": {"a": {"field": "v"},
      "b": {"field": "v"}, "type": "paired"}}}}""", "'paired' is unsupported")
    bad("""{"aggs": {"t": {"t_test": {"a": {"field": "v"}}}}}""",
      "needs a 'b' arm")
    val d = Seq(("a", 1.5)).toDF("g", "v")
    val e2 = intercept[IllegalArgumentException](QueryDsl.search(d,
      """{"aggs": {"t": {"t_test": {"a": {"field": "v"},
           "b": {"field": "v"}}}}}"""))
    assert(e2.getMessage.contains("requires an integral field"))
  }

  test("diversified_sampler caps per-value docs; children/parent switch sides") {
    import spark.implicits._
    val t = Seq((1L, "x", 10L), (2L, "x", 20L), (3L, "x", 30L),
      (4L, "y", 40L), (5L, "y", 50L)).toDF("id", "k", "v")
    // cap 2 per k ordered by id asc: keeps ids 1,2 (x) and 4,5 (y)
    val ds = QueryDsl.search(t,
      """{"aggs": {"s": {"diversified_sampler": {"field": "k",
           "id_field": "id", "max_docs_per_value": 2},
           "aggs": {"sv": {"sum": {"field": "v"}}}}}}""")
      .as[(Long, Long)].head()
    assert(ds === ((4L, 120L)))
    // default cap 1: ids 1 and 4
    assert(QueryDsl.search(t,
      """{"aggs": {"s": {"diversified_sampler": {"field": "k",
           "id_field": "id"},
           "aggs": {"sv": {"sum": {"field": "v"}}}}}}""")
      .as[(Long, Long)].head() === ((2L, 50L)))
    // children/parent: relations-model agg arm
    val rel = Seq(
      ("q", 1L, Option.empty[Long], 0L), ("q", 2L, Option.empty[Long], 0L),
      ("a", 10L, Some(1L), 5L), ("a", 11L, Some(1L), 7L),
      ("a", 12L, Some(2L), 9L)).toDF("rel", "doc_id", "parent_id", "score_v")
    val relOpts = """"join_field": "rel", "id_field": "doc_id",
      "parent_field": "parent_id""""
    // hits = parent doc 1 only → its 2 children, sum 12
    val ch = QueryDsl.search(rel,
      s"""{"query": {"ids": {"field": "doc_id", "values": [1]}},
         "aggs": {"c": {"children": {"type": "a", $relOpts},
           "aggs": {"sv": {"sum": {"field": "score_v"}}}}}}""")
      .as[(Long, Long)].head()
    assert(ch === ((2L, 12L)))
    // hits = children 10 and 12 → their DISTINCT parents 1 and 2
    val pa = QueryDsl.search(rel,
      s"""{"query": {"ids": {"field": "doc_id", "values": [10, 12]}},
         "aggs": {"p": {"parent": {$relOpts},
           "aggs": {"n": {"value_count": {"field": "doc_id"}}}}}}""")
      .as[(Long, Long)].head()
    assert(pa === ((2L, 2L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(rel, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"s": {"diversified_sampler": {"field": "rel",
      "max_docs_per_value": 2}}}}""", "requires id_field")
    bad(s"""{"aggs": {"c": {"children": {$relOpts}}}}""",
      "children needs the child 'type'")
    bad(s"""{"aggs": {"p": {"parent": {"type": "a", $relOpts}}}}""",
      "unsupported parent option 'type'")
  }

  test("geo_distance agg buckets rings around the origin, one pass") {
    import spark.implicits._
    // ~111.19 km per degree of latitude at lon 0
    val pts = Seq((1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 1.5, 0.0),
      (4L, 3.0, 0.0), (5L, Double.NaN, 0.0)).toDF("id", "lat", "lon")
      .withColumn("lat", when(isnan(col("lat")), lit(null)).otherwise(col("lat")))
    val rings = QueryDsl.search(pts,
      """{"aggs": {"ring": {"geo_distance": {
           "lat_field": "lat", "lon_field": "lon",
           "origin": {"lat": 0.0, "lon": 0.0},
           "ranges": [{"to": 200}, {"from": 200, "to": 400}, {"from": 400}]},
           "aggs": {"min_id": {"min": {"field": "id"}}}}}}""")
      .as[(String, Long, Option[Long])].collect().toSeq
    // counts include the NULL-coordinate omission; request order kept
    assert(rings.map(r => (r._1, r._2)) ===
      Seq(("*-200.0", 3L), ("200.0-400.0", 1L), ("400.0-*", 0L)))
    assert(rings(0)._3 === Some(1L) && rings(1)._3 === Some(4L) &&
      rings(2)._3 === None)
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(pts, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"r": {"geo_distance": {"lat_field": "lat",
      "lon_field": "lon", "origin": {"lat": 0}, "ranges": [{"to": 1}]}}}}""",
      "origin requires lon")
    bad("""{"aggs": {"r": {"geo_distance": {"lat_field": "lat",
      "lon_field": "lon", "origin": {"lat": 0, "lon": 0},
      "ranges": [{}]}}}}""", "unbounded range")
    bad("""{"aggs": {"r": {"geo_distance": {"lat_field": "lat",
      "lon_field": "lon", "origin": {"lat": 0, "lon": 0}, "unit": "mi",
      "ranges": [{"to": 1}]}}}}""", "unsupported geo_distance-agg option")
  }

  test("moving_fn compiles the MovingFunctions whitelist; shift moves the window") {
    import spark.implicits._
    val t = Seq((0L, 4L), (1L, 12L), (2L, 2L), (3L, 9L)).toDF("b", "v")
    def run(script: String, shift: Int): Seq[Option[Long]] = QueryDsl.search(t,
      s"""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
           "aggs": {"s": {"sum": {"field": "v"}},
             "m": {"moving_fn": {"buckets_path": "s", "window": 2,
               "script": "$script", "shift": $shift}}}}}}""")
      .select("m").as[Option[Long]].collect().toSeq
    // sums 4,12,2,9; shift 0 window = prev 2 buckets (current excluded)
    assert(run("MovingFunctions.max(values)", 0) ===
      Seq(None, Some(4L), Some(12L), Some(12L)))
    assert(run("MovingFunctions.sum(values)", 0) ===
      Seq(None, Some(4L), Some(16L), Some(14L)))
    // shift 1 includes the current bucket (the moving_avg frame)
    assert(run("MovingFunctions.min(values)", 1) ===
      Seq(Some(4L), Some(4L), Some(2L), Some(2L)))
    val avg = QueryDsl.search(t,
      """{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
           "aggs": {"s": {"sum": {"field": "v"}},
             "m": {"moving_fn": {"buckets_path": "s", "window": 2,
               "script": "MovingFunctions.unweightedAvg(values)",
               "shift": 1}}}}}}""")
      .select("m").as[Double].collect().toSeq
    assert(avg === Seq(4.0, 8.0, 7.0, 5.5))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
      "aggs": {"m": {"moving_fn": {"buckets_path": "_count", "window": 2,
        "script": "MovingFunctions.stdDev(values)"}}}}}}""",
      "unsupported moving_fn script")
    bad("""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
      "aggs": {"m": {"moving_fn": {"buckets_path": "_count",
        "script": "MovingFunctions.max(values)"}}}}}}""", "needs a window")
    bad("""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
      "aggs": {"m": {"moving_fn": {"buckets_path": "_count", "window": 2,
        "script": "MovingFunctions.max(values)", "shift": 5}}}}}}""",
      "shift must be in [0, window]")
  }

  test("cumulative_cardinality counts distinct-seen-so-far exactly") {
    import spark.implicits._
    val t = Seq((0L, "u1"), (0L, "u2"), (1L, "u1"), (1L, "u3"),
      (2L, "u2"), (3L, "u4"), (3L, "u4")).toDF("b", "u")
    // distinct-so-far: {u1,u2}=2, +u3=3, +0=3, +u4=4
    val cc = QueryDsl.search(t,
      """{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
           "aggs": {"cc": {"cumulative_cardinality": {"field": "u"}}}}}}""")
      .orderBy("h")
      .select("h", "doc_count", "cc").as[(Long, Long, Long)].collect().toSeq
    assert(cc === Seq((0L, 2L, 2L), (1L, 2L, 3L), (2L, 1L, 3L),
      (3L, 2L, 4L)))
    // NULL values are omitted; composes beside a plain metric
    val tn = t.union(Seq((2L, Option.empty[String])).toDF("b", "u"))
    val both = QueryDsl.search(tn,
      """{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
           "aggs": {"n": {"value_count": {"field": "u"}},
             "cc": {"cumulative_cardinality": {"field": "u"}}}}}}""")
      .orderBy("h")
      .select("h", "n", "cc").as[(Long, Long, Long)].collect().toSeq
    assert(both === Seq((0L, 2L, 2L), (1L, 2L, 3L), (2L, 1L, 3L),
      (3L, 2L, 4L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"g": {"terms": {"field": "u"},
      "aggs": {"cc": {"cumulative_cardinality": {"field": "u"}}}}}}""",
      "requires a histogram or date_histogram parent")
    bad("""{"aggs": {"h": {"histogram": {"field": "b", "interval": 1},
      "aggs": {"cc": {"cumulative_cardinality": {"field": "u",
        "precision_threshold": 100}}}}}}""",
      "unsupported cumulative_cardinality option")
  }

  test("terms min_doc_count floors buckets before order and size") {
    import spark.implicits._
    val t = Seq("a", "a", "a", "b", "c", "c").toDF("k")
    val floored = QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "k", "min_doc_count": 2}}}}""")
      .as[(String, Long)].collect().toSeq
    assert(floored === Seq(("a", 3L), ("c", 2L)))
    // the floor applies BEFORE size (OpenSearch evaluation order)
    val sized = QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "k", "min_doc_count": 2,
           "size": 1}}}}""").as[(String, Long)].collect().toSeq
    assert(sized === Seq(("a", 3L)))
    // composes with include gates (map-side) and sub-metrics
    val both = QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "k", "min_doc_count": 2,
           "exclude": ["a"]}}}}""").as[(String, Long)].collect().toSeq
    assert(both === Seq(("c", 2L)))
    // 0 is the dictionary-driven dense form now (r14 — TermsDictSpec);
    // negatives stay loud
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "k", "min_doc_count": -2}}}}"""))
    assert(e.getMessage.contains("min_doc_count must be >= 0"))
  }

  test("extended_stats_bucket: exact moments over the bucket series") {
    import spark.implicits._
    val t = Seq(0L, 0L, 1L, 2L, 2L, 2L).toDF("b")
    // counts by bucket: 2,1,3 → n=3 min=1 max=3 sum=6 avg=2 q=14
    // var=(3·14−36)/9=2/3
    val r = QueryDsl.search(t,
      """{"aggs": {"h": {"histogram": {"field": "b", "interval": 1}},
         "st": {"extended_stats_bucket": {"buckets_path": "h>_count"}}}}""")
      .collect().head
    assert(r.getAs[Long]("st_count") === 3L)
    assert(r.getAs[Long]("st_min") === 1L && r.getAs[Long]("st_max") === 3L)
    assert(r.getAs[Double]("st_avg") === 2.0)
    assert(r.getAs[Long]("st_sum") === 6L)
    assert(r.getAs[Long]("st_sum_of_squares") === 14L)
    assert(r.getAs[Double]("st_variance") === 6.0 / 9.0)
    assert(r.getAs[Double]("st_std_deviation") === math.sqrt(6.0 / 9.0))
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"aggs": {"h": {"histogram": {"field": "b", "interval": 1}},
         "st": {"extended_stats_bucket": {"buckets_path": "h>_count",
           "sigma": 2}}}}"""))
    assert(e.getMessage.contains("unsupported extended_stats_bucket option"))
  }

  test("variable_width_histogram: equal-frequency buckets from exact quantiles") {
    import spark.implicits._
    val t = (1L to 10L).toDF("v")
    val vw = QueryDsl.search(t,
      """{"aggs": {"len": {"variable_width_histogram":
           {"field": "v", "buckets": 2}}}}""")
      .as[(Double, Long, Long, Long)].collect().toSeq
    assert(vw === Seq((3.0, 1L, 5L, 5L), (8.0, 6L, 10L, 5L)))
    // sub-metrics ride the same groupBy; NULL values are omitted
    val tn = t.union(Seq(Option.empty[Long]).toDF("v"))
    val sub = QueryDsl.search(tn,
      """{"aggs": {"len": {"variable_width_histogram":
           {"field": "v", "buckets": 5},
           "aggs": {"s": {"sum": {"field": "v"}}}}}}""")
    assert(sub.agg(sum("doc_count"), sum("s")).as[(Long, Long)].head() ===
      ((10L, 55L)))
    assert(sub.count() === 5)
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"x": {"variable_width_histogram": {"field": "v",
      "buckets": 1}}}}""", "buckets must be 2-1000")
    bad("""{"aggs": {"x": {"variable_width_histogram": {"field": "v",
      "buckets": 2, "initial_buffer": 10}}}}""",
      "unsupported variable_width_histogram option")
    bad("""{"aggs": {"x": {"variable_width_histogram":
      {"buckets": 2}}}}""", "needs a field")
    // empty input → zero buckets, schema intact
    val empty = QueryDsl.search(t.filter(col("v") > 100),
      """{"aggs": {"len": {"variable_width_histogram":
           {"field": "v", "buckets": 3}}}}""")
    assert(empty.count() === 0)
  }

  test("runtime_mappings: computed fields visible to query, aggs and sort") {
    import spark.implicits._
    val t = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    val rm = """"runtime_mappings": {"w": {"type": "long",
      "script": {"source": "doc['v'].value * 2 + params.k",
        "params": {"k": 5}}}}"""
    // query + sort + _source all see the runtime field
    val hits = QueryDsl.search(t,
      s"""{$rm, "query": {"range": {"w": {"gte": 45}}},
          "sort": [{"w": "desc"}], "_source": ["id", "w"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(hits === Seq((3L, 65L), (2L, 45L)))
    // aggs see it too
    val agg = QueryDsl.search(t,
      s"""{$rm, "aggs": {"mx": {"max": {"field": "w"}},
          "s": {"sum": {"field": "w"}}}}""")
      .as[(Long, Long)].head()
    assert(agg === ((65L, 135L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"runtime_mappings": {"v": {"type": "long",
      "script": {"source": "doc['v'].value"}}}}""", "collides")
    bad("""{"runtime_mappings": {"w": {"type": "double",
      "script": {"source": "doc['v'].value"}}}}""", "type must be 'long'")
    bad("""{"runtime_mappings": {"w": {"type": "long",
      "script": {"source": "_score * 2"}}}}""", "cannot reference _score")
    bad("""{"runtime_mappings": {"w": {"type": "long"}}}""",
      "needs {script: {source}}")
    bad("""{"runtime_mappings": {}}""", "at least one field")
  }

  test("rate normalizes bucket aggregates by the calendar span") {
    import spark.implicits._
    // months of different lengths: Jan 2021 (31 d), Feb 2021 (28 d)
    val t = Seq(("2021-01-10 00:00:00", 62L), ("2021-01-20 00:00:00", 0L),
        ("2021-02-10 00:00:00", 56L)).toDF("ts0", "v")
      .select(to_timestamp(col("ts0")).as("ts"), col("v"))
    val r = QueryDsl.search(t,
      """{"aggs": {"mon": {"date_histogram": {"field": "ts",
           "calendar_interval": "month"},
         "aggs": {"daily": {"rate": {"field": "v", "unit": "day"}},
                  "docs_daily": {"rate": {"unit": "day"}},
                  "vcount_daily": {"rate": {"field": "v",
                    "mode": "value_count", "unit": "day"}},
                  "monthly": {"rate": {"field": "v"}}}}}}""")
      .orderBy(col("mon"))
      .select("daily", "docs_daily", "vcount_daily", "monthly")
      .as[(Double, Double, Double, Double)].collect().toSeq
    // Jan: sum 62 / 31 d; Feb: 56 / 28 d — both exactly 2.0/day
    assert(r === Seq((2.0, 2.0 / 31, 2.0 / 31, 62.0),
                     (2.0, 1.0 / 28, 1.0 / 28, 56.0)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    // unit coarser than the bucket
    bad("""{"aggs": {"d": {"date_histogram": {"field": "ts",
      "calendar_interval": "day"},
      "aggs": {"r": {"rate": {"unit": "month"}}}}}}""",
      "exceeds the date_histogram interval")
    bad("""{"aggs": {"d": {"date_histogram": {"field": "ts",
      "fixed_interval": "1d"},
      "aggs": {"r": {"rate": {"unit": "hour"}}}}}}""",
      "requires a calendar_interval parent")
    bad("""{"aggs": {"d": {"date_histogram": {"field": "ts",
      "calendar_interval": "day", "time_zone": "+02:00"},
      "aggs": {"r": {"rate": {"unit": "hour"}}}}}}""",
      "does not compose with time_zone")
    bad("""{"aggs": {"g": {"terms": {"field": "v"},
      "aggs": {"r": {"rate": {"unit": "day"}}}}}}""",
      "requires a date_histogram parent")
    bad("""{"aggs": {"d": {"date_histogram": {"field": "ts",
      "calendar_interval": "month"},
      "aggs": {"r": {"rate": {"mode": "value_count"}}}}}}""",
      "mode requires a field")
    bad("""{"aggs": {"d": {"date_histogram": {"field": "ts",
      "calendar_interval": "month"},
      "aggs": {"r": {"rate": {"unit": "week"}}}}}}""",
      "unsupported unit 'week'")
    bad("""{"aggs": {"d": {"date_histogram": {"field": "ts",
      "calendar_interval": "month"},
      "aggs": {"r": {"rate": {"field": "v", "script": "x"}}}}}}""",
      "unsupported rate option")
    // fractional fields break the exact sum model
    val tf = t.withColumn("vf", col("v").cast("double"))
    bad("""{"aggs": {"d": {"date_histogram": {"field": "ts",
      "calendar_interval": "month"},
      "aggs": {"r": {"rate": {"field": "v", "mode": "bad"}}}}}}""",
      "rate mode must be")
    val ef = intercept[IllegalArgumentException](QueryDsl.search(tf,
      """{"aggs": {"d": {"date_histogram": {"field": "ts",
        "calendar_interval": "month"},
        "aggs": {"r": {"rate": {"field": "vf"}}}}}}"""))
    assert(ef.getMessage.contains("requires an integral field"))
  }

  test("date_histogram transitions time_zone buckets by the local calendar") {
    import spark.implicits._
    // base +01:00 from Jun 1; spring-forward to +02:00 at 2021-06-10
    // 01:00 UTC (local activation 03:00); fall-back to +01:00 at
    // 2021-06-20 01:00 UTC (local activation 02:00)
    val tz = """{"transitions": [
        ["2021-06-01T00:00:00", 60],
        ["2021-06-10T01:00:00", 120],
        ["2021-06-20T01:00:00", 60]]}"""
    val t = Seq(
      "2021-06-09 23:30:00", // +60: local Jun 10 00:30 — day Jun 10
      "2021-06-10 00:30:00", // +60: local 01:30 — day Jun 10 (pre-switch)
      "2021-06-10 02:00:00", // +120: local 04:00 — SAME local day Jun 10
      "2021-06-10 21:50:00", // +120: local 23:50 — still Jun 10
      "2021-06-10 22:10:00", // +120: local Jun 11 00:10 — day Jun 11
      "2021-06-20 00:30:00", // +120: local 02:30 — day Jun 20 (pre-switch)
      "2021-06-20 01:30:00"  // +60: local 02:30 again (fall-back) — Jun 20
    ).zipWithIndex.map { case (s0, i) => (i.toLong, s0) }.toDF("id", "ts0")
      .select(col("id"), to_timestamp(col("ts0")).as("ts"))
    val got = QueryDsl.search(t,
      s"""{"aggs": {"day": {"date_histogram": {"field": "ts",
            "calendar_interval": "day", "time_zone": $tz}}}}""")
      .orderBy("day").as[(java.sql.Timestamp, Long)].collect().toSeq
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0)
    // Jun 10 local day is ONE bucket spanning the transition; its key
    // is local midnight mapped with the boundary's own (+60) offset.
    // Jun 11's boundary is post-switch: key = Jun 10 22:00 UTC.
    // Jun 20's boundary is pre-fall-back: key = Jun 19 22:00 UTC.
    assert(got === Seq(
      (ts("2021-06-09 23:00:00"), 4L),
      (ts("2021-06-10 22:00:00"), 1L),
      (ts("2021-06-19 22:00:00"), 2L)))
    // fixed_interval runs the same local-truncate/boundary-unmap rule
    val fx = QueryDsl.search(t,
      s"""{"aggs": {"d": {"date_histogram": {"field": "ts",
            "fixed_interval": "1d", "time_zone": $tz}}}}""")
      .orderBy("d").as[(java.sql.Timestamp, Long)].collect().toSeq
    assert(fx === Seq(
      (ts("2021-06-09 23:00:00"), 4L),
      (ts("2021-06-10 22:00:00"), 1L),
      (ts("2021-06-19 22:00:00"), 2L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    def dh(tzJson: String, extra: String = ""): String =
      s"""{"aggs": {"d": {"date_histogram": {"field": "ts",
          "calendar_interval": "day", "time_zone": $tzJson$extra}}}}"""
    bad(dh("\"Europe/Nowhere\""), "nor a known IANA zone id")
    bad(dh("""{"transitions": []}"""), "non-empty transitions array")
    bad(dh("""{"transitions": [["2021-06-10T01:00:00", 60],
          ["2021-06-01T00:00:00", 120]]}"""), "strictly ascending")
    bad(dh("""{"transitions": [["2021-06-01T00:00:00", 60, 9]]}"""),
      "must be [iso_utc_string, offset_minutes]")
    bad(dh("""{"transitions": [["2021-06-01T00:00:00", 2000]]}"""),
      "out of range")
    bad(dh("""{"rules": "x"}"""), "unsupported time_zone option")
    bad(dh("42"), "fixed offset, an IANA zone id, or a transitions object")
    // min_doc_count: 0 composes with the transition table: the dense
    // series walks local days across both offset switches — 11 local
    // days Jun 10..Jun 20, the 8 empty ones filled with doc_count 0
    val dense = QueryDsl.search(t,
      s"""{"aggs": {"d": {"date_histogram": {"field": "ts",
            "fixed_interval": "1d", "min_doc_count": 0,
            "time_zone": $tz}}}}""")
      .orderBy("d").as[(java.sql.Timestamp, Long)].collect().toSeq
    assert(dense.size === 11)
    assert(dense.head === ((ts("2021-06-09 23:00:00"), 4L)))
    assert(dense(1) === ((ts("2021-06-10 22:00:00"), 1L)))
    assert(dense.last === ((ts("2021-06-19 22:00:00"), 2L)))
    assert(dense.count(_._2 == 0L) === 8)
  }

  test("date_histogram named IANA time_zone resolves to the JVM rules") {
    import spark.implicits._
    // zoneTransitionTable pins to the tzdb directly: Europe/Berlin
    // over [2021-06-01Z, 2021-12-31Z] — base at lo-400d (2020-04-27,
    // CEST +2h) then the real transitions, each as literal micros
    def us(epochSec: Long) = epochSec * 1000000L
    val tab = QueryDsl.zoneTransitionTable(
      java.time.ZoneId.of("Europe/Berlin"),
      java.time.Instant.ofEpochSecond(1622505600L),  // 2021-06-01T00:00Z
      java.time.Instant.ofEpochSecond(1640908800L))  // 2021-12-31T00:00Z
    assert(tab === Seq(
      (us(1587945600L), 7200000000L),  // base 2020-04-27T00:00Z, CEST
      (us(1603587600L), 3600000000L),  // 2020-10-25T01:00Z -> CET
      (us(1616893200L), 7200000000L),  // 2021-03-28T01:00Z -> CEST
      (us(1635642000L), 3600000000L))) // 2021-10-31T01:00Z -> CET
    // a fixed-offset "zone" has no transitions: single base entry
    val fixedTab = QueryDsl.zoneTransitionTable(
      java.time.ZoneId.of("UTC"),
      java.time.Instant.ofEpochSecond(1622505600L),
      java.time.Instant.ofEpochSecond(1640908800L))
    assert(fixedTab === Seq((us(1587945600L), 0L)))
    // end-to-end: the named zone buckets EXACTLY like the equivalent
    // hand-written transition table — the spring-forward local day
    // (Berlin, 2021-03-28) is ONE bucket keyed at pre-switch local
    // midnight, the next day's key uses the post-switch offset
    val t = Seq(
      "2021-03-27 12:00:00", // +60: local 13:00 — day Mar 27
      "2021-03-28 00:30:00", // +60 pre-switch: local 01:30 — Mar 28
      "2021-03-28 01:30:00", // +120: local 03:30 — SAME day Mar 28
      "2021-03-28 22:30:00"  // +120: local Mar 29 00:30 — Mar 29
    ).zipWithIndex.map { case (s0, i) => (i.toLong, s0) }.toDF("id", "ts0")
      .select(col("id"), to_timestamp(col("ts0")).as("ts"))
    val got = QueryDsl.search(t,
      """{"aggs": {"day": {"date_histogram": {"field": "ts",
          "calendar_interval": "day", "time_zone": "Europe/Berlin"}}}}""")
      .orderBy("day").as[(java.sql.Timestamp, Long)].collect().toSeq
    def ts(s0: String) = java.sql.Timestamp.valueOf(s0)
    assert(got === Seq(
      (ts("2021-03-26 23:00:00"), 1L),
      (ts("2021-03-27 23:00:00"), 2L),
      (ts("2021-03-28 22:00:00"), 1L)))
    // named zone + min_doc_count: 0 composes (the Kibana-default
    // shape): the gap-free span yields the same three buckets dense
    val dense = QueryDsl.search(t,
      """{"aggs": {"d": {"date_histogram": {"field": "ts",
          "fixed_interval": "1d", "min_doc_count": 0,
          "time_zone": "Europe/Berlin"}}}}""")
      .orderBy("d").as[(java.sql.Timestamp, Long)].collect().toSeq
    assert(dense === got)
  }

  test("sort missing and mode options reshape the sort key") {
    import spark.implicits._
    val t = Seq(
      (1L, Seq(5L, 1L, 9L), Option("b")),
      (2L, Seq(4L, 4L), Option.empty[String]),
      (3L, Seq(2L, 8L, 2L, 7L), Option("a"))).toDF("id", "vals", "tag")
    def ids(json: String): Seq[Long] =
      QueryDsl.search(t, json).select("id").as[Long].collect().toSeq
    // mode min: 1, 2, 4 asc -> 1,3,2 ; mode max: 9,4,8 desc -> 1,3,2
    assert(ids("""{"sort": [{"vals": {"mode": "min"}}, "id"]}""")
      === Seq(1L, 3L, 2L))
    assert(ids("""{"sort": [{"vals": {"mode": "max", "order": "desc"}},
      "id"]}""") === Seq(1L, 3L, 2L))
    // mode sum: 15, 8, 19 asc -> 2,1,3
    assert(ids("""{"sort": [{"vals": {"mode": "sum"}}, "id"]}""")
      === Seq(2L, 1L, 3L))
    // mode median (exact lower): [1,5,9]->5, [4,4]->4, [2,2,7,8]->2
    assert(ids("""{"sort": [{"vals": {"mode": "median"}}, "id"]}""")
      === Seq(3L, 2L, 1L))
    // missing places the NULL tag explicitly at either end
    assert(ids("""{"sort": [{"tag": {"missing": "_first"}}, "id"]}""")
      === Seq(2L, 3L, 1L))
    assert(ids("""{"sort": [{"tag": {"missing": "_last"}}, "id"]}""")
      === Seq(3L, 1L, 2L))
    assert(ids("""{"sort": [{"tag": {"order": "desc", "missing": "_first"}},
      "id"]}""") === Seq(2L, 1L, 3L))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"sort": [{"vals": {"mode": "avg"}}]}""", "mode 'avg' is fractional")
    bad("""{"sort": [{"vals": {"mode": "product"}}]}""",
      "mode must be min|max|sum|median")
    bad("""{"sort": [{"tag": {"missing": "zzz"}}]}""",
      "missing must be '_first' or '_last'")
    bad("""{"sort": [{"tag": {"missing": "_last", "unmapped_type": "long"}}]}""",
      "unsupported sort option")
    // orderBy-only: a keyset cursor over a reshaped key has no resume
    // semantics
    bad("""{"sort": [{"tag": {"missing": "_last"}}, "id"],
      "search_after": ["a", 1]}""", "orderBy-only")
  }

  test("rescore re-ranks the top window only; the rest keep their score") {
    import spark.implicits._
    // match scoring: one point per matched query term
    val t = Seq(
      (1L, "alpha beta gamma", "x"),
      (2L, "alpha beta", "y"),
      (3L, "alpha", "y"),
      (4L, "delta", "y")).toDF("id", "text", "tag")
    val req = """{"query": {"match": {"text": "alpha beta gamma"}},
      "rescore": {"window_size": 2, "id_field": "id",
        "query": {"rescore_query": {"term": {"tag": "y"}},
          "query_weight": 1, "rescore_query_weight": 10,
          "score_mode": "total"}},
      "sort": [{"_score": "desc"}, "id"], "_source": ["id", "score"]}"""
    // orig scores: 3,2,1 (doc 4 unmatched). window=2 -> docs 1,2.
    // doc 2 matches tag=y: 2+10=12; doc 1 doesn't: 3. doc 3 outside:
    // untouched 1. Final order: 2(12), 1(3), 3(1).
    val hits = QueryDsl.search(t, req)
    assert(hits.columns.toSeq === Seq("id", "score"))
    assert(hits.as[(Long, Long)].collect().toSeq ===
      Seq((2L, 12L), (1L, 3L), (3L, 1L)))
    // score modes over the same window
    def scores(mode: String): Seq[(Long, Long)] = QueryDsl.search(t,
      req.replace("\"total\"", s""""$mode"""")).as[(Long, Long)]
      .collect().toSeq
    assert(scores("multiply") === Seq((2L, 20L), (1L, 3L), (3L, 1L)))
    assert(scores("max") === Seq((2L, 10L), (1L, 3L), (3L, 1L)))
    assert(scores("min").toSet === Set((2L, 2L), (1L, 3L), (3L, 1L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad(req.replace("\"total\"", "\"avg\""), "score_mode avg is fractional")
    bad("""{"query": {"match_all": {}}, "rescore": {"window_size": 2,
      "query": {"rescore_query": {"term": {"tag": "y"}}}}}""",
      "requires id_field")
    bad("""{"query": {"match_all": {}}, "rescore": {"window_size": 0,
      "id_field": "id", "query": {"rescore_query": {"term": {"tag": "y"}}}}}""",
      "window_size must be")
    bad("""{"query": {"match_all": {}}, "rescore": {"id_field": "id"}}""",
      "requires query")
    bad("""{"query": {"match_all": {}}, "rescore": {"id_field": "id",
      "rescorer": 1, "query": {"rescore_query": {"term": {"tag": "y"}}}}}""",
      "unsupported rescore option")
    bad("""{"query": {"match_all": {}},
      "aggs": {"n": {"value_count": {"field": "id"}}},
      "rescore": {"id_field": "id",
        "query": {"rescore_query": {"term": {"tag": "y"}}}}}""",
      "rescore applies to hits")
  }

  test("span_or/span_not/span_containing/span_within positional semantics") {
    import spark.implicits._
    val t = Seq(
      (1L, "big apple pie and small apple tart"),
      (2L, "apple orchard big harvest"),
      (3L, "banana bread"),
      (4L, "big apple apple pie")).toDF("id", "text")
    def run(json: String): Map[Long, Long] =
      QueryDsl.search(t, json).select("id", "n_spans").as[(Long, Long)]
        .collect().toMap
    // span_or: postings union
    assert(run("""{"query": {"span_or": {"clauses": [
        {"span_term": {"text": "apple"}}, {"span_term": {"text": "banana"}}],
        "id_field": "id"}}}""") ===
      Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // span_not: apple NOT preceded (pre 1) by big
    assert(run("""{"query": {"span_not": {
        "include": {"span_term": {"text": "apple"}},
        "exclude": {"span_term": {"text": "big"}},
        "pre": 1, "id_field": "id"}}}""") ===
      Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
    // dist sets both sides: apple with no big within +-2
    assert(run("""{"query": {"span_not": {
        "include": {"span_term": {"text": "apple"}},
        "exclude": {"span_term": {"text": "big"}},
        "dist": 2, "id_field": "id"}}}""") ===
      Map(1L -> 1L))
    // containing dedups big spans; within counts little positions
    val big = """"big": {"span_near": {"clauses": [
      {"span_term": {"text": "big"}}, {"span_term": {"text": "pie"}}],
      "slop": 3, "in_order": true}},
      "little": {"span_term": {"text": "apple"}}, "id_field": "id""""
    assert(run(s"""{"query": {"span_containing": {$big}}}""") ===
      Map(1L -> 1L, 4L -> 1L))
    assert(run(s"""{"query": {"span_within": {$big}}}""") ===
      Map(1L -> 1L, 4L -> 2L))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"span_or": {"clauses": [
      {"span_term": {"text": "a"}}], "id_field": "id"}}}""",
      ">= 2 clauses")
    bad("""{"query": {"span_or": {"clauses": [
      {"span_term": {"text": "a"}}, {"span_term": {"id": "b"}}],
      "id_field": "id"}}}""", "same field")
    bad("""{"query": {"span_not": {
      "include": {"span_term": {"text": "a"}},
      "exclude": {"span_term": {"text": "b"}},
      "dist": 1, "pre": 1, "id_field": "id"}}}""", "dist replaces pre/post")
    bad("""{"query": {"span_not": {
      "include": {"span_term": {"text": "a"}}, "id_field": "id"}}}""",
      "requires exclude")
    bad(s"""{"query": {"span_containing": {$big}},
      "aggs": {"n": {"value_count": {"field": "id"}}}}""",
      "cannot be combined with span_containing")
    bad("""{"query": {"bool": {"must": [{"span_or": {"clauses": [],
      "id_field": "id"}}]}}}""", "request-level query")
  }

  test("span_multi wraps multi-term queries as span clauses") {
    import spark.implicits._
    val t = Seq(
      (1L, "applet apple apply banana"),
      (2L, "application big apple"),
      (3L, "banana bread"),
      (4L, "APPLE pie")).toDF("id", "text")
    def run(json: String): Map[Long, Long] =
      QueryDsl.search(t, json).select("id", "n_spans").as[(Long, Long)]
        .collect().toMap
    // standalone: every token position matching the prefix
    assert(run("""{"query": {"span_multi": {
        "match": {"prefix": {"text": {"value": "appl"}}},
        "id_field": "id"}}}""") ===
      Map(1L -> 3L, 2L -> 2L))
    // case_insensitive rides the term-level option
    assert(run("""{"query": {"span_multi": {
        "match": {"prefix": {"text": {"value": "apple", "case_insensitive": true}}},
        "id_field": "id"}}}""") ===
      Map(1L -> 2L, 2L -> 1L, 4L -> 1L))
    // wildcard and regexp predicates match whole tokens
    assert(run("""{"query": {"span_multi": {
        "match": {"wildcard": {"text": {"value": "app*y"}}},
        "id_field": "id"}}}""") === Map(1L -> 1L))
    assert(run("""{"query": {"span_multi": {
        "match": {"regexp": {"text": {"value": "appl(et|e)"}}},
        "id_field": "id"}}}""") === Map(1L -> 2L, 2L -> 1L))
    // fuzzy: one edit away from "apple" (apple, applet, apply)
    assert(run("""{"query": {"span_multi": {
        "match": {"fuzzy": {"text": {"value": "apple", "fuzziness": 1}}},
        "id_field": "id"}}}""") ===
      Map(1L -> 3L, 2L -> 1L))
    // prefix_length bounds the fuzzy candidates: "banana" stays out
    assert(run("""{"query": {"span_multi": {
        "match": {"fuzzy": {"text": {"value": "apple", "fuzziness": 2,
          "prefix_length": 3}}},
        "id_field": "id"}}}""") ===
      Map(1L -> 3L, 2L -> 1L))
    // inside span_near: prefix clause + exact term, ordered
    val near = QueryDsl.search(t,
      """{"query": {"span_near": {"clauses": [
          {"span_multi": {"match": {"prefix": {"text": {"value": "appl"}}}}},
          {"span_term": {"text": "banana"}}],
          "slop": 1, "in_order": true, "id_field": "id"}},
         "_source": ["id", "n_pairs", "min_gap"]}""")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(near === Map(1L -> ((2L, 0L))))
    // two IDENTICAL span_multi clauses pair distinct positions once
    val selfPair = QueryDsl.search(t,
      """{"query": {"span_near": {"clauses": [
          {"span_multi": {"match": {"prefix": {"text": {"value": "appl"}}}}},
          {"span_multi": {"match": {"prefix": {"text": {"value": "appl"}}}}}],
          "slop": 0, "in_order": false, "id_field": "id"}},
         "_source": ["id", "n_pairs"]}""")
      .as[(Long, Long)].collect().toMap
    assert(selfPair === Map(1L -> 2L))
    // inside span_or, mixed with span_term
    assert(run("""{"query": {"span_or": {"clauses": [
        {"span_multi": {"match": {"prefix": {"text": {"value": "appl"}}}}},
        {"span_term": {"text": "banana"}}],
        "id_field": "id"}}}""") ===
      Map(1L -> 4L, 2L -> 2L, 3L -> 1L))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"span_multi": {
      "match": {"range": {"id": {"gte": 1}}}, "id_field": "id"}}}""",
      "prefix, wildcard, fuzzy and regexp")
    bad("""{"query": {"span_multi": {
      "match": {"prefix": {"text": {"value": ""}}}, "id_field": "id"}}}""",
      "non-empty string value")
    bad("""{"query": {"span_multi": {"id_field": "id"}}}""",
      "requires {match:")
    bad("""{"query": {"span_multi": {
      "match": {"prefix": {"text": {"value": "a"}}}}}}""",
      "requires id_field")
    bad("""{"query": {"span_near": {"clauses": [
      {"span_multi": {"match": {"prefix": {"text": {"value": "a"}}},
        "extra": 1}},
      {"span_term": {"text": "b"}}],
      "slop": 1, "id_field": "id"}}}""", "unsupported span_multi option")
    bad("""{"query": {"bool": {"must": [{"span_multi": {
      "match": {"prefix": {"text": {"value": "a"}}},
      "id_field": "id"}}]}}}""", "request-level query")
  }

  test("significant_terms background_filter narrows the baseline") {
    import spark.implicits._
    val t = Seq(
      ("a", "en", 1L), ("a", "en", 1L), ("a", "de", 1L),
      ("b", "en", 0L), ("b", "en", 1L), ("b", "de", 0L),
      ("c", "de", 1L)).toDF("src", "lang", "hit")
    // fg = hit=1, bg = lang=en: src a: bg 2, fg 2; src b: bg 2, fg 1;
    // src c drops (no en docs). n_all=4, n_fg=3.
    val r = QueryDsl.search(t,
      """{"query": {"term": {"hit": 1}},
         "aggs": {"s": {"significant_terms": {"field": "src",
           "background_filter": {"term": {"lang": "en"}}}}}}""")
      .as[(String, Long, Long, Long)].collect().toSeq
    // score_ppm = doc*n_all*1e6 // (bg*n_fg)
    assert(r === Seq(
      ("a", 2L, 2L, 2L * 4 * 1000000 / (2 * 3)),
      ("b", 1L, 2L, 1L * 4 * 1000000 / (2 * 3))))
    // no filter: the original whole-corpus baseline (c appears)
    val r0 = QueryDsl.search(t,
      """{"query": {"term": {"hit": 1}},
         "aggs": {"s": {"significant_terms": {"field": "src"}}}}""")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r0.map(_._1).toSet === Set("a", "b", "c"))
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"aggs": {"s": {"significant_terms": {"field": "src",
        "background": {"term": {"lang": "en"}}}}}}"""))
    assert(e.getMessage.contains("unsupported significant_terms option"))
  }

  test("match boost scales the score, never the reach") {
    import spark.implicits._
    val t = Seq((1L, "spark"), (2L, "join"), (3L, "spark join"))
      .toDF("id", "text")
    val out = QueryDsl.search(t,
      """{"query": {"bool": {"should": [
           {"match": {"text": {"query": "spark", "boost": 3}}},
           {"match": {"text": "join"}}], "minimum_should_match": 1}},
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L), (2L, 1L), (3L, 4L)))
    def bad(json: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains("positive integer"), e.getMessage)
    }
    bad("""{"query": {"match": {"text": {"query": "spark", "boost": 0}}}}""")
    bad("""{"query": {"match": {"text": {"query": "spark", "boost": 1.5}}}}""")
  }

  test("multi_match phrase_prefix and bool_prefix type-ahead types") {
    import spark.implicits._
    val t = Seq(
      (1L, "big data spark", "spark rules"),
      (2L, "spark joins fast", "x"),
      (3L, "hive", "sp")).toDF("id", "a", "b")
    def run(json: String): Seq[(Long, Long)] =
      QueryDsl.search(t, json).as[(Long, Long)].collect().toSeq
    // phrase_prefix: terms in order, the LAST one a token prefix
    assert(run("""{"query": {"multi_match": {"query": "data sp",
      "fields": ["a", "b"], "type": "phrase_prefix"}},
      "sort": ["id"], "_source": ["id", "score"]}""") === Seq((1L, 1L)))
    assert(run("""{"query": {"multi_match": {"query": "spark jo",
      "fields": ["a", "b"], "type": "phrase_prefix"}},
      "sort": ["id"], "_source": ["id", "score"]}""") === Seq((2L, 1L)))
    // bool_prefix: bag per field (full terms + last-token prefix),
    // best field wins
    assert(run("""{"query": {"multi_match": {"query": "data sp",
      "fields": ["a", "b"], "type": "bool_prefix"}},
      "sort": ["id"], "_source": ["id", "score"]}""")
      === Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    // minimum_should_match gates each field's bag count
    assert(run("""{"query": {"multi_match": {"query": "data sp",
      "fields": ["a", "b"], "type": "bool_prefix",
      "minimum_should_match": 2}},
      "sort": ["id"], "_source": ["id", "score"]}""") === Seq((1L, 2L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"multi_match": {"query": "data sp",
      "fields": ["a"], "type": "phrase_prefix", "fuzziness": 1}}}""",
      "does not take fuzziness")
    bad("""{"query": {"multi_match": {"query": "data sp",
      "fields": ["a"], "type": "phrase_prefix",
      "minimum_should_match": 2}}}""",
      "does not take minimum_should_match")
    bad("""{"query": {"multi_match": {"query": "data sp",
      "fields": ["a"], "type": "bool_prefix", "tie_breaker": 0.3}}}""",
      "tie_breaker applies to best_fields only")
  }

  test("multi_match cross_fields and phrase types") {
    import spark.implicits._
    val t = Seq(
      (1L, "jane", "smith"), (2L, "smith", "jane"),
      (3L, "jane", "doe"), (4L, "bob", "stone")).toDF("id", "first", "last")
    // cross_fields: term-centric over the blended field
    val cf = QueryDsl.search(t,
      """{"query": {"multi_match": {"query": "jane smith",
        "fields": ["first", "last"], "type": "cross_fields",
        "minimum_should_match": 2}},
        "sort": [{"_score": "desc"}, "id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(cf === Seq((1L, 2L), (2L, 2L)))
    // a NULL field contributes an EMPTY term set, never poisons the
    // union: "jane jane" in first with last NULL still matches term
    // "jane" (the OpenSearch missing-field contract)
    val tn = Seq(
      (1L, Some("jane"), Some("smith")), (2L, Some("jane smith"), None),
      (3L, None, Some("jane")), (4L, Option.empty[String], Option.empty[String]))
      .toDF("id", "first", "last")
    val cfNull = QueryDsl.search(tn,
      """{"query": {"multi_match": {"query": "jane smith",
        "fields": ["first", "last"], "type": "cross_fields",
        "minimum_should_match": 2}},
        "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(cfNull === Seq((1L, 2L), (2L, 2L)))
    val cfNull1 = QueryDsl.search(tn,
      """{"query": {"multi_match": {"query": "jane",
        "fields": ["first", "last"], "type": "cross_fields"}},
        "sort": ["id"], "_source": ["id"]}""").as[Long].collect().toSeq
    assert(cfNull1 === Seq(1L, 2L, 3L))
    // best_fields would find NO doc with both terms in one field
    val bf = QueryDsl.search(t,
      """{"query": {"multi_match": {"query": "jane smith",
        "fields": ["first", "last"], "minimum_should_match": 2}},
        "_source": ["id"]}""").count()
    assert(bf === 0L)
    // phrase: ordered adjacency per field; score = matching fields
    val t2 = Seq(
      (1L, "big data spark", "x"), (2L, "spark big data", "big data lake"),
      (3L, "big lake data", "y")).toDF("id", "a", "b")
    val ph = QueryDsl.search(t2,
      """{"query": {"multi_match": {"query": "big data",
        "fields": ["a", "b"], "type": "phrase"}},
        "sort": [{"_score": "desc"}, "id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(ph === Seq((2L, 2L), (1L, 1L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t2, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"multi_match": {"query": "big data",
      "fields": ["a"], "type": "phrase", "fuzziness": 1}}}""",
      "does not take fuzziness")
    bad("""{"query": {"multi_match": {"query": "big data",
      "fields": ["a"], "type": "phrase", "minimum_should_match": 2}}}""",
      "does not take minimum_should_match")
    bad("""{"query": {"multi_match": {"query": "big data",
      "fields": ["a"], "type": "nope"}}}""",
      "unsupported multi_match type")
    bad("""{"query": {"multi_match": {"query": "big data",
      "fields": ["a", "b"], "type": "cross_fields",
      "tie_breaker": 0.3}}}""", "tie_breaker applies to best_fields")
  }

  test("match zero_terms_query decides what an empty analyzed query means") {
    import spark.implicits._
    val t = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    // "!!!" analyzes to nothing under the standard analyzer
    val all = QueryDsl.search(t,
      """{"query": {"match": {"text": {"query": "!!!",
        "analyzer": "standard", "zero_terms_query": "all"}}},
        "_source": ["id"]}""").as[Long].collect().toSeq.sorted
    assert(all === Seq(1L, 2L))
    val none = QueryDsl.search(t,
      """{"query": {"match": {"text": {"query": "!!!",
        "analyzer": "standard", "zero_terms_query": "none"}}}}""").count()
    assert(none === 0L)
    // a NON-empty query with the option set behaves normally
    val normal = QueryDsl.search(t,
      """{"query": {"match": {"text": {"query": "alpha",
        "zero_terms_query": "all"}}}, "_source": ["id"]}""")
      .as[Long].collect().toSeq
    assert(normal === Seq(1L))
    // without the option the engine default stays FAIL LOUD
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"query": {"match": {"text": {"query": "!!!",
        "analyzer": "standard"}}}}"""))
    assert(e.getMessage.contains("empty query"))
    val e2 = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"query": {"match": {"text": {"query": "alpha",
        "zero_terms_query": "maybe"}}}}"""))
    assert(e2.getMessage.contains("zero_terms_query must be none|all"))
  }

  test("_analyze returns the exact token stream the matchers see") {
    import spark.implicits._
    val r = QueryDsl.analyze(spark,
      """{"analyzer": "standard", "text": "Big-Data, SPARK!"}""")
      .as[(String, Long)].collect().toSeq
    assert(r === Seq(("big", 0L), ("data", 1L), ("spark", 2L)))
    // default analyzer = whitespace; empty tokens stay visible — the
    // endpoint shows exactly what the matching surfaces see
    val w = QueryDsl.analyze(spark, """{"text": "a  b"}""")
      .as[(String, Long)].collect().toSeq
    assert(w === Seq(("a", 0L), ("", 1L), ("b", 2L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.analyze(spark, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"analyzer": "standard"}""", "needs text")
    bad("""{"text": "x", "explain": true}""", "unsupported _analyze option")
    bad("""{"text": "x", "analyzer": "snowball"}""", "analyzer")
  }

  test("derivative unit emits the per-unit normalized series") {
    import spark.implicits._
    // monthly buckets of unequal length: Jan(31d)=2, Feb(28d)=3, Mar=4
    val t = (Seq.fill(2)("2021-01-15 00:00:00") ++
      Seq.fill(3)("2021-02-15 00:00:00") ++
      Seq.fill(4)("2021-03-15 00:00:00")).toDF("ts0")
      .select(to_timestamp(col("ts0")).as("ts"))
    val r = QueryDsl.search(t,
      """{"aggs": {"mon": {"date_histogram": {"field": "ts",
           "calendar_interval": "month"},
         "aggs": {"d": {"derivative": {"buckets_path": "_count",
           "unit": "day"}}}}}}""")
      .select("doc_count", "d", "d_normalized")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq
    // the gap is BETWEEN keys: Jan->Feb spans January's 31 days,
    // Feb->Mar spans February's 28
    assert(r === Seq(
      (2L, None, None),
      (3L, Some(1L), Some(1.0 * 86400000000.0 / (31 * 86400000000.0))),
      (4L, Some(1L), Some(1.0 * 86400000000.0 / (28 * 86400000000.0)))))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"mon": {"date_histogram": {"field": "ts",
      "calendar_interval": "month"},
      "aggs": {"d": {"derivative": {"buckets_path": "_count",
        "unit": "fortnight"}}}}}}""", "unit must be second|minute|hour|day")
    val tn = Seq(1L, 2L).toDF("v")
    val en = intercept[IllegalArgumentException](QueryDsl.search(tn,
      """{"aggs": {"h": {"histogram": {"field": "v", "interval": 1},
        "aggs": {"d": {"derivative": {"buckets_path": "_count",
          "unit": "day"}}}}}}"""))
    assert(en.getMessage.contains("requires a date_histogram parent"))
  }

  test("date_histogram offset shifts bucket boundaries") {
    import spark.implicits._
    val t = Seq("2021-01-02 05:00:00", "2021-01-02 07:00:00",
        "2021-01-03 05:59:59").toDF("ts0")
      .select(to_timestamp(col("ts0")).as("ts"))
    def keys(json: String): Seq[String] =
      QueryDsl.search(t, json).select(col("d").cast("string"))
        .as[String].collect().toSeq.sorted
    // +6h boundaries: days run 06:00 -> 06:00
    assert(keys("""{"aggs": {"d": {"date_histogram": {"field": "ts",
        "fixed_interval": "1d", "offset": "+6h"}}}}""") ===
      Seq("2021-01-01 06:00:00", "2021-01-02 06:00:00"))
    // calendar day parent takes the same offset
    assert(keys("""{"aggs": {"d": {"date_histogram": {"field": "ts",
        "calendar_interval": "day", "offset": "6h"}}}}""") ===
      Seq("2021-01-01 06:00:00", "2021-01-02 06:00:00"))
    // composes with time_zone: shift = tz - offset (boundaries at
    // 06:00 local = 04:00 UTC for +02:00; 05:00 UTC falls AFTER the
    // day's 04:00 boundary, so both Jan-2 stamps land in Jan-2 04:00)
    assert(keys("""{"aggs": {"d": {"date_histogram": {"field": "ts",
        "fixed_interval": "1d", "offset": "+6h",
        "time_zone": "+02:00"}}}}""") ===
      Seq("2021-01-02 04:00:00", "2021-01-03 04:00:00"))
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"aggs": {"d": {"date_histogram": {"field": "ts",
        "fixed_interval": "1d", "offset": "6.5h"}}}}"""))
    assert(e.getMessage.contains("offset must match"))
  }

  test("filters accepts the anonymous array form with positional keys") {
    import spark.implicits._
    val t = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("c", 4L)).toDF("k", "v")
    val r = QueryDsl.search(t,
      """{"aggs": {"f": {"filters": {"filters": [
           {"term": {"k": "a"}}, {"term": {"k": "b"}}],
         "other_bucket": true}}}}""")
      .as[(String, Long)].collect().toSeq
    assert(r === Seq(("0", 2L), ("1", 1L), ("_other_", 1L)))
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"aggs": {"f": {"filters": {"filters": []}}}}"""))
    assert(e.getMessage.contains("non-empty keyed filters object or filters array"))
  }

  test("_source object form and the aggs-arm silent-ignore guards") {
    import spark.implicits._
    val t = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "v")
    // includes projects, excludes then drops
    val r = QueryDsl.search(t,
      """{"query": {"match_all": {}}, "sort": ["id"],
         "_source": {"includes": ["id", "k", "v"], "excludes": ["k"]}}""")
    assert(r.columns.toSeq === Seq("id", "v"))
    // excludes-only keeps every other hit column, including the
    // computed score
    val r2 = QueryDsl.search(t,
      """{"query": {"match_all": {}}, "sort": ["id"],
         "_source": {"excludes": ["v"]}}""")
    assert(r2.columns.toSeq === Seq("id", "k", "score"))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"_source": {"includes": ["id.*"]}}""", "exact column names")
    bad("""{"_source": {"excludes": ["zz"]}}""", "excludes unknown column")
    bad("""{"_source": {"excludes": ["id", "k", "v", "score"]}}""",
      "excludes every column")
    bad("""{"_source": {"include": ["id"]}}""", "unsupported _source option")
    // aggs + hits-arm keys: size 0 is the blessed aggs-only shape,
    // anything else would be silently ignored -> fail loud
    val ok = QueryDsl.search(t,
      """{"size": 0, "aggs": {"n": {"value_count": {"field": "id"}}}}""")
    assert(ok.as[Long].head() === 2L)
    bad("""{"size": 5, "aggs": {"n": {"value_count": {"field": "id"}}}}""",
      "size must be 0 or absent")
    bad("""{"sort": ["id"], "aggs": {"n": {"value_count": {"field": "id"}}}}""",
      "sort applies to hits, not aggs")
    bad("""{"from": 1, "aggs": {"n": {"value_count": {"field": "id"}}}}""",
      "from applies to hits, not aggs")
  }

  test("terms order accepts the multi-criteria array form") {
    import spark.implicits._
    val t = Seq(("a", 5L), ("a", 1L), ("b", 2L), ("b", 9L), ("c", 1L),
      ("c", 3L)).toDF("k", "v")
    // all buckets tie on doc_count; the second criterion decides
    val r = QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "k",
           "order": [{"_count": "desc"}, {"mx": "desc"}]},
         "aggs": {"mx": {"max": {"field": "v"}}}}}}""")
      .select("g").as[String].collect().toSeq
    assert(r === Seq(("b"), ("a"), ("c")))
    // single-criterion object form unchanged (implicit _key asc tiebreak)
    val r1 = QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "k",
           "order": {"_count": "desc"}},
         "aggs": {"mx": {"max": {"field": "v"}}}}}}""")
      .select("g").as[String].collect().toSeq
    assert(r1 === Seq(("a"), ("b"), ("c")))
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "k", "order": []}}}}"""))
    assert(e.getMessage.contains("terms order must be"))
  }

  test("auto_date_histogram minimum_interval floors the derived unit") {
    import spark.implicits._
    // 5 days of data: the derived unit would be day; the floor forces
    // month (one bucket), year likewise
    val t = (1 to 5).map(d => f"2021-03-0$d%d 12:00:00").toDF("ts0")
      .select(to_timestamp(col("ts0")).as("ts"))
    def units(extra: String): (Long, String) = {
      val r = QueryDsl.search(t,
        s"""{"aggs": {"a": {"auto_date_histogram":
             {"field": "ts", "buckets": 10$extra}}}}""").collect()
      (r.length.toLong, r.head.getAs[String]("interval"))
    }
    assert(units("") === ((5L, "day")))
    assert(units(""", "minimum_interval": "month"""") === ((1L, "month")))
    assert(units(""", "minimum_interval": "year"""") === ((1L, "year")))
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"aggs": {"a": {"auto_date_histogram": {"field": "ts",
        "minimum_interval": "hour"}}}}"""))
    assert(e.getMessage.contains("minimum_interval must be day|month|year"))
  }

  test("reverse_nested counts parent docs per nested bucket") {
    import spark.implicits._
    val t = Seq((1L, Seq("a", "b")), (2L, Seq("a", "a")), (3L, Seq("b")))
      .toDF("id", "tags")
      .withColumn("tk", expr("transform(tags, x -> struct(x AS tag))"))
    val out = QueryDsl.search(t,
      """{"aggs": {"nt": {"nested": {"path": "tk"},
           "aggs": {"by_tag": {"terms": {"field": "tk.tag"}},
                    "parents": {"reverse_nested": {}}}}}}""")
      .orderBy("by_tag").as[(String, Long, Long)].collect().toSeq
    // a: 3 elements across 2 parents; b: 2 elements across 2 parents
    assert(out === Seq(("a", 3L, 2L), ("b", 2L, 2L)))
    // global form: 5 elements, 3 contributing parents
    val g = QueryDsl.search(t,
      """{"aggs": {"nt": {"nested": {"path": "tk"},
           "aggs": {"parents": {"reverse_nested": {}}}}}}""")
      .as[(Long, Long)].collect().head
    assert(g === ((5L, 3L)))
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"aggs": {"nt": {"nested": {"path": "tk"},
           "aggs": {"parents": {"reverse_nested": {"path": "tk"}}}}}}"""))
    assert(e.getMessage.contains("takes no options"), e.getMessage)
  }

  test("nested agg with a terms sub-agg facets over array elements") {
    import spark.implicits._
    val t = Seq(
      (1L, Seq("red", "blue", "red")),
      (2L, Seq("blue")),
      (3L, Seq("green", "red"))).toDF("id", "tags")
    val r = QueryDsl.search(t,
      """{"aggs": {"nt": {"nested": {"path": "tags"},
         "aggs": {"top_tags": {"terms": {"field": "tags", "size": 2}}}}}}""")
      .as[(String, Long)].collect().toSeq
    assert(r === Seq(("red", 3L), ("blue", 2L)))
    // struct members: field = path.member, metrics ride the groupBy
    val ts = Seq(
      (1L, Seq(("a", 10L), ("b", 20L))),
      (2L, Seq(("a", 30L)))).toDF("id", "kv")
      .select(col("id"), expr(
        "transform(kv, x -> struct(x._1 AS k, x._2 AS v))").as("kv"))
    val r2 = QueryDsl.search(ts,
      """{"aggs": {"nk": {"nested": {"path": "kv"},
         "aggs": {"ks": {"terms": {"field": "kv.k"}},
                  "total": {"sum": {"field": "kv.v"}}}}}}""")
      .as[(String, Long, Long)].collect().toSeq
    assert(r2 === Seq(("a", 2L, 40L), ("b", 1L, 20L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"nt": {"nested": {"path": "tags"},
      "aggs": {"x": {"terms": {"field": "id"}}}}}}""",
      "must be the nested path")
    bad("""{"aggs": {"nt": {"nested": {"path": "tags"},
      "aggs": {"x": {"terms": {"field": "tags", "order":
        {"_count": "asc"}}}}}}}""", "unsupported nested terms option")
    bad("""{"aggs": {"nt": {"nested": {"path": "tags"},
      "aggs": {"x": {"terms": {"field": "tags"}},
               "y": {"terms": {"field": "tags"}}}}}}""",
      "at most one terms sub-agg")
  }

  test("significant_text background_filter narrows the token baseline") {
    import spark.implicits._
    val t = Seq(("red apple", "en", 1L), ("red berry", "en", 0L),
      ("red wine", "de", 1L)).toDF("text", "lang", "hit")
    // bg = en docs (2), fg = hit=1 within bg (1 doc: "red apple")
    val r = QueryDsl.search(t,
      """{"query": {"term": {"hit": 1}},
         "aggs": {"sig": {"significant_text": {"field": "text",
           "background_filter": {"term": {"lang": "en"}}}}}}""")
      .as[(String, Long, Long, Long)].collect().toSeq
    // apple: fg1 bg1 -> 2e6; red: fg1 bg2 -> 1e6; berry fg0 falls
    // under min_doc_count 1; wine (de-only) drops from the narrowed
    // baseline entirely
    assert(r === Seq(("apple", 1L, 1L, 2000000L), ("red", 1L, 2L, 1000000L)))
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"aggs": {"sig": {"significant_text": {"field": "text",
        "background": {"term": {"lang": "en"}}}}}}"""))
    assert(e.getMessage.contains("unsupported significant_text option"))
  }

  test("script query filters by a compiled integer predicate") {
    import spark.implicits._
    val t = Seq((1L, 10L), (2L, 300L), (3L, 250L)).toDF("id", "n")
    val hits = QueryDsl.search(t,
      """{"query": {"script": {"script":
           {"source": "doc['n'].value * 2 + params.k > 500",
            "params": {"k": 7}}}},
         "sort": ["id"], "_source": ["id"]}""").as[Long].collect().toSeq
    assert(hits === Seq(2L, 3L))
    // composes inside a bool filter like any predicate clause
    val boolHits = QueryDsl.search(t,
      """{"query": {"bool": {"filter": [
           {"script": {"script": {"source": "doc['n'].value != 250"}}},
           {"range": {"n": {"gte": 100}}}]}},
         "sort": ["id"], "_source": ["id"]}""").as[Long].collect().toSeq
    assert(boolHits === Seq(2L))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"script": {"script":
      {"source": "doc['n'].value > 1 > 2"}}}}""", "exactly one comparator")
    bad("""{"query": {"script": {"script":
      {"source": "doc['n'].value + 1"}}}}""", "exactly one comparator")
    bad("""{"query": {"script": {"script":
      {"source": "_score > 1"}}}}""", "cannot reference _score")
    bad("""{"query": {"script": {"script":
      {"source": "doc['n'].value > 1", "lang": "painless"}}}}""",
      "unsupported script option")
  }

  test("post_filter drops hits after scoring; match_none is the empty leaf") {
    import spark.implicits._
    val t = Seq((1L, "spark join", 10L), (2L, "spark scan", 900L),
      (3L, "hive scan", 5L)).toDF("id", "text", "n")
    // query matches 1,2 with score 1; post_filter keeps n<100 only —
    // the surviving hit's score is the QUERY's, untouched
    val hits = QueryDsl.search(t,
      """{"query": {"match": {"text": "spark"}},
         "post_filter": {"range": {"n": {"lt": 100}}},
         "track_total_hits": true,
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(hits === Seq((1L, 1L)))
    // post_filter composes with search_after keyset pagination
    val after = QueryDsl.search(t,
      """{"query": {"match_all": {}},
         "post_filter": {"range": {"n": {"lt": 1000}}},
         "search_after": [1], "sort": ["id"], "_source": ["id"]}""")
      .as[Long].collect().toSeq
    assert(after === Seq(2L, 3L))
    // post_filter runs BEFORE collapse (the OpenSearch phase order):
    // a group whose best representative is filtered away collapses to
    // its best SURVIVING hit instead of disappearing
    val tc = Seq((1L, "spark", 5L, "g1"), (2L, "spark", 50L, "g1"),
      (3L, "spark", 7L, "g2")).toDF("id", "text", "n", "g")
    val pc = QueryDsl.search(tc,
      """{"query": {"match": {"text": "spark"}},
         "post_filter": {"range": {"n": {"lt": 30}}},
         "collapse": {"field": "g"},
         "sort": [{"n": "desc"}, "id"], "_source": ["id", "g"]}""")
      .as[(Long, String)].collect().toSeq
    assert(pc === Seq((3L, "g2"), (1L, "g1")))
    // match_none: matches nothing alone, inert inside should
    assert(QueryDsl.search(t, """{"query": {"match_none": {}}}""").count() === 0L)
    val viaShould = QueryDsl.search(t,
      """{"query": {"bool": {"should": [{"match": {"text": "spark"}},
           {"match_none": {}}], "minimum_should_match": 1}},
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(viaShould === Seq((1L, 1L), (2L, 1L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"match_all": {}},
           "post_filter": {"term": {"id": 1}}, "size": 0,
           "aggs": {"m": {"max": {"field": "n"}}}}""",
      "post_filter applies to hits, not aggs")
    bad("""{"query": {"match_all": {}},
           "post_filter": {"term": {"id": {"value": 1, "_name": "pf"}}}}""",
      "_name inside post_filter")
    bad("""{"query": {"match_none": {"boost": 2}}}""", "match_none takes no options")
    bad("""{"query": {"match_all": {}}, "track_total_hits": -3}""",
      "track_total_hits must be")
    bad("""{"query": {"match_all": {}}, "track_total_hits": "exact"}""",
      "track_total_hits must be")
  }

  test("match_phrase slop matches ordered terms within the gap budget") {
    import spark.implicits._
    val t = Seq((1L, "big data spark"), (2L, "big shiny data"),
      (3L, "data big"), (4L, "big x y data")).toDF("id", "text")
    def ids(json: String): Seq[Long] =
      QueryDsl.search(t, json).select("id").as[Long].collect().toSeq.sorted
    assert(ids("""{"query": {"match_phrase": {"text":
      {"query": "big data", "slop": 1}}}}""") === Seq(1L, 2L))
    assert(ids("""{"query": {"match_phrase": {"text":
      {"query": "big data", "slop": 0}}}}""") === Seq(1L))
    assert(ids("""{"query": {"match_phrase": {"text":
      {"query": "big data", "slop": 2}}}}""") === Seq(1L, 2L, 4L))
    // three terms, total budget across both gaps
    assert(ids("""{"query": {"match_phrase": {"text":
      {"query": "big data spark", "slop": 0}}}}""") === Seq(1L))
    // composes inside bool (row-local, unlike span_near)
    assert(ids("""{"query": {"bool": {"must": [
      {"match_phrase": {"text": {"query": "big data", "slop": 2}}},
      {"term": {"id": 4}}]}}}""") === Seq(4L))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"match_phrase": {"text":
      {"query": "big", "slop": 1}}}}""", "slop supports 2-3 terms")
    bad("""{"query": {"match_phrase": {"text":
      {"query": "a b c d", "slop": 1}}}}""", "slop supports 2-3 terms")
    bad("""{"query": {"match_phrase": {"text":
      {"query": "big data", "slop": -1}}}}""", "slop must be >= 0")
  }

  test("rare_terms returns the long tail ascending; validates loudly") {
    val dsl = QueryDsl.search(docs,
      """{"query": {"match_all": {}},
         "aggs": {"tail": {"rare_terms":
           {"field": "source", "max_doc_count": 60}}}}""")
    val rows = dsl.collect()
    assert(rows.forall(_.getLong(1) <= 60))
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts === counts.sorted, "rare buckets ascend by count")
    val full = docs.groupBy(col("source")).count()
      .filter(col("count") <= 60).count()
    assert(rows.length === full)

    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"aggs": {"t": {"rare_terms": {"field": "source",
           "max_doc_count": 0}}}}""")
    bad("""{"aggs": {"t": {"rare_terms": {"max_doc_count": 2}}}}""")
    bad("""{"aggs": {"t": {"rare_terms": {"field": "source"},
           "aggs": {"m": {"avg": {"field": "n_chars"}}}}}}""")  // sub-aggs
  }

  test("adjacency_matrix: pairwise intersection cells, one pass") {
    val dsl = QueryDsl.search(docs,
      """{"query": {"match_all": {}},
         "aggs": {"m": {"adjacency_matrix": {"filters": {
           "en": {"term": {"lang": "en"}},
           "short": {"range": {"n_chars": {"lt": 250}}}}}}}}""")
    val rows = dsl.collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("en", "en&short", "short"))
    val en = docs.filter(col("lang") === "en").count()
    val short = docs.filter(col("n_chars") < 250).count()
    val both = docs.filter(col("lang") === "en" && col("n_chars") < 250).count()
    assert(rows.map(_.getLong(1)).toSeq === Seq(en, both, short))
    // one pass: a single aggregate, no join
    val plan = dsl.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"adjacency_matrix must not join:\n${plan.take(1500)}")

    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"aggs": {"m": {"adjacency_matrix": {"filters": {
           "only": {"term": {"lang": "en"}}}}}}}""")          // < 2 filters
    bad("""{"aggs": {"m": {"adjacency_matrix": {"filters": {
           "a&b": {"term": {"lang": "en"}},
           "c": {"term": {"lang": "fr"}}}}}}}""")             // '&' in name
  }

  test("matrix_stats: exact moments; float fields fail loud") {
    val d = docs.withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val row = QueryDsl.search(d,
      """{"query": {"match_all": {}},
         "aggs": {"ms": {"matrix_stats": {"fields": ["n_chars", "n_tokens"]}}}}""")
      .collect().head
    val n = d.count()
    assert(row.getLong(0) === n)
    val meanChars = d.agg(sum(col("n_chars"))).collect().head.getLong(0).toDouble / n
    assert(math.abs(row.getDouble(1) - meanChars) < 1e-6)
    // correlation of chars vs tokens must be strongly positive
    assert(row.getDouble(6) > 0.5, s"corr = ${row.getDouble(6)}")

    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(
        d.withColumn("f", col("n_chars").cast("double")), req))
    bad("""{"aggs": {"ms": {"matrix_stats": {"fields": ["n_chars", "f"]}}}}""")
    bad("""{"aggs": {"ms": {"matrix_stats": {"fields": ["n_chars"]}}}}""")
    bad("""{"aggs": {"ms": {"matrix_stats": {"fields": ["n_chars", "nope"]}}}}""")
    bad("""{"aggs": {"ms": {"matrix_stats": {"fields": ["n_chars", "n_tokens"]},
           "aggs": {"a": {"avg": {"field": "n_chars"}}}}}}""")
  }

  test("completion suggester == handwritten q115 autocomplete") {
    val hand = graft.Registry.byName("q115_search_suggest").run(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val dsl = QueryDsl.search(docs,
      """{"suggest": {"s": {"prefix": "c",
           "completion": {"field": "text", "size": 10, "min_length": 3}}}}""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(dsl === hand)
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"suggest": {"s": {"prefix": "c", "text": "x",
           "completion": {"field": "text"}}}}""")     // mixes with text
    bad("""{"suggest": {"s": {"completion": {"field": "text"}}}}""") // no prefix
    bad("""{"suggest": {"s": {"prefix": "c",
           "term": {"field": "text"}}}}""")           // prefix on term suggester
    bad("""{"suggest": {"s": {"prefix": "",
           "completion": {"field": "text"}}}}""")     // empty prefix
  }

  test("completion fuzzy and contexts: typo-tolerant, category-filtered") {
    import spark.implicits._
    val t = Seq(
      ("spark rules", "en"), ("spark spark", "en"), ("sparse data", "de"),
      ("spoon fork", "fr"), ("spark encore", "fr"))
      .toDF("text", "lang")
    def sugg(req: String): Seq[(String, Long)] = QueryDsl.search(t, req)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // exact prefix, context-filtered to en+de
    assert(sugg("""{"suggest": {"s": {"prefix": "spar",
        "completion": {"field": "text",
          "contexts": {"lang": ["en", "de"]}}}}}""") ===
      Seq(("spark", 3L), ("sparse", 1L)))
    // fuzzy: the typed prefix "spxr" is 1 edit from "spar" — both
    // stems complete; "spoon" (2 edits) stays out
    assert(sugg("""{"suggest": {"s": {"prefix": "spxr",
        "completion": {"field": "text", "fuzzy": {"fuzziness": 1}}}}}""") ===
      Seq(("spark", 4L), ("sparse", 1L)))
    // fuzziness defaults to 1 when the object is given
    assert(sugg("""{"suggest": {"s": {"prefix": "spxr",
        "completion": {"field": "text", "fuzzy": {}}}}}""") ===
      Seq(("spark", 4L), ("sparse", 1L)))
    // fuzzy + contexts compose; single-value context form
    assert(sugg("""{"suggest": {"s": {"prefix": "spxr",
        "completion": {"field": "text", "fuzzy": {"fuzziness": 1},
          "contexts": {"lang": "fr"}}}}}""") ===
      Seq(("spark", 1L)))
    def bad(req: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, req))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"suggest": {"s": {"prefix": "sp",
      "completion": {"field": "text", "fuzzy": {"fuzziness": 3}}}}}""",
      "fuzziness must be 0-2")
    bad("""{"suggest": {"s": {"prefix": "sp",
      "completion": {"field": "text", "fuzzy": true}}}}""",
      "fuzzy must be an object")
    bad("""{"suggest": {"s": {"prefix": "sp",
      "completion": {"field": "text", "contexts": {}}}}}""",
      "contexts must be a non-empty object")
    bad("""{"suggest": {"s": {"prefix": "sp",
      "completion": {"field": "text", "contexts": {"lang": []}}}}}""",
      "must be a value, non-empty array, or geo object")
    bad("""{"suggest": {"s": {"prefix": "sp",
      "completion": {"field": "text", "fuzzy": {"transpositions": true}}}}}""",
      "unsupported completion fuzzy option")
  }

  test("match_bool_prefix scores full terms plus the last-token prefix") {
    val dsl = QueryDsl.search(docs,
      """{"query": {"match_bool_prefix": {"text": "spark join win"}},
         "sort": [{"_score": "desc"}, "doc_id"],
         "_source": ["doc_id", "score"]}""")
    val toks = split(col("text"), " ")
    val score = (size(array_intersect(array_distinct(toks),
        array(lit("spark"), lit("join")))).cast("long") +
      when(exists(toks, t => t.startsWith("win")), 1L).otherwise(0L))
    val hand = docs.withColumn("score", score).filter(col("score") >= 1)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
    assert(dsl.collect().toSeq === hand.collect().toSeq)
    assertThrows[IllegalArgumentException](QueryDsl.search(docs,
      """{"query": {"match_bool_prefix": {"text": "  "}}}"""))
    assertThrows[IllegalArgumentException](QueryDsl.search(docs,
      """{"query": {"match_bool_prefix": {"text":
           {"query": "a b", "fuzziness": 1}}}}"""))
  }

  test("geo_grid validates its body loudly") {
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"aggs": {"g": {"geo_grid": {"lat_field": "a", "lon_field": "b",
           "cell_deg": 0}}}}""")
    bad("""{"aggs": {"g": {"geo_grid": {"lon_field": "b", "cell_deg": 5}}}}""")
    bad("""{"aggs": {"g": {"geo_grid": {"lat_field": "a", "lon_field": "b",
           "cell_deg": 5, "precision": 4}}}}""")
  }

  test("min_score, term boosts and _geo_distance sort validate loudly") {
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"query": {"match_all": {}}, "min_score": 1.5}""")   // float floor
    bad("""{"min_score": 1}""")                                 // no query
    bad("""{"query": {"term": {"lang": "en"}}, "min_score": 1,
         "aggs": {"a": {"avg": {"field": "n_chars"}}}}""")      // with aggs
    bad("""{"query": {"more_like_this": {"fields": ["text"],
           "like": {"doc_id": 7}}}, "min_score": 1,
         "sort": ["doc_id"]}""")                                // with mlt
    bad("""{"query": {"term": {"lang": {"value": "en",
           "boost": 1.5}}}}""")                                 // float boost
    bad("""{"query": {"term": {"lang": {"value": "en",
           "boost": 0}}}}""")                                   // boost < 1
    bad("""{"query": {"term": {"lang": {"value": "en",
           "rewrite": "top_terms"}}}}""")                       // bad option
    bad("""{"query": {"match_all": {}},
         "sort": [{"_geo_distance": {"lat_field": "a",
           "origin": {"lat": 0, "lon": 0}}}]}""")               // no lon_field
    bad("""{"query": {"match_all": {}},
         "sort": [{"_geo_distance": {"lat_field": "a", "lon_field": "b",
           "origin": {"lat": 0, "lon": 0}}}],
         "search_after": [5]}""")                               // geo cursor
    // min_score keeps only hits at/over the integer floor
    val hits = QueryDsl.search(docs,
      """{"query": {"match": {"text": "spark join"}}, "min_score": 2,
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""").collect()
    assert(hits.nonEmpty && hits.forall(_.getLong(1) >= 2L))
  }

  test("review-hardening regressions: calendar dates, NULL buckets, overflow") {
    // a regex-valid but impossible date must fail loud, never compile
    // to a silently-empty bucket (to_date would return NULL)
    assertThrows[IllegalArgumentException](QueryDsl.search(
      Tables.load(spark, sf(), "orders"),
      """{"aggs": {"p": {"date_range": {"field": "o_orderdate",
           "ranges": [{"from": "1994-02-30"}]}}}}"""))
    // operator keywords cannot be boosted or fielded (Lucene errors too)
    assertThrows[IllegalArgumentException](QueryDsl.search(docs,
      """{"query": {"query_string": {"query": "spark AND^2 join",
           "default_field": "text"}}}"""))
    assertThrows[IllegalArgumentException](QueryDsl.search(docs,
      """{"query": {"query_string": {"query": "text:AND spark",
           "default_field": "text"}}}"""))
    // ...but a QUOTED operator word is an explicit phrase and works
    QueryDsl.search(docs,
      """{"query": {"query_string": {"query": "\"AND\"",
           "default_field": "text"}}, "_source": ["doc_id"]}""").collect()

    // rare_terms / geo_grid omit NULL-keyed rows (OpenSearch missing-
    // value rule + cross-engine NULL sort-order portability)
    import spark.implicits._
    val withNulls = Seq((1L, "a"), (2L, null), (3L, "a"), (4L, "b"))
      .toDF("id", "k")
    val rare = QueryDsl.search(withNulls,
      """{"aggs": {"t": {"rare_terms": {"field": "k", "max_doc_count": 5}}}}""")
      .collect()
    assert(rare.map(_.getString(0)).toSeq.sorted === Seq("a", "b"))
    val geoNulls = Seq((1L, Some(10.0), 20.0), (2L, None, 30.0))
      .toDF("id", "lat", "lon")
    val grid = QueryDsl.search(geoNulls,
      """{"aggs": {"g": {"geo_grid": {"lat_field": "lat",
           "lon_field": "lon", "cell_deg": 15.0}}}}""").collect()
    assert(grid.length === 1 && grid.head.getLong(2) === 1L)

    // matrix_stats raises on moment overflow instead of wrapping —
    // under Spark's default ANSI mode the per-row multiply raises
    // first (ARITHMETIC_OVERFLOW); the engine's own maxab²·n guard
    // covers deployments that disable ANSI. Either way: loud.
    val huge = Seq((4000000000L, 4000000000L), (4000000001L, 4000000001L))
      .toDF("x", "y")
    val ex = intercept[Exception](QueryDsl.search(huge,
      """{"aggs": {"ms": {"matrix_stats": {"fields": ["x", "y"]}}}}""")
      .collect())
    val msgs = (ex.getMessage +: Option(ex.getCause).map(_.getMessage).toSeq).mkString(" ")
    assert(msgs.contains("matrix_stats moment overflow") ||
      msgs.contains("ARITHMETIC_OVERFLOW"), msgs.take(300))
  }

  test("_count compiles the query predicate into one global aggregate") {
    val n = QueryDsl.countRequest(docs,
      """{"query": {"term": {"lang": "en"}}}""").collect().head.getLong(0)
    assert(n === docs.filter(col("lang") === "en").count())
    val all = QueryDsl.countRequest(docs, "{}").collect().head.getLong(0)
    assert(all === docs.count())
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.countRequest(docs, req))
    bad("""{"query": {"match_all": {}}, "size": 5}""")   // _count takes no size
    bad("""{"query": {"match_all": {}}, "sort": ["doc_id"]}""")
    bad("""{"query": {"more_like_this": {"fields": ["text"],
           "like": {"doc_id": 7}}}}""")                  // request-level query
  }

  test("terms-in-terms: two-level buckets in response order; validates loudly") {
    val rows = QueryDsl.search(docs,
      """{"query": {"match_all": {}},
         "aggs": {"by_lang": {"terms": {"field": "lang", "size": 2},
           "aggs": {"by_source": {"terms": {"field": "source", "size": 2}}}}}}""")
      .collect()
    assert(rows.map(_.getString(0)).distinct.length <= 2, "outer size cap")
    assert(rows.groupBy(_.getString(0)).values.forall(_.length <= 2), "inner cap")
    // outer buckets ordered by their total desc; inner by count desc
    val outerTotals = rows.map(r => (r.getString(0), r.getLong(1))).distinct
    assert(outerTotals.map(_._2).toSeq === outerTotals.map(_._2).sortBy(-_).toSeq)
    // outer totals = unfiltered per-lang doc counts (neither the
    // inner cap nor missing inner values may change the parent
    // bucket's doc_count — the OpenSearch parent-count semantics)
    val want = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    outerTotals.foreach { case (l, n) => assert(n === want(l), s"outer $l") }

    // NULL inner keys count toward the parent total but emit no bucket
    import spark.implicits._
    val mixed = Seq(("en", Some("a")), ("en", None), ("en", None),
      ("fr", Some("b"))).toDF("o", "i")
    val m = QueryDsl.search(mixed,
      """{"aggs": {"o": {"terms": {"field": "o"},
           "aggs": {"i": {"terms": {"field": "i"}}}}}}""").collect()
    assert(m.map(r => (r.getString(0), r.getLong(1), r.getString(2),
      r.getLong(3))).toSeq ===
      Seq(("en", 3L, "a", 1L), ("fr", 1L, "b", 1L)),
      "parent counts all docs; missing inner values emit no bucket")

    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"aggs": {"a": {"terms": {"field": "lang"},
           "aggs": {"b": {"terms": {"field": "lang"}}}}}}""")  // same field
    bad("""{"aggs": {"a": {"terms": {"field": "lang", "min_doc_count": 5},
           "aggs": {"b": {"terms": {"field": "source"}}}}}}""") // outer opt
    bad("""{"aggs": {"a": {"terms": {"field": "lang"},
           "aggs": {"b": {"terms": {"field": "source"}},
                    "m": {"avg": {"field": "n_chars"}}}}}}""") // sibling of nested
    bad("""{"aggs": {"a": {"histogram": {"field": "n_chars", "interval": 100},
           "aggs": {"b": {"terms": {"field": "source"}}}}}}""") // non-terms parent
  }

  test("percolate == handwritten q98 reverse search; validates loudly") {
    sameAs("q98_search_percolate", "q174_dsl_percolate")
    def bad(req: String): Unit =
      assertThrows[IllegalArgumentException](QueryDsl.search(docs, req))
    bad("""{"query": {"percolate": {"queries": [
           {"id": 1, "query": {"match_all": {}}}]}}}""")     // no id_field
    bad("""{"query": {"percolate": {"id_field": "doc_id",
           "queries": []}}}""")                              // empty registry
    bad("""{"query": {"percolate": {"id_field": "doc_id", "queries": [
           {"id": 1, "query": {"match_all": {}}},
           {"id": 1, "query": {"match_all": {}}}]}}}""")     // duplicate ids
    bad("""{"query": {"percolate": {"id_field": "doc_id", "queries": [
           {"query": {"match_all": {}}}]}}}""")              // missing id
    bad("""{"query": {"bool": {"must": [{"percolate": {
           "id_field": "doc_id",
           "queries": [{"id": 1, "query": {"match_all": {}}}]}}]}}}""")
    bad("""{"query": {"percolate": {"id_field": "doc_id",
           "queries": [{"id": 1, "query": {"match_all": {}}}]}},
         "aggs": {"a": {"avg": {"field": "n_chars"}}}}""")   // with aggs
  }

  test("extended_stats == the exact integer moments, bit-identical doubles") {
    val got = QueryDsl.search(docs,
      """{"aggs": {"c": {"extended_stats": {"field": "n_chars"}}}}""")
      .collect().head
    val m = docs.agg(
      count(col("n_chars")).as("n"), sum(col("n_chars")).as("s"),
      sum(col("n_chars") * col("n_chars")).as("ss"),
      min("n_chars").as("mn"), max("n_chars").as("mx")).collect().head
    val (n, s, ss) = (m.getLong(0), m.getLong(1), m.getLong(2))
    assert(got.getAs[Long]("c_count") === n)
    assert(got.getAs[Long]("c_sum") === s)
    assert(got.getAs[Long]("c_sum_of_squares") === ss)
    val varExp = (n * ss - s * s).toDouble / (n.toDouble * n)
    assert(got.getAs[Double]("c_variance") === varExp)
    assert(got.getAs[Double]("c_std_deviation") === math.sqrt(varExp))
  }

  test("weighted_avg == exact-sum ratio; top_metrics picks the top-sort row") {
    val w = docs.withColumn("w", col("doc_id") % 5 + 1)
    val got = QueryDsl.search(w,
      """{"aggs": {"wa": {"weighted_avg": {
           "value": {"field": "n_chars"}, "weight": {"field": "w"}}}}}""")
      .collect().head.getAs[Double]("wa")
    val m = w.agg(sum(col("n_chars") * col("w")), sum(col("w"))).collect().head
    assert(got === m.getLong(0).toDouble / m.getLong(1).toDouble)

    val top = QueryDsl.search(docs,
      """{"aggs": {"t": {"top_metrics": {
           "metrics": {"field": "doc_id"},
           "sort": {"n_chars": {"order": "desc"}}}}}}""")
      .collect().head.getAs[Long]("t")
    val exp = docs.orderBy(col("n_chars").desc, col("doc_id").desc)
      .select("doc_id").collect().head.getLong(0)
    assert(top === exp)
  }

  test("missing counts only NULL-field docs and gates sub-metrics on them") {
    val d = docs.withColumn("opt",
      when(col("doc_id") % 3 === 0, lit(null).cast("string"))
        .otherwise(col("source")))
    val got = QueryDsl.search(d,
      """{"aggs": {"m": {"missing": {"field": "opt"},
           "aggs": {"s": {"sum": {"field": "n_chars"}}}}}}""").collect().head
    val exp = d.filter(col("opt").isNull)
      .agg(count(lit(1)), sum("n_chars")).collect().head
    assert(got.getAs[Long]("doc_count") === exp.getLong(0))
    assert(got.getAs[Long]("s") === exp.getLong(1))
  }

  test("multi_terms validates its shape loudly") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"aggs": {"a": {"multi_terms": {"terms": [{"field": "lang"}]}}}}""",
      ">= 2 fields")
    bad("""{"aggs": {"a": {"multi_terms": {"terms":
           [{"field": "lang"}, {"field": "lang"}]}}}}""", "repeats a field")
    bad("""{"aggs": {"a": {"multi_terms": {"terms":
           [{"field": "lang"}, {"field": "source"}], "order": "x"}}}}""",
      "unsupported multi_terms option")
    bad("""{"aggs": {"a": {"multi_terms": {"terms":
           [{"field": "lang", "min_doc_count": 2}, {"field": "source"}]}}}}""",
      "unsupported multi_terms terms-entry option")
    bad("""{"aggs": {"a": {"multi_terms": {"terms":
           [{"missing": "x"}, {"field": "source"}]}}}}""",
      "need a field")
  }

  test("multi_terms missing substitutes per entry; unsubstituted NULL keys skip") {
    import spark.implicits._
    val t = Seq(
      (Some("a"), Some("x")), (Some("a"), None), (Some("a"), None),
      (None, Some("x")), (Some("b"), Some("x"))
    ).toDF("k1", "k2")
    val got = QueryDsl.search(t,
      """{"size": 0, "aggs": {"p": {"multi_terms": {
           "terms": [{"field": "k1"}, {"field": "k2", "missing": "none"}]}}}}""")
      .as[(String, String, Long)].collect().toSeq
    // (a, none) count 2; the NULL-k1 row is skipped (no missing on k1)
    assert(got === Seq(("a", "none", 2L), ("a", "x", 1L), ("b", "x", 1L)))
  }

  test("bucket_selector / bucket_sort validate loudly; series needs histogram") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    val hist = """"hist": {"histogram": {"field": "n_chars", "interval": 50},"""
    bad(s"""{"aggs": {$hist
           "aggs": {"b": {"bucket_selector": {
             "buckets_path": {"x": "_count"},
             "script": "params.x > avg"}}}}}}""", "script must match")
    bad(s"""{"aggs": {$hist
           "aggs": {"b": {"bucket_selector": {
             "buckets_path": {"x": "_count"},
             "script": "params.y > 10"}}}}}}""", "undeclared param")
    bad(s"""{"aggs": {$hist
           "aggs": {"b": {"bucket_selector": {
             "buckets_path": {"x": "nope"},
             "script": "params.x > 10"}}}}}}""", "names no")
    bad(s"""{"aggs": {$hist
           "aggs": {"s1": {"bucket_sort": {"size": 2}},
                    "s2": {"bucket_sort": {"size": 3}}}}}}""",
      "at most one bucket_sort")
    bad("""{"aggs": {"a": {"terms": {"field": "lang"},
           "aggs": {"d": {"serial_diff": {"buckets_path": "_count"}}}}}}""",
      "require a histogram")
    // selector+sort under terms IS allowed (the HAVING/ORDER BY idiom)
    val ok = QueryDsl.search(docs,
      """{"aggs": {"a": {"terms": {"field": "lang"},
           "aggs": {"b": {"bucket_selector": {
             "buckets_path": {"dc": "_count"},
             "script": "params.dc >= 1"}}}}}}""")
    assert(ok.count() > 0)
  }

  test("sibling *_bucket aggs validate their buckets_path loudly") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"aggs": {"t": {"sum_bucket": {"buckets_path": "hist>_count"}}}}""",
      "exactly one sibling bucket agg")
    bad("""{"aggs": {
           "hist": {"histogram": {"field": "n_chars", "interval": 50}},
           "t": {"sum_bucket": {"buckets_path": "nope>_count"}}}}""",
      "unknown bucket")
    bad("""{"aggs": {
           "hist": {"histogram": {"field": "n_chars", "interval": 50}},
           "t": {"sum_bucket": {"buckets_path": "hist>missing_metric"}}}}""",
      "names no metric")
  }

  test("script_score compiles to the handwritten Catalyst arithmetic") {
    val got = QueryDsl.search(docs,
      """{"query": {"script_score": {
           "query": {"match": {"text": "spark"}},
           "script": {"source":
             "params.w * _score + min(doc['n_chars'].value, params.cap)",
             "params": {"w": 10, "cap": 500}}}},
         "sort": [{"_score": "desc"}, "doc_id"],
         "_source": ["doc_id", "score"]}""")
    val toks = array_distinct(split(col("text"), " "))
    val matchScore = size(array_intersect(toks, array(lit("spark")))).cast("long")
    val exp = docs.withColumn("s0", matchScore).filter(col("s0") >= 1)
      .withColumn("score", lit(10L) * col("s0") +
        least(col("n_chars"), lit(500L)))
      .orderBy(col("score").desc, col("doc_id"))
      .select("doc_id", "score")
    assert(got.collect().toSeq === exp.collect().toSeq)
  }

  test("script_score grammar fails loud outside the mini-language") {
    def bad(src: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs,
        s"""{"query": {"script_score": {
             "query": {"match_all": {}},
             "script": {"source": "$src"}}}}"""))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("doc['n_chars'].value / 2", "unrecognized token") // no division: LONG model
    bad("params.missing + 1", "undeclared param")
    bad("1 + ", "unexpected end")
    bad("min(1)", "expected ','")
    bad("1 2", "trailing tokens")
    bad("doc.n_chars", "unrecognized token")
  }

  test("intervals: 2-term ordered == span_near in_order at the same budget") {
    val iv = QueryDsl.search(docs,
      """{"query": {"intervals": {
           "text": {"match": {"query": "stream merge",
                              "max_gaps": 3, "ordered": true}},
           "id_field": "doc_id"}},
         "sort": [{"_score": "desc"}, "doc_id"],
         "_source": ["doc_id", "n_spans"]}""")
    val sn = QueryDsl.search(docs,
      """{"query": {"span_near": {
           "clauses": [{"span_term": {"text": "stream"}},
                       {"span_term": {"text": "merge"}}],
           "slop": 3, "in_order": true, "id_field": "doc_id"}},
         "sort": [{"_score": "desc"}, "doc_id"],
         "_source": ["doc_id", "n_pairs"]}""")
    assert(iv.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      sn.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("intervals stem terms: trailing * only, postings widen") {
    // the stem's span set contains the exact term's span set
    def ids(q: String): Set[Long] = QueryDsl.search(docs,
      s"""{"query": {"intervals": {"text": {"match":
           {"query": "$q", "max_gaps": 4, "ordered": true}},
           "id_field": "doc_id"}}, "sort": ["doc_id"],
           "_source": ["doc_id"]}""").collect().map(_.getLong(0)).toSet
    assert(ids("spark join").subsetOf(ids("spark jo*")))
    def bad(q: String): Unit =
      assert(intercept[IllegalArgumentException](ids(q))
        .getMessage.contains("trailing * stem"))
    bad("spark *")
    bad("spark j*n")
    bad("spark *oin")
  }

  test("intervals validates loudly") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"query": {"intervals": {"text": {"match":
           {"query": "a b", "max_gaps": 2}}, "id_field": "doc_id"}}}""",
      "ordered: true only")
    bad("""{"query": {"intervals": {"text": {"match":
           {"query": "a", "max_gaps": 2, "ordered": true}},
           "id_field": "doc_id"}}}""", "2..4 terms")
    bad("""{"query": {"intervals": {"text": {"match":
           {"query": "a b", "max_gaps": 2, "ordered": true}}}}}""",
      "requires id_field")
    bad("""{"query": {"bool": {"must": [{"intervals": {}}]}}}""",
      "request-level")
  }

  test("wrapper decodes to the inline clause; bad payloads fail loud") {
    val b64 = java.util.Base64.getEncoder.encodeToString(
      """{"term": {"lang": "en"}}""".getBytes("UTF-8"))
    val wrapped = QueryDsl.search(docs,
      s"""{"query": {"wrapper": {"query": "$b64"}}, "sort": ["doc_id"]}""")
    val inline = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}}, "sort": ["doc_id"]}""")
    assert(wrapped.collect().toSeq === inline.collect().toSeq)
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"query": {"wrapper": {"query": "!!!not-base64!!!"}}}""",
      "not valid base64")
    val junk = java.util.Base64.getEncoder.encodeToString(
      "{not json".getBytes("UTF-8"))
    bad(s"""{"query": {"wrapper": {"query": "$junk"}}}""", "decode to JSON")
  }

  test("combined_fields / span_first validate loudly") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"query": {"combined_fields": {"query": "a b"}}}""",
      "non-empty fields")
    bad("""{"query": {"combined_fields": {"query": "a b",
           "fields": ["text"], "minimum_should_match": 3}}}""",
      "minimum_should_match must be in [1, 2]")
    bad("""{"query": {"combined_fields": {"query": "  ",
           "fields": ["text"]}}}""", "no terms")
    bad("""{"query": {"span_first": {"match":
           {"span_term": {"text": "the"}}, "end": 0}}}""", "end must be >= 1")
    bad("""{"query": {"span_first": {"end": 3}}}""", "span_first needs")
  }

  test("span_first == prefix-slice membership by hand") {
    val got = QueryDsl.search(docs,
      """{"query": {"span_first": {
           "match": {"span_term": {"text": "the"}}, "end": 3}},
         "sort": ["doc_id"], "_source": ["doc_id"]}""")
    val exp = docs.filter(
      array_contains(slice(split(col("text"), " "), 1, 3), "the"))
      .orderBy("doc_id").select("doc_id")
    assert(got.collect().toSeq === exp.collect().toSeq)
  }

  test("scripted_metric validates its script and reduce loudly") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"aggs": {"a": {"scripted_metric": {
           "map_script": "_score + 1", "reduce": "sum"}}}}""", "no _score")
    bad("""{"aggs": {"a": {"scripted_metric": {
           "map_script": "doc['n_chars'].value", "reduce": "avg"}}}}""",
      "reduce must be sum/min/max")
    bad("""{"aggs": {"a": {"scripted_metric": {
           "map_script": "params.z", "reduce": "sum"}}}}""", "undeclared param")
    bad("""{"aggs": {"a": {"scripted_metric": {
           "map_script": "1 + 1", "reduce": "sum", "init_script": "x"}}}}""",
      "unsupported scripted_metric option")
    // the deterministic shape really aggregates
    val got = QueryDsl.search(docs,
      """{"aggs": {"m": {"scripted_metric": {
           "map_script": "max(doc['n_chars'].value, 100)",
           "reduce": "max"}}}}""").collect().head.getAs[Long]("m")
    val exp = docs.agg(max(greatest(col("n_chars"), lit(100L))))
      .collect().head.getLong(0)
    assert(got === exp)
  }

  test("auto_date_histogram picks the finest unit within the target") {
    val events = Tables.load(spark, sf(), "events")
    // events span ~30 days in one month: buckets=5 must pick month
    val monthly = QueryDsl.search(events,
      """{"aggs": {"h": {"auto_date_histogram":
           {"field": "ts", "buckets": 5}}}}""")
    assert(monthly.select("interval").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("month"))
    assert(monthly.count() <= 5)
    // buckets=40 fits the daily series
    val daily = QueryDsl.search(events,
      """{"aggs": {"h": {"auto_date_histogram":
           {"field": "ts", "buckets": 40}}}}""")
    assert(daily.select("interval").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("day"))
    assert(daily.count() > 5)
    val e = intercept[IllegalArgumentException](QueryDsl.search(events,
      """{"aggs": {"h": {"auto_date_histogram":
           {"field": "ts", "buckets": 0}}}}"""))
    assert(e.getMessage.contains("buckets must be >= 1"))
  }

  test("auto_date_histogram unit choice is cached: repeat requests run zero compile-time jobs") {
    val events = Tables.load(spark, sf(), "events")
    // warm the (table, field) span entry
    QueryDsl.search(events,
      """{"aggs": {"h": {"auto_date_histogram":
           {"field": "ts", "buckets": 40}}}}""").collect()
    val cacheSize = QueryDsl.dateSpanCacheSize
    // a SECOND request on the same (table, field) must trigger no
    // Spark job during COMPILE (the round-7 fix: the unit choice used
    // to rescan the dated column per request) — the only corpus work
    // is the single groupBy when the result executes
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = QueryDsl.search(events,
        """{"aggs": {"h": {"auto_date_histogram":
             {"field": "ts", "buckets": 5}}}}""")
      // listener delivery is async; a short quiesce suffices — a
      // compile-time job would have been SUBMITTED synchronously
      // inside QueryDsl.search, well before this sleep ends
      Thread.sleep(300)
      assert(jobs.get() === 0,
        s"compile must not run corpus jobs (ran ${jobs.get()})")
      assert(QueryDsl.dateSpanCacheSize === cacheSize, "no new cache entry")
      // the executed plan reads the corpus exactly once
      val scans = df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("FileScan"))
      assert(scans === 1, s"expected one FileScan, got $scans")
      // and the span rule still picks month at the tight target
      assert(df.select("interval").distinct().collect()
        .map(_.getString(0)).toSeq === Seq("month"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("dateSpanCache is a capped LRU: distinct freshness keys never grow it past the cap") {
    // the key embeds a source-freshness fingerprint, so a CDC-
    // appending table mints a new key per epoch — the cache must stay
    // bounded (round-9 verdict: the unbounded map was a slow driver
    // leak on a long-lived serving JVM)
    (0 until QueryDsl.dateSpanCacheCap + 50).foreach(i =>
      QueryDsl.dateSpanCachePut(s"evict-spec-key-$i"))
    assert(QueryDsl.dateSpanCacheSize <= QueryDsl.dateSpanCacheCap,
      s"cache grew past the cap (${QueryDsl.dateSpanCacheSize})")
  }

  test("global ignores the query; filter gates sub-aggs on its sub-query") {
    val g = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "qq_nohit"}},
         "aggs": {"bg": {"global": {},
           "aggs": {"n": {"value_count": {"field": "doc_id"}}}}}}""")
      .collect().head
    assert(g.getAs[Long]("doc_count") === docs.count()) // not 0
    assert(g.getAs[Long]("n") === docs.count())
    val f = QueryDsl.search(docs,
      """{"query": {"range": {"n_chars": {"gte": 100}}},
         "aggs": {"en": {"filter": {"term": {"lang": "en"}},
           "aggs": {"s": {"sum": {"field": "n_chars"}}}}}}""").collect().head
    val exp = docs.filter(col("n_chars") >= 100 && col("lang") === "en")
      .agg(count(lit(1)), sum("n_chars")).collect().head
    assert(f.getAs[Long]("doc_count") === exp.getLong(0))
    assert(f.getAs[Long]("s") === exp.getLong(1))
    val e = intercept[IllegalArgumentException](QueryDsl.search(docs,
      """{"aggs": {"bg": {"global": {"field": "x"}}}}"""))
    assert(e.getMessage.contains("empty object"))
  }

  test("geo_polygon validates the ring loudly (convex CCW only)") {
    def bad(pointsJson: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs,
        s"""{"query": {"geo_polygon": {"lat_field": "a", "lon_field": "b",
             "points": $pointsJson}}}"""))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""[{"lat": 0, "lon": 0}, {"lat": 1, "lon": 1}]""", ">= 3 vertices")
    // clockwise square
    bad("""[{"lat": 0, "lon": 0}, {"lat": 1, "lon": 0},
            {"lat": 1, "lon": 1}, {"lat": 0, "lon": 1}]""",
      "counter-clockwise")
    // collinear (degenerate turn)
    bad("""[{"lat": 0, "lon": 0}, {"lat": 0, "lon": 1}, {"lat": 0, "lon": 2}]""",
      "strictly convex")
    // non-convex (dart)
    bad("""[{"lat": 0, "lon": 0}, {"lat": 0, "lon": 4},
            {"lat": 4, "lon": 4}, {"lat": 1, "lon": 1}, {"lat": 4, "lon": 0}]""",
      "strictly convex")
  }

  test("geo_shape: envelope/polygon/point shapes with relations over point docs") {
    import spark.implicits._
    val t = Seq(
      (1L, 0.5, 0.5), (2L, 2.0, 2.0), (3L, 0.0, 0.0), (4L, 1.0, 0.0))
      .toDF("id", "lat", "lon")
    def ids(shape: String, relation: String = "intersects"): Seq[Long] =
      QueryDsl.search(t,
        s"""{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon",
             "shape": $shape, "relation": "$relation"}},
           "sort": ["id"], "_source": ["id"]}""").as[Long].collect().toSeq
    // envelope: [lon, lat] GeoJSON order, [top-left, bottom-right]
    val env = """{"type": "envelope", "coordinates": [[0.0, 1.0], [1.0, 0.0]]}"""
    assert(ids(env) === Seq(1L, 3L, 4L))
    assert(ids(env, "within") === Seq(1L, 3L, 4L)) // == intersects for points
    assert(ids(env, "disjoint") === Seq(2L))
    // polygon: one closed convex CCW ring
    val poly = """{"type": "polygon", "coordinates":
      [[[0.0, 0.0], [3.0, 0.0], [0.0, 3.0], [0.0, 0.0]]]}"""
    assert(ids(poly) === Seq(1L, 3L, 4L)) // (2,2): lat+lon > 3, outside
    assert(ids(poly, "disjoint") === Seq(2L))
    // point shape: exact coordinate equality
    assert(ids("""{"type": "point", "coordinates": [0.5, 0.5]}""") === Seq(1L))
    // boundary counts as intersecting (doc 3/4 on the envelope edge)
    assert(ids(env).contains(3L) && ids(env).contains(4L))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    def badShape(shape: String, frag: String, rel: String = "intersects"): Unit =
      bad(s"""{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon",
        "shape": $shape, "relation": "$rel"}}}""", frag)
    // contains on point docs: a point contains only a zero-area query
    // shape — point query = equality (== intersects for points), a
    // degenerate envelope reduces to its coordinate, a true-area
    // envelope/polygon matches nothing (exact empty, not an error)
    assert(ids("""{"type": "point", "coordinates": [0.5, 0.5]}""",
      "contains") === Seq(1L))
    assert(ids("""{"type": "envelope",
      "coordinates": [[2.0, 2.0], [2.0, 2.0]]}""", "contains") === Seq(2L))
    assert(ids(env, "contains") === Seq.empty)
    assert(ids(poly, "contains") === Seq.empty)
    badShape(env, "relation must be", "overlaps")
    // circle is a real type now (r14); a radius-less one fails loud,
    // an unknown type names the full menu
    badShape("""{"type": "circle", "coordinates": [0, 0]}""",
      "circle requires a radius")
    badShape("""{"type": "blob", "coordinates": [0, 0]}""",
      "type must be envelope, polygon, multipolygon, circle, " +
        "geometrycollection or point")
    badShape("""{"type": "envelope", "coordinates": [[0, 0], [1, 1]]}""",
      "top lat")                            // top-left below bottom-right
    badShape("""{"type": "polygon", "coordinates":
      [[[0.0, 0.0], [3.0, 0.0], [0.0, 3.0], [1.0, 1.0]]]}""",
      "must be closed")
    // a CLOCKWISE convex ring is no longer an error: it routes to the
    // orientation-independent crossing walk and selects the same
    // interior (boundary via parity — these docs are interior/edge
    // points the walk also admits)
    assert(ids("""{"type": "polygon", "coordinates":
      [[[0.0, 0.0], [0.0, 3.0], [3.0, 0.0], [0.0, 0.0]]]}""") === Seq(1L, 3L, 4L))
    bad("""{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon",
      "shape": {"type": "point", "coordinates": [0, 0]}, "boost": 2}}}""",
      "unsupported geo_shape option 'boost'")
    bad("""{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon"}}}""",
      "requires a shape")
  }

  test("geo_shape concave polygons run the even-odd crossing walk") {
    import spark.implicits._
    // chevron [[0,0],[40,0],[40,40],[20,15],[0,40]] (GeoJSON lon,lat):
    // the notch at (20,15) makes it concave — (20,25) sits in the
    // notch (outside), (20,5) below the notch (inside)
    val t = Seq(
      (1L, 5.0, 20.0),   // inside, low center
      (2L, 25.0, 20.0),  // in the notch: outside
      (3L, 20.0, 38.0),  // right arm: inside
      (4L, 50.0, 20.0),  // above everything: outside
      (5L, 20.0, -5.0))  // left of the ring: outside
      .toDF("id", "lat", "lon")
    val chevron = """{"type": "polygon", "coordinates":
      [[[0.0, 0.0], [40.0, 0.0], [40.0, 40.0],
        [20.0, 15.0], [0.0, 40.0], [0.0, 0.0]]]}"""
    def ids(rel: String): Seq[Long] = QueryDsl.search(t,
      s"""{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon",
           "shape": $chevron, "relation": "$rel"}},
         "sort": ["id"], "_source": ["id"]}""").as[Long].collect().toSeq
    assert(ids("intersects") === Seq(1L, 3L))
    assert(ids("disjoint") === Seq(2L, 4L, 5L))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    // self-intersecting (bow-tie) rings fail loud on the driver
    bad("""{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon",
      "shape": {"type": "polygon", "coordinates":
        [[[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0], [0.0, 0.0]]]}}}}""",
      "self-intersecting")
  }

  test("geo_shape doc_shape: envelope documents with all four relations") {
    import spark.implicits._
    // doc boxes: (1) inside the query box, (2) overlapping its edge,
    // (3) covering it entirely, (4) disjoint, (5) touching the corner
    val t = Seq(
      (1L, 1.0, 2.0, 1.0, 2.0),
      (2L, 2.0, 6.0, 2.0, 6.0),
      (3L, -1.0, 9.0, -1.0, 9.0),
      (4L, 20.0, 30.0, 20.0, 30.0),
      (5L, 5.0, 8.0, 5.0, 8.0))
      .toDF("id", "la0", "la1", "lo0", "lo1")
    // query envelope: lat 0..5, lon 0..5
    def ids(rel: String, shape: String =
        """{"type": "envelope", "coordinates": [[0.0, 5.0], [5.0, 0.0]]}"""): Seq[Long] =
      QueryDsl.search(t,
        s"""{"query": {"geo_shape": {
             "doc_shape": {"type": "envelope",
               "lat_min_field": "la0", "lat_max_field": "la1",
               "lon_min_field": "lo0", "lon_max_field": "lo1"},
             "shape": $shape, "relation": "$rel"}},
           "sort": ["id"], "_source": ["id"]}""").as[Long].collect().toSeq
    assert(ids("intersects") === Seq(1L, 2L, 3L, 5L)) // 5 touches the corner
    assert(ids("within") === Seq(1L))
    assert(ids("contains") === Seq(3L))               // the only box covering it
    assert(ids("disjoint") === Seq(4L))
    // point query shape: the degenerate box
    val pt = """{"type": "point", "coordinates": [1.5, 1.5]}"""
    assert(ids("intersects", pt) === Seq(1L, 3L))
    assert(ids("contains", pt) === Seq(1L, 3L))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    def docQ(extra: String): String =
      s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "envelope",
             "lat_min_field": "la0", "lat_max_field": "la1",
             "lon_min_field": "lo0", "lon_max_field": "lo1"},
           $extra}}}"""
    bad(docQ(""""shape": {"type": "polygon", "coordinates":
      [[[0.0, 0.0], [3.0, 0.0], [0.0, 3.0], [0.0, 0.0]]]}"""),
      "envelope or point query shapes")
    bad(s"""{"query": {"geo_shape": {"lat_field": "la0",
         "doc_shape": {"type": "envelope",
           "lat_min_field": "la0", "lat_max_field": "la1",
           "lon_min_field": "lo0", "lon_max_field": "lo1"},
         "shape": $pt}}}""",
      "doc_shape replaces lat_field/lon_field")
    bad(docQ(s""""shape": $pt, "relation": "overlaps""""),
      "relation must be intersects, within, contains or disjoint")
    bad(docQ(s""""shape": $pt""").replace(""""lat_max_field": "la1",""", ""),
      "doc_shape envelope requires lat_max_field")
    bad(docQ(s""""shape": $pt""").replace(""""type": "envelope"""",
      """"type": "circle""""), "doc_shape type must be envelope")
  }

  test("_script sort orders by a compiled script column; track_scores is inert") {
    import spark.implicits._
    val t = Seq((1L, 10L, 3L), (2L, 5L, 1L), (3L, 7L, 100L))
      .toDF("id", "a", "b")
    // a*m − b ascending — 1: 10·2−3=17, 2: 5·2−1=9, 3: 7·2−100=−86
    val sorted = QueryDsl.search(t,
      """{"query": {"match_all": {}},
         "sort": [{"_script": {"type": "number",
           "script": {"source": "doc['a'].value * params.m - doc['b'].value",
             "params": {"m": 2}},
           "order": "asc"}}, "id"],
         "_source": ["id"]}""").as[Long].collect().toSeq
    assert(sorted === Seq(3L, 2L, 1L))
    // track_scores: accepted boolean, score column unchanged either way
    val withFlag = QueryDsl.search(t,
      """{"query": {"term": {"id": 1}}, "track_scores": true,
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(withFlag === Seq((1L, 1L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"match_all": {}}, "track_scores": "yes"}""",
      "track_scores must be a boolean")
    bad("""{"query": {"match_all": {}}, "sort": [{"_script": {
      "script": {"source": "doc['a'].value"}}}]}""", "requires type: number")
    bad("""{"query": {"match_all": {}}, "sort": [{"_script": {
      "type": "string", "script": {"source": "doc['a'].value"}}}]}""",
      "type must be 'number'")
    bad("""{"query": {"match_all": {}}, "sort": [{"_script": {
      "type": "number", "script": {"source": "_score * 2"}}}]}""",
      "cannot reference _score")
    bad("""{"query": {"match_all": {}}, "sort": [{"_script": {
      "type": "number", "script": {"source": "doc['a'].value"},
      "mode": "min"}}]}""",
      "unsupported _script sort option 'mode'")
  }

  test("terms order by sub-metric / _key / _count; validates loudly") {
    val byKey = QueryDsl.search(docs,
      """{"aggs": {"l": {"terms": {"field": "lang",
           "order": {"_key": "asc"}}}}}""")
      .select("l").collect().map(_.getString(0)).toSeq
    assert(byKey === byKey.sorted)
    val byCountAsc = QueryDsl.search(docs,
      """{"aggs": {"l": {"terms": {"field": "lang",
           "order": {"_count": "asc"}}}}}""")
      .select("doc_count").collect().map(_.getLong(0)).toSeq
    assert(byCountAsc === byCountAsc.sorted)
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"aggs": {"l": {"terms": {"field": "lang",
           "order": {"nope": "desc"}}}}}""", "names no metric")
    bad("""{"aggs": {"l": {"terms": {"field": "lang",
           "order": {"_count": "down"}}}}}""", "must be asc/desc")
    bad("""{"aggs": {"l": {"terms": {"field": "lang",
             "order": {"_count": "desc"}},
           "aggs": {"b": {"bucket_sort": {"size": 2}}}}}}""",
      "use bucket_sort instead")
  }

  test("_termvectors: per-term stats of one doc, optional positions/corpus stats") {
    import spark.implicits._
    val t = Seq(
      (1L, "big apple big pie"),
      (2L, "apple tart"),
      (3L, "BIG Apple!")).toDF("id", "text")
    // base: term + term_freq only, sorted by term
    val base = QueryDsl.termvectors(t,
      """{"id_field": "id", "id": 1, "field": "text"}""")
    assert(base.columns.toSeq === Seq("term", "term_freq"))
    assert(base.as[(String, Long)].collect().toSeq ===
      Seq(("apple", 1L), ("big", 2L), ("pie", 1L)))
    // positions: 0-based, comma-joined, sorted
    val withPos = QueryDsl.termvectors(t,
      """{"id_field": "id", "id": 1, "field": "text", "positions": true}""")
      .as[(String, Long, String)].collect().toSeq
    assert(withPos === Seq(("apple", 1L, "1"), ("big", 2L, "0,2"),
      ("pie", 1L, "3")))
    // term_statistics: corpus doc_freq / ttf
    val stats = QueryDsl.termvectors(t,
      """{"id_field": "id", "id": 1, "field": "text",
         "term_statistics": true}""")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(stats === Seq(("apple", 1L, 2L, 2L), ("big", 2L, 1L, 2L),
      ("pie", 1L, 1L, 1L)))
    // analyzer: the standard twin folds case/punctuation corpus-wide
    val analyzed = QueryDsl.termvectors(t,
      """{"id_field": "id", "id": 3, "field": "text",
         "analyzer": "standard", "term_statistics": true}""")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(analyzed === Seq(("apple", 1L, 3L, 3L), ("big", 1L, 2L, 3L)))
    def bad(req: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.termvectors(t, req))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"id_field": "id", "id": 9, "field": "text"}""", "no row with id")
    bad("""{"id_field": "text", "id": "x", "field": "text"}""", "no row")
    bad("""{"id": 1, "field": "text"}""", "requires id_field")
    bad("""{"id_field": "id", "field": "text"}""", "requires an id")
    bad("""{"id_field": "id", "id": 1}""", "requires a field")
    bad("""{"id_field": "id", "id": 1, "field": "text", "offsets": true}""",
      "unsupported _termvectors request key 'offsets'")
    bad("""{"id_field": "id", "id": 1, "field": "text", "positions": 1}""",
      "positions must be a boolean")
    val dup = t.union(t)
    val e = intercept[IllegalArgumentException](QueryDsl.termvectors(dup,
      """{"id_field": "id", "id": 1, "field": "text"}"""))
    assert(e.getMessage.contains("not unique"))
  }

  test("_validate reports compile/analysis errors as data, not throws") {
    assert(QueryDsl.validateRequest(docs,
      """{"query": {"term": {"lang": "en"}}}""") === (true, None))
    val (ok1, msg1) = QueryDsl.validateRequest(docs,
      """{"query": {"geo_circle": {}}}""")
    assert(!ok1 && msg1.exists(_.contains("unsupported query clause")))
    val (ok2, msg2) = QueryDsl.validateRequest(docs,
      """{"query": {"term": {"no_such_column": 1}}}""")
    assert(!ok2 && msg2.isDefined) // analysis error surfaces too
  }

  test("review-fix regressions: _score token check, null dates, bounds") {
    // "params.base_score" contains the _score SUBSTRING but not the
    // token — must compile (the substring check was the bug)
    val ok = QueryDsl.search(docs,
      """{"query": {"script_score": {
           "query": {"dis_max": {"queries": [{"term": {"lang": "en"}}]}},
           "script": {"source": "params.base_score + 1",
                      "params": {"base_score": 5}}}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""")
    assert(ok.collect().forall(_.getLong(1) === 6L))
    val okMetric = QueryDsl.search(docs,
      """{"aggs": {"m": {"scripted_metric": {
           "map_script": "doc['n_chars'].value", "reduce": "max"}}}}""")
    assert(okMetric.count() === 1)
    // auto_date_histogram omits NULL-dated docs (no NULL bucket)
    val events = Tables.load(spark, sf(), "events")
      .withColumn("ts2", when(col("event_id") % 5 === 0,
        lit(null).cast("timestamp")).otherwise(col("ts")))
    val buckets = QueryDsl.search(events,
      """{"aggs": {"h": {"auto_date_histogram":
           {"field": "ts2", "buckets": 40}}}}""")
    assert(buckets.filter(col("h").isNull).count() === 0)
    // bucket_sort size bound fails loud in the grammar, not in Spark
    val e = intercept[IllegalArgumentException](QueryDsl.search(docs,
      """{"aggs": {"l": {"terms": {"field": "lang"},
           "aggs": {"b": {"bucket_sort": {"size": -3}}}}}}"""))
    assert(e.getMessage.contains("size must be >= 1"))
    // extended_stats overflow guard leaves in-bound values untouched
    val es = QueryDsl.search(docs,
      """{"aggs": {"c": {"extended_stats": {"field": "n_chars"}}}}""")
      .collect().head
    assert(es.getAs[Double]("c_variance") >= 0.0)
  }

  test("_validate runs zero corpus work (0-limit plan) and stays correct") {
    // a request whose compilation would scan the corpus
    // (auto_date_histogram's unit choice) must validate instantly
    val events = Tables.load(spark, sf(), "events")
    assert(QueryDsl.validateRequest(events,
      """{"aggs": {"h": {"auto_date_histogram": {"field": "ts"}}}}""")
      === (true, None))
  }

  test("fixed_interval / terms missing / _mget validate and behave") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"aggs": {"h": {"date_histogram": {"field": "ts",
           "calendar_interval": "day", "fixed_interval": "7d"}}}}""",
      "calendar_interval OR fixed_interval")
    bad("""{"aggs": {"h": {"date_histogram": {"field": "ts",
           "fixed_interval": "7w"}}}}""", "must match <n>[dhms]")
    bad("""{"aggs": {"h": {"date_histogram": {"field": "ts",
           "fixed_interval": "0d"}}}}""", "must be positive")
    // missing bucket folds NULL keys into the label
    val d = docs.withColumn("opt",
      when(col("doc_id") % 3 === 0, lit(null).cast("string"))
        .otherwise(col("source")))
    val withMissing = QueryDsl.search(d,
      """{"aggs": {"s": {"terms": {"field": "opt", "missing": "(none)"}}}}""")
    val noneRow = withMissing.filter(col("s") === "(none)").collect()
    assert(noneRow.length === 1)
    assert(noneRow.head.getAs[Long]("doc_count") ===
      d.filter(col("opt").isNull).count())
    // _mget: request order, absent ids absent, duplicate ids loud
    val got = QueryDsl.mget(docs,
      """{"id_field": "doc_id", "ids": [5, 999999, 2, 11]}""")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(5L, 2L, 11L))
    val e = intercept[IllegalArgumentException](QueryDsl.mget(docs,
      """{"id_field": "doc_id", "ids": [1, 1]}"""))
    assert(e.getMessage.contains("ids repeat"))
  }

  test("histogram min_doc_count 0: dense series, bounds rules, caps") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"aggs": {"h": {"histogram": {"field": "n_chars",
           "interval": 50, "extended_bounds": {"min": 0, "max": 100}}}}}""",
      "requires min_doc_count: 0")
    bad("""{"aggs": {"h": {"histogram": {"field": "n_chars",
           "interval": 50, "min_doc_count": 0,
           "extended_bounds": {"min": 100, "max": 0}}}}}""",
      "integer min <= max")
    bad("""{"aggs": {"h": {"histogram": {"field": "n_chars",
           "interval": 1, "min_doc_count": 0,
           "extended_bounds": {"min": 0, "max": 10000000}}}}}""",
      "cap 100000")
    bad("""{"aggs": {"h": {"histogram": {"field": "n_chars",
           "interval": 0.5, "min_doc_count": 0}}}}""", "integer interval")
    // data-derived bounds: every interval step between data min/max
    // appears, empties carry doc_count 0 and NULL sub-metrics
    val dense = QueryDsl.search(docs,
      """{"aggs": {"h": {"histogram": {"field": "n_chars",
           "interval": 25, "min_doc_count": 0},
         "aggs": {"s": {"sum": {"field": "n_chars"}},
                  "c": {"cumulative_sum": {"buckets_path": "_count"}}}}}}""")
      .collect()
    val keys = dense.map(_.getLong(0))
    assert(keys.toSeq === (keys.min to keys.max by 25L).toSeq) // dense
    val empties = dense.filter(_.getAs[Long]("doc_count") == 0L)
    assert(empties.forall(_.isNullAt(2))) // sub-metric NULL on empty
    // cumulative_sum over the filled series ends at the corpus total
    assert(dense.last.getAs[Long]("c") === docs.count())
  }

  test("composite derived sources: keyset paging on the bucket key; rules") {
    // histogram source pages by the DERIVED key: after the first page's
    // last key, the next page starts strictly beyond it
    val page1 = QueryDsl.search(docs,
      """{"aggs": {"p": {"composite": {"size": 3, "sources": [
           {"bucket": {"histogram": {"field": "n_chars", "interval": 100}}}]}}}}""")
      .collect()
    val lastKey = page1.last.getLong(0)
    val page2 = QueryDsl.search(docs,
      s"""{"aggs": {"p": {"composite": {"size": 3, "sources": [
           {"bucket": {"histogram": {"field": "n_chars", "interval": 100}}}],
           "after": {"bucket": $lastKey}}}}}""").collect()
    assert(page2.forall(_.getLong(0) > lastKey))
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"aggs": {"p": {"composite": {"sources": [
           {"n_chars": {"histogram": {"field": "n_chars", "interval": 100}}}]}}}}""",
      "collides with a column")
    bad("""{"aggs": {"p": {"composite": {"sources": [
           {"b": {"histogram": {"field": "n_chars"}}}]}}}}""",
      "positive integer interval")
    bad("""{"aggs": {"p": {"composite": {"sources": [
           {"b": {"geo_grid": {"field": "n_chars"}}}]}}}}""",
      "kind must be")
    bad("""{"aggs": {"p": {"composite": {"sources": [
           {"b": {"histogram": {"field": "n_chars", "interval": 100}}},
           {"b": {"histogram": {"field": "doc_id", "interval": 5}}}]}}}}""",
      "repeats a source name")
  }

  test("new agg families plan ONE hash shuffle (plan-pinned)") {
    def hashExchanges(json: String): Int = {
      val plan = QueryDsl.search(docs, json)
        .queryExecution.executedPlan.toString
      "Exchange hashpartitioning".r.findAllIn(plan).size
    }
    // multi_terms: one groupBy on the composite key, never a join of
    // per-field terms tables
    assert(hashExchanges(
      """{"aggs": {"p": {"multi_terms": {"terms":
           [{"field": "lang"}, {"field": "source"}]}}}}""") === 1)
    // terms order-by-metric: the re-rank runs on the bounded bucket
    // table, no extra keyed shuffle
    assert(hashExchanges(
      """{"aggs": {"l": {"terms": {"field": "lang",
           "order": {"m": "desc"}},
         "aggs": {"m": {"avg": {"field": "n_chars"}}}}}}""") === 1)
    // significant_text: one token groupBy; the totals ride along as a
    // broadcast single-partition aggregate, not a second keyed shuffle
    assert(hashExchanges(
      """{"query": {"term": {"lang": "en"}},
         "aggs": {"s": {"significant_text": {"field": "text"}}}}""") === 1)
  }

  test("sampler / boxplot / string_stats validate and behave") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"aggs": {"s": {"sampler": {"shard_size": 10}}}}""",
      "needs a tiebreak")
    bad("""{"aggs": {"s": {"sampler": {"shard_size": 0,
           "tiebreak": "doc_id"}}}}""", "shard_size must be >= 1")
    // boxplot is a metric: composes with other metrics in one row
    val row = QueryDsl.search(docs,
      """{"aggs": {"b": {"boxplot": {"field": "n_chars"}},
           "other": {"avg": {"field": "n_chars"}}}}""").collect().head
    assert(row.getAs[Long]("b_min") <= row.getAs[Double]("b_q2").toLong)
    assert(row.getAs[Double]("b_q2").toLong <= row.getAs[Long]("b_max"))
  }

  test("sampler bounds the aggregated set; string_stats entropy is stable") {
    // with shard_size >= matching hits, sampler == plain filter agg
    val all = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}},
         "aggs": {"s": {"sampler": {"shard_size": 100000, "tiebreak": "doc_id"},
           "aggs": {"m": {"max": {"field": "n_chars"}}}}}}""").collect().head
    val exp = docs.filter(col("lang") === "en")
      .agg(count(lit(1)), max("n_chars")).collect().head
    assert(all.getAs[Long]("doc_count") === exp.getLong(0))
    assert(all.getAs[Long]("m") === exp.getLong(1))
    // a tight sample is exactly shard_size docs
    val top = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}},
         "aggs": {"s": {"sampler": {"shard_size": 7, "tiebreak": "doc_id"}}}}""")
      .collect().head
    assert(top.getAs[Long]("doc_count") === 7L)
    // string_stats entropy of a uniform 1-char alphabet is 0
    val one = docs.limit(3).select(lit("aaaa").as("t"))
    val st = QueryDsl.search(one,
      """{"aggs": {"x": {"string_stats": {"field": "t"}}}}""").collect().head
    assert(st.getAs[Double]("entropy") === 0.0)
    assert(st.getAs[Long]("min_length") === 4L)
  }

  test("review-fix regressions 2: interval/bounds/tiebreak/null-key guards") {
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    // interval 0 must fail on EVERY histogram path, not just mdc=0
    bad("""{"aggs": {"h": {"histogram": {"field": "n_chars", "interval": 0}}}}""",
      "interval must be positive")
    // beyond-Long extended_bounds fail instead of wrapping silent
    bad("""{"aggs": {"h": {"histogram": {"field": "n_chars", "interval": 50,
           "min_doc_count": 0,
           "extended_bounds": {"min": 0, "max": 9223372036854775808}}}}}""",
      "fit in a 64-bit long")
    // terms options that the top_hits window path would ignore: loud
    bad("""{"aggs": {"t": {"terms": {"field": "lang", "missing": "(none)"},
           "aggs": {"h": {"top_hits": {"size": 1, "sort": ["doc_id"],
             "_source": ["doc_id"]}}}}}}""",
      "unsupported terms option 'missing' with a top_hits")
    // a NULL-keyed doc never reaches the filled dense series
    val d = docs.withColumn("opt_chars",
      when(col("doc_id") % 4 === 0, lit(null).cast("long"))
        .otherwise(col("n_chars")))
    val filled = QueryDsl.search(d,
      """{"aggs": {"h": {"histogram": {"field": "opt_chars",
           "interval": 100, "min_doc_count": 0}}}}""")
    assert(filled.filter(col("h").isNull).count() === 0)
    // sampler with a non-unique tiebreak fires the determinism guard
    val e = intercept[Exception](QueryDsl.search(docs,
      """{"query": {"match_all": {}},
         "aggs": {"s": {"sampler": {"shard_size": 5,
           "tiebreak": "lang"}}}}""").collect())
    assert(e.getMessage.contains("not unique at"), e.getMessage)
  }

  test("review-fix regressions 3: sampler cut straddle, int moments, msm, tokens") {
    import spark.implicits._
    // a (score, tiebreak) duplicate STRADDLING the shard_size cut
    // (ranks n and n+1) must fire the guard: exactly one copy lands in
    // the sample, so an in-sample-only check would pass while sub-agg
    // metrics over other fields stay partition-order dependent
    val straddle = Seq(
      ("a", 10L, 1L), ("b", 10L, 2L), ("c", 5L, 3L), ("c2", 5L, 3L),
      ("d", 1L, 9L))
      .toDF("id", "n", "tb")
    val e1 = intercept[Exception](QueryDsl.search(straddle,
      """{"query": {"range": {"n": {"gte": 0}}},
         "aggs": {"s": {"sampler": {"shard_size": 3, "tiebreak": "tb"},
           "aggs": {"m": {"sum": {"field": "n"}}}}}}""").collect())
    assert(e1.getMessage.contains("not unique at"), e1.getMessage)
    // ...but a duplicate entirely BEYOND the cut is harmless
    val beyond = Seq(
      ("a", 10L, 1L), ("b", 9L, 2L), ("c", 5L, 3L), ("c2", 5L, 3L))
      .toDF("id", "n", "tb")
    val ok = QueryDsl.search(beyond,
      """{"query": {"range": {"n": {"gte": 0}}},
         "aggs": {"s": {"sampler": {"shard_size": 2, "tiebreak": "tb"},
           "aggs": {"m": {"sum": {"field": "n"}}}}}}""").collect().head
    assert(ok.getAs[Long]("doc_count") === 2L && ok.getAs[Long]("m") === 19L)
    // extended_stats over an IntegerType field with |x| >= 46341 used
    // to square in 32-bit and silently wrap; the long-cast moments are
    // exact (100000² = 1e10 > Int.Max)
    val ints = Seq(100000, 100000, 100000).toDF("v")
      .select(col("v").cast("int").as("v"))
    val es = QueryDsl.search(ints,
      """{"aggs": {"c": {"extended_stats": {"field": "v"}}}}""").collect().head
    assert(es.getAs[Long]("c_sum_of_squares") === 30000000000L)
    assert(es.getAs[Double]("c_variance") === 0.0)
    // match minimum_should_match < 1 fails loud (negative-msm syntax
    // must never be silently reinterpreted as the and-operator sentinel)
    val e2 = intercept[IllegalArgumentException](QueryDsl.search(docs,
      """{"query": {"match": {"text":
           {"query": "spark join", "minimum_should_match": -1}}}}"""))
    assert(e2.getMessage.contains("must be >= 1"), e2.getMessage)
    // significant_text never surfaces the "" token from double spaces
    val spaced = Seq(("x  y", true), ("x z", true), ("q r", false))
      .toDF("text", "flag")
    val st = QueryDsl.search(spaced,
      """{"query": {"term": {"flag": true}},
         "aggs": {"s": {"significant_text": {"field": "text"}}}}""")
    assert(st.filter(col("s") === "").count() === 0)
    assert(st.filter(col("s") === "x").count() === 1)
  }

  test("named queries: matched_queries per hit, sorted, unique, fail-loud") {
    import spark.implicits._
    val rows = Seq(
      (1L, "spark join fast", "en"), (2L, "the batch", "en"),
      (3L, "sort merge", "fr"), (4L, "spark alone", "fr"))
      .toDF("id", "t", "lang")
    val hits = QueryDsl.search(rows,
      """{"query": {"bool": {
           "must": [{"exists": {"field": "t", "_name": "has_text"}}],
           "should": [
             {"match": {"t": {"query": "spark join", "_name": "sj"}}},
             {"term": {"lang": {"value": "en", "_name": "english"}}}]}},
         "sort": ["id"], "_source": ["id", "matched_queries"]}""")
      .as[(Long, String)].collect().toSeq
    assert(hits === Seq(
      (1L, "english,has_text,sj"),
      (2L, "english,has_text"),
      (3L, "has_text"),
      (4L, "has_text,sj")))
    // a must_not name can never surface on a surviving hit
    val mn = QueryDsl.search(rows,
      """{"query": {"bool": {
           "must_not": [{"term": {"lang": {"value": "fr", "_name": "french"}}}],
           "must": [{"exists": {"field": "t", "_name": "has_text"}}]}},
         "sort": ["id"], "_source": ["id", "matched_queries"]}""")
      .as[(Long, String)].collect().toSeq
    assert(mn === Seq((1L, "has_text"), (2L, "has_text")))
    // dis_max / constant_score / range carry names through too
    val dm = QueryDsl.search(rows,
      """{"query": {"dis_max": {"queries": [
           {"term": {"lang": {"value": "en", "_name": "en_arm"}}},
           {"constant_score": {"filter":
             {"range": {"id": {"gte": 4, "_name": "tail"}}}, "boost": 2}}]}},
         "sort": ["id"], "_source": ["id", "matched_queries"]}""")
      .as[(Long, String)].collect().toSeq
    assert(dm === Seq((1L, "en_arm"), (2L, "en_arm"), (4L, "tail")))
    // duplicate names fail loud; _name must be a non-empty string;
    // no named clause → no matched_queries column at all
    val e1 = intercept[IllegalArgumentException](QueryDsl.search(rows,
      """{"query": {"bool": {"should": [
           {"term": {"lang": {"value": "en", "_name": "x"}}},
           {"term": {"lang": {"value": "fr", "_name": "x"}}}]}}}"""))
    assert(e1.getMessage.contains("duplicate _name"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](QueryDsl.search(rows,
      """{"query": {"term": {"lang": {"value": "en", "_name": ""}}}}"""))
    assert(e2.getMessage.contains("_name must be a non-empty string"), e2.getMessage)
    val plain = QueryDsl.search(rows,
      """{"query": {"term": {"lang": "en"}}, "sort": ["id"]}""")
    assert(!plain.columns.contains("matched_queries"))
  }

  test("range date math: rounding per bound type, deterministic now, fail-loud") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2023-12-31 23:59:59"), (2L, "2024-01-01 00:00:00"),
      (3L, "2024-01-15 12:30:00"), (4L, "2024-01-31 23:59:59"),
      (5L, "2024-02-01 00:00:00"), (6L, "2024-02-10 08:00:00"))
      .toDF("id", "s").select(col("id"), col("s").cast("timestamp").as("ts"))
    def ids(json: String): Seq[Long] =
      QueryDsl.search(ev, json).as[Long].collect().toSeq
    val src = """"sort": ["id"], "_source": ["id"]"""
    // gte /M rounds DOWN (start of month), lte /M includes the unit
    assert(ids(s"""{"query": {"range": {"ts":
      {"gte": "now/M", "lte": "now/M", "now": "2024-01-20T10:00:00"}}}, $src}""")
      === Seq(2L, 3L, 4L))
    // lt /M excludes the ENTIRE month; gt /M means beyond it
    assert(ids(s"""{"query": {"range": {"ts":
      {"lt": "now/M", "now": "2024-01-20T10:00:00"}}}, $src}""") === Seq(1L))
    assert(ids(s"""{"query": {"range": {"ts":
      {"gt": "now/M", "now": "2024-01-20T10:00:00"}}}, $src}""") === Seq(5L, 6L))
    // chained ops with an absolute anchor: 2024-02-15 −1M −5d = Jan 10
    assert(ids(s"""{"query": {"range": {"ts":
      {"gte": "2024-02-15||-1M-5d/d"}}}, $src}""") === Seq(3L, 4L, 5L, 6L))
    // /w floors to the ISO Monday (2024-01-15 is a Monday)
    assert(ids(s"""{"query": {"range": {"ts":
      {"gte": "now/w", "now": "2024-01-17T09:00:00"}}}, $src}""")
      === Seq(3L, 4L, 5L, 6L))
    // no rounding: exact instant comparison
    assert(ids(s"""{"query": {"range": {"ts":
      {"gt": "now", "now": "2024-01-31T23:59:59"}}}, $src}""") === Seq(5L, 6L))
    // fail-loud: now-anchored without "now"; malformed math; bad unit
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(ev, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"query": {"range": {"ts": {"gte": "now-7d/d"}}}}""",
      "needs a sibling \"now\"")
    bad("""{"query": {"range": {"ts": {"gte": "now-7x/d",
      "now": "2024-01-20T10:00:00"}}}}""", "malformed op section")
    bad("""{"query": {"range": {"ts": {"gte": "now/q",
      "now": "2024-01-20T10:00:00"}}}}""", "rounding unit must be")
    bad("""{"query": {"range": {"ts": {"gte": "now-7d",
      "now": "2024-02-30"}}}}""", "not an ISO date")
    bad("""{"query": {"range": {"ts": {"gte": "2024-01-20||*3d"}}}}""",
      "malformed op section")
    // the literal bound pushes to the scan as a plain comparison
    val plan = QueryDsl.search(Tables.load(spark, sf(), "events"),
      """{"query": {"range": {"ts": {"gte": "now-7d/d",
           "now": "2024-01-25T13:47:11"}}}, "_source": ["event_id"]}""")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(ts"),
      plan.take(2000))
  }

  test("date-math detection: lexicographic string bounds stay raw comparisons") {
    import spark.implicits._
    // a string range whose bound HAPPENS to start with "now" or contain
    // "||" must keep the historical raw comparison, not detour into the
    // date-math parser and fail loud (the ADVICE r8 finding)
    val t = Seq((1L, "alpha"), (2L, "nowhere"), (3L, "nowt"), (4L, "x||y"))
      .toDF("id", "s")
    assert(QueryDsl.search(t,
      """{"query": {"range": {"s": {"gte": "nowhere"}}},
         "sort": ["id"], "_source": ["id"]}""")
      .as[Long].collect().toSeq === Seq(2L, 3L, 4L))
    // '|' (0x7c) sorts above 'l', so "alpha" < "a||b" — the point is
    // the bound COMPILES as a raw comparison instead of failing loud
    assert(QueryDsl.search(t,
      """{"query": {"range": {"s": {"gte": "a||b"}}},
         "sort": ["id"], "_source": ["id"]}""")
      .as[Long].collect().toSeq === Seq(2L, 3L, 4L))
    // detection still engages for the real forms
    assert(DateMath.isDateMath("now"))
    assert(DateMath.isDateMath("now-7d/d"))
    assert(DateMath.isDateMath("now/M"))
    assert(DateMath.isDateMath("2024-01-20||/d"))
    assert(DateMath.isDateMath("2024-01-20T10:00:00||+1d"))
    assert(!DateMath.isDateMath("nowhere"))
    assert(!DateMath.isDateMath("nowt-7d"))
    assert(!DateMath.isDateMath("x||y"))
    assert(!DateMath.isDateMath("presented||recorded"))
  }

  test("_name rides as a body-level sibling on array-valued terms") {
    import spark.implicits._
    // {"terms": {"lang": [...], "_name": x}} — the OpenSearch placement
    // when the field's value is an array and can't carry options
    val hits = QueryDsl.search(docs,
      """{"query": {"bool": {
           "must": [{"range": {"n_chars": {"gte": 100}}}],
           "should": [{"terms": {"lang": ["en", "fr"], "_name": "euro"}}]}},
         "sort": ["doc_id"], "size": 40,
         "_source": ["doc_id", "lang", "matched_queries"]}""")
      .as[(Long, String, String)].collect().toSeq
    assert(hits.nonEmpty)
    hits.foreach { case (_, lang, mq) =>
      if (lang == "en" || lang == "fr") assert(mq === "euro")
      else assert(mq === "")
    }
    // duplicate names across placements still fail loud
    val e = intercept[IllegalArgumentException](QueryDsl.search(docs,
      """{"query": {"bool": {"should": [
           {"terms": {"lang": ["en"], "_name": "x"}},
           {"term": {"source": {"value": "src1", "_name": "x"}}}]}}}"""))
    assert(e.getMessage.contains("duplicate _name"), e.getMessage)
  }

  test("extended_stats fails loud on fractional fields (silent long-cast forbidden)") {
    import spark.implicits._
    val t = Seq((1L, 1.5), (2L, 2.25)).toDF("id", "v")
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"aggs": {"s": {"extended_stats": {"field": "v"}}}}"""))
    assert(e.getMessage.contains("requires an integral field"), e.getMessage)
    // integral fields keep working
    val ok = QueryDsl.search(t,
      """{"aggs": {"s": {"extended_stats": {"field": "id"}}}}""").collect().head
    assert(ok.getAs[Long]("s_sum") === 3L)
  }

  test("auto_date_histogram sizes its unit from the FILTERED hits") {
    import spark.implicits._
    // table spans ~3 years; the query filters to 8 days. The unit must
    // come from the hit set (day), not the table (year/month) — the
    // OpenSearch contract (ADVICE r8)
    val rows = (0 until 1000).map(i =>
      (i.toLong, s"2022-01-01 00:00:00")) ++ Seq((9990L, "2024-12-30 00:00:00")) ++
      (0 until 8).map(i => (9000L + i, f"2024-06-${i + 1}%02d 12:00:00"))
    val t = rows.toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp").as("ts"))
    val narrow = QueryDsl.search(t,
      """{"query": {"range": {"ts": {"gte": "2024-06-01||", "lt": "2024-06-09||"}}},
         "aggs": {"h": {"auto_date_histogram": {"field": "ts", "buckets": 10}}}}""")
    assert(narrow.select("interval").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("day"))
    assert(narrow.count() === 8L)
  }

  test("dateSpanCache re-derives the span when the source files change") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_span").toString
    (0 until 20).map(i => (i.toLong, "2024-03-01 00:00:00")).toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp").as("ts"))
      .write.mode("overwrite").parquet(dir)
    def unit(): String = QueryDsl.search(spark.read.parquet(dir),
      """{"aggs": {"h": {"auto_date_histogram": {"field": "ts", "buckets": 5}}}}""")
      .select("interval").distinct().collect().map(_.getString(0)).mkString
    assert(unit() === "day") // one day of data
    // append three more years of data at the SAME path: the freshness
    // fingerprint must invalidate the cached span (a stale day unit
    // would blow the 5-bucket cap — the exact guarantee at stake)
    Seq((100L, "2021-01-01 00:00:00")).toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp").as("ts"))
      .write.mode("append").parquet(dir)
    assert(unit() === "year")
  }

  test("histogram offset: shifted keys, shifted dense fill, no-data sentinel") {
    import spark.implicits._
    val t = Seq((1L, 7L), (2L, 12L), (3L, 34L), (4L, 55L), (5L, 91L))
      .toDF("id", "v")
    // offset 10, interval 30: boundaries at ..., -20, 10, 40, 70, 100
    // keys: 7→-20, 12→10, 34→10, 55→40, 91→70
    val plain = QueryDsl.search(t,
      """{"aggs": {"h": {"histogram": {"field": "v", "interval": 30,
           "offset": 10}}}}""")
      .orderBy("h").as[(Long, Long)].collect().toSeq
    assert(plain === Seq((-20L, 1L), (10L, 2L), (40L, 1L), (70L, 1L)))
    // the dense fill aligns to the SAME shifted boundaries: lo/hi are
    // re-floored against the offset, never the unshifted multiples
    val filled = QueryDsl.search(t,
      """{"aggs": {"h": {"histogram": {"field": "v", "interval": 30,
           "offset": 10, "min_doc_count": 0,
           "extended_bounds": {"min": 0, "max": 115}}}}}""")
      .orderBy("h").as[(Long, Long)].collect().toSeq
    assert(filled === Seq((-20L, 1L), (10L, 2L), (40L, 1L), (70L, 1L), (100L, 0L)))
    // hi0 < lo0 no-data sentinel: empty hits + no bounds → ZERO buckets
    val none = QueryDsl.search(t,
      """{"query": {"range": {"v": {"gte": 1000}}},
         "aggs": {"h": {"histogram": {"field": "v", "interval": 30,
           "offset": 10, "min_doc_count": 0}}}}""")
    assert(none.count() === 0L)
    // validation: negative, >= interval, float-interval combination
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"h": {"histogram": {"field": "v", "interval": 30,
         "offset": -1}}}}""", "offset must be >= 0")
    bad("""{"aggs": {"h": {"histogram": {"field": "v", "interval": 30,
         "offset": 30}}}}""", "offset must be < interval")
    bad("""{"aggs": {"h": {"histogram": {"field": "v", "interval": 2.5,
         "offset": 1}}}}""", "offset requires an integer interval")
    bad("""{"aggs": {"h": {"histogram": {"field": "v", "interval": 30,
         "offset": 1.5}}}}""", "offset must be an integer")
  }

  test("ascii_fold: native normalizer == the regex composition it replaced") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pool = "AbZz09 I _-!,.çÖİıßµ中文|~\"" + "\t"
    val strs = (0 until 300).map { _ =>
      val n = rnd.nextInt(40)
      (0 until n).map(_ => pool(rnd.nextInt(pool.length))).mkString
    } ++ Seq("", "  ", "C++ Rules_OK 42!", "İIıi", "a", "Ωmega force")
    val df = strs.toDF("s")
    val native = df.select(graft.plans.AsciiFold(col("s"))).as[String].collect().toSeq
    val regex = df.select(trim(lower(regexp_replace(col("s"),
      "[^A-Za-z0-9]+", " ")))).as[String].collect().toSeq
    assert(native === regex)
    // NULL propagates; SQL registration reaches the same expression
    assert(df.select(graft.plans.AsciiFold(lit(null).cast("string")))
      .collect().head.isNullAt(0))
    assert(spark.sql("SELECT ascii_fold('  Spark, JOIN!  ')")
      .collect().head.getString(0) === "spark join")
  }

  test("analyzer twins agree on arbitrary unicode (locale-proof by construction)") {
    import spark.implicits._
    // norm (column path) and normText (driver path) must agree
    // character-for-character on ANY input — the non-ASCII strip
    // happens BEFORE lowering in both, so JVM default-locale lowering
    // (Spark's lower() fallback for non-ASCII) can never split them
    val rnd = new scala.util.Random(42)
    val pool = "AbZz09 I _-!,.çÖİıßµ中文|~\"" + "\t"
    val strs = (0 until 300).map { _ =>
      val n = rnd.nextInt(24)
      (0 until n).map(_ => pool(rnd.nextInt(pool.length))).mkString
    } ++ Seq("I İ ı TITLE", "", "C++ Rules_OK 42!", "  sPaRk  ")
    val got = strs.toDF("s")
      .select(Analyzer.Standard.norm(col("s"))).as[String].collect().toSeq
    val want = strs.map(Analyzer.Standard.normText)
    assert(got === want)
    // whitespace twin is the identity pair
    val gotW = strs.toDF("s")
      .select(Analyzer.Whitespace.norm(col("s"))).as[String].collect().toSeq
    assert(gotW === strs)
  }

  test("english analyzer: stop list + pinned stemmer, running matches run") {
    import spark.implicits._
    val docs = Seq(
      (1L, "He was RUNNING fast, then stopped."),
      (2L, "They run daily."),
      (3L, "The parties were wanted by the dresses."),
      (4L, "chess status and falling trees"),
      (5L, "nothing relevant here")).toDF("doc_id", "t")
    def hits(q: String): Seq[Long] = QueryDsl.search(docs,
      s"""{"query": {"match": {"t": {"query": "$q",
           "analyzer": "english"}}},
          "sort": ["doc_id"], "size": 10, "_source": ["doc_id"]}""")
      .as[Long].collect().toSeq
    // the verdict's own acceptance: "running" matches "run" (both ways)
    assert(hits("run") === Seq(1L, 2L))
    assert(hits("running") === Seq(1L, 2L))
    assert(hits("party") === Seq(3L))
    assert(hits("want") === Seq(3L))
    assert(hits("fall") === Seq(4L))    // ll never undoubles
    // a stop-word-only query analyzes to ZERO terms: the existing
    // zero_terms_query contract applies (loud by default, opt-in none)
    val e0 = intercept[IllegalArgumentException](hits("the"))
    assert(e0.getMessage.contains("zero_terms_query"), e0.getMessage)
    assert(QueryDsl.search(docs,
      """{"query": {"match": {"t": {"query": "the", "analyzer": "english",
           "zero_terms_query": "none"}}},
          "sort": ["doc_id"], "size": 10, "_source": ["doc_id"]}""")
      .as[Long].collect().toSeq === Seq())
    // the pinned rule chain, token for token (incl. documented
    // divergences from Porter: no e-restore, short tokens pass)
    import graft.plans.EnglishFold.stem
    assert(stem("dresses") === "dress" && stem("parties") === "party")
    assert(stem("chess") === "chess" && stem("status") === "status")
    assert(stem("runs") === "run" && stem("running") === "run")
    assert(stem("falling") === "fall" && stem("wanted") === "want")
    assert(stem("making") === "mak" && stem("dies") === "die")
    assert(stem("sing") === "sing" && stem("red") === "red")
    assert(stem("gas") === "gas" && stem("ties") === "tie")
    // SQL-text access reaches the same kernel
    assert(spark.sql("SELECT english_fold('He was RUNNING, fast!')")
      .collect().head.getString(0) === "he run fast")
  }

  test("english analyzer twins agree on arbitrary unicode") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val pool = "AbZz09 I _-!,.çÖİıßµ中文|~\"" + "\t" + "singresses"
    val strs = (0 until 300).map { _ =>
      val n = rnd.nextInt(30)
      (0 until n).map(_ => pool(rnd.nextInt(pool.length))).mkString
    } ++ Seq("The Parties Were RUNNING", "", "dresses falling wanted 42!")
    val got = strs.toDF("s")
      .select(Analyzer.English.norm(col("s"))).as[String].collect().toSeq
    val want = strs.map(Analyzer.English.normText)
    assert(got === want)
  }

  test("custom analyzer: synonyms + stop lists over a named base (r16)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Big television sale TODAY"),
      (2L, "my TV broke again"),
      (3L, "tellies are not televisions"),  // 'televisions' stems? base standard: no
      (4L, "radio silence")).toDF("doc_id", "t")
    val custom = """{"type": "custom", "base": "standard",
      "stopwords": ["today"],
      "synonyms": [["tv", "television", "telly"]]}"""
    def hits(q: String): Seq[Long] = QueryDsl.search(docs,
      s"""{"query": {"match": {"t": {"query": "$q",
           "analyzer": $custom}}},
          "sort": ["doc_id"], "size": 10, "_source": ["doc_id"]}""")
      .as[Long].collect().toSeq
    // every member canonicalizes to the FIRST ("tv") — both directions
    assert(hits("tv") === Seq(1L, 2L))
    assert(hits("television") === Seq(1L, 2L))
    assert(hits("Telly") === Seq(1L, 2L))  // folded through the base first
    // 'televisions' (plural) is NOT a member under base=standard
    assert(hits("televisions") === Seq(3L))
    // the custom stop word vanishes from both sides
    val e0 = intercept[IllegalArgumentException](hits("today"))
    assert(e0.getMessage.contains("zero_terms_query"), e0.getMessage)
    // base=english folds members through stop+stem BEFORE the map:
    // "televisions" now IS a member (stems to "television")
    val en = """{"type": "custom", "base": "english",
      "synonyms": [["tv", "televisions"]]}"""
    assert(QueryDsl.search(docs,
      s"""{"query": {"match": {"t": {"query": "television",
           "analyzer": $en}}},
          "sort": ["doc_id"], "size": 10, "_source": ["doc_id"]}""")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))

    // twins agree: norm (column) == normText (driver) on seeded input
    val an = Analyzer.custom("english", Seq("radio"),
      Seq(Seq("tv", "televisions", "telly"), Seq("big", "large")))
    val rnd = new scala.util.Random(44)
    val pool = "aT vtelyRADIOBig large!,.09 "
    val strs = (0 until 200).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    } ++ docs.collect().map(_.getString(1)).toSeq
    val got = strs.toDF("s").select(an.norm(col("s"))).as[String].collect().toSeq
    assert(got === strs.map(an.normText))

    // the NAME is the serialized definition and round-trips EXACTLY —
    // including non-idempotent stems ("settings" folds once to
    // "setting", never re-folds to "set" on the parse path)
    val tricky = Analyzer.custom("english", Seq(), Seq(Seq("cfg", "settings")))
    assert(tricky.name === "custom:base=english;stop=;syn=cfg,setting")
    val back = Analyzer.of(tricky.name)
    assert(back === tricky && back.name === tricky.name)
    assert(back.normText("my Settings page") === tricky.normText("my Settings page"))

    // fail-loud shapes: bad base, stop-folding member, group collapse,
    // overlap, member-in-stoplist
    def badDef(d: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs,
        s"""{"query": {"match": {"t": {"query": "x", "analyzer": $d}}}}"""))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    badDef("""{"type": "custom", "base": "whitespace"}""", "standard or english")
    badDef("""{"type": "custom", "base": "english",
      "stopwords": ["the"]}""", "folds to nothing")
    badDef("""{"type": "custom", "base": "english",
      "synonyms": [["run", "running"]]}""", "collapses")
    badDef("""{"type": "custom", "base": "standard",
      "synonyms": [["a", "b"], ["b", "c"]]}""", "overlap")
    badDef("""{"type": "custom", "base": "standard",
      "stopwords": ["tv"], "synonyms": [["tv", "telly"]]}""", "stop word")
    badDef("""{"type": "custom", "base": "standard",
      "synonyms": [["big sale", "x"]]}""", "single token")
  }

  test("analyzer threads through every remaining tokenizing surface") {
    import spark.implicits._
    val mixed = Seq(
      (1L, "Spark JOIN, window."),
      (2L, "spark-join batch"),
      (3L, "filter sort merge"),
      (4L, "SPARK!  (join)"),
      (5L, "the Data, Window! spark")).toDF("doc_id", "t")
    // simple_query_string: grammar first, tokens normalized after
    val sqs = QueryDsl.search(mixed,
      """{"query": {"simple_query_string": {
           "query": "+Spark -Merge \"Data Window\"",
           "fields": ["t"], "analyzer": "standard"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(sqs === Seq((1L, 1L), (2L, 1L), (4L, 1L), (5L, 2L)))
    // query_string: leaves normalize, stems/fuzzy against normalized toks
    val qs = QueryDsl.search(mixed,
      """{"query": {"query_string": {
           "query": "t:Spark AND (windo* OR Batch^3)",
           "default_field": "t", "analyzer": "standard"}},
         "sort": ["doc_id"], "_source": ["doc_id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(qs === Seq((1L, 2L), (2L, 4L), (5L, 2L)))
    // span_near: positions from the normalized stream
    val sn = QueryDsl.search(mixed,
      """{"query": {"span_near": {
           "clauses": [{"span_term": {"t": "Spark"}},
                       {"span_term": {"t": "JOIN!"}}],
           "slop": 0, "in_order": true, "id_field": "doc_id",
           "analyzer": "standard"}},
         "sort": ["doc_id"], "_source": ["doc_id", "n_pairs"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(sn === Seq((1L, 1L), (2L, 1L), (4L, 1L)))
    // intervals: ordered subsequence over normalized positions
    val iv = QueryDsl.search(mixed,
      """{"query": {"intervals": {
           "t": {"match": {"query": "Spark windo*", "max_gaps": 2,
                 "ordered": true, "analyzer": "standard"}},
           "id_field": "doc_id"}},
         "sort": ["doc_id"], "_source": ["doc_id", "n_spans"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(iv === Seq((1L, 1L)))
    // term suggester: vocabulary and inputs share the twin
    val sg = QueryDsl.search(mixed,
      """{"suggest": {"fix": {"text": "Sparkk!",
           "term": {"field": "t", "max_edits": 1, "size": 2,
                    "analyzer": "standard"}}}}""")
      .select("q", "term").as[(String, String)].collect().toSeq
    assert(sg === Seq(("sparkk", "spark")))
    // completion suggester: normalized prefix against normalized terms
    val cp = QueryDsl.search(mixed,
      """{"suggest": {"auto": {"prefix": "Wind",
           "completion": {"field": "t", "analyzer": "standard"}}}}""")
      .select("term").as[String].collect().toSeq
    assert(cp === Seq("window"))
    // significant_text: the bucket terms are normalized tokens
    val st = QueryDsl.search(mixed,
      """{"query": {"range": {"doc_id": {"lte": 2}}},
         "aggs": {"sig": {"significant_text": {"field": "t",
             "min_doc_count": 2, "size": 3, "analyzer": "standard"}}}}""")
      .select("sig").as[String].collect().toSet
    assert(st.contains("spark") || st.contains("join"), st.toString)
    // more_like_this: seed terms and postings from the normalized stream
    val mlt = QueryDsl.search(mixed,
      """{"query": {"more_like_this": {"fields": ["t"],
           "like": {"doc_id": 1}, "max_query_terms": 3,
           "analyzer": "standard"}},
         "sort": [{"_score": "desc"}, "doc_id"], "_source": ["doc_id"]}""")
      .as[Long].collect().toSeq
    assert(mlt.contains(2L) && mlt.contains(4L), mlt.toString)
    // a term that analyzes to several tokens fails loud in a grammar
    val e = intercept[IllegalArgumentException](QueryDsl.search(mixed,
      """{"query": {"query_string": {"query": "a_b",
           "default_field": "t", "analyzer": "standard"}}}"""))
    assert(e.getMessage.contains("multiple tokens"), e.getMessage)
    // highlight on an analyzed (object-bodied) match is SUPPORTED now
    // (r15, VERDICT r14 #5): raw fragments, bounded case-kept wraps
    val hl = QueryDsl.search(mixed,
      """{"query": {"match": {"t": {"query": "Spark", "analyzer": "standard"}}},
         "highlight": {"fields": {"t": {}}},
         "sort": ["doc_id"], "_source": ["doc_id", "highlight"]}""")
      .as[(Long, String)].collect().toSeq
    assert(hl.map(_._1) === Seq(1L, 2L, 4L, 5L))
    assert(hl.head._2.contains("<em>Spark</em>"), hl.head._2)
    assert(hl(2)._2.contains("<em>SPARK</em>"), hl(2)._2)
  }

  test("straggler aggs: percentile_ranks, time_zone, geo_centroid, ip_range validation") {
    import spark.implicits._
    val t = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("id", "v")
    // percentile_ranks: inclusive CDF, one row, one column per value
    val pr = QueryDsl.search(t,
      """{"aggs": {"p": {"percentile_ranks": {"field": "v",
           "values": [20, 35]}}}}""").collect().head
    assert(pr.getAs[Double]("p_20") === 50.0)
    assert(pr.getAs[Double]("p_35") === 75.0)
    def bad(df: org.apache.spark.sql.DataFrame, json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(df, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad(t, """{"aggs": {"p": {"percentile_ranks": {"field": "v"}}}}""",
      "non-empty values")
    bad(t, """{"aggs": {"p": {"percentile_ranks": {"field": "v",
         "values": [1.5]}}}}""", "must be integers")
    // time_zone: +05:30 shifts the day boundary; 20:00 UTC = 01:30 IST
    // next day, so the two rows land in DIFFERENT local days
    val ev = Seq((1L, "2024-01-10 10:00:00"), (2L, "2024-01-10 20:00:00"))
      .toDF("id", "s").select(col("id"), col("s").cast("timestamp").as("ts"))
    val tz = QueryDsl.search(ev,
      """{"aggs": {"d": {"date_histogram": {"field": "ts",
           "calendar_interval": "day", "time_zone": "+05:30"}}}}""")
      .orderBy("d")
      .select(date_format(col("d"), "yyyy-MM-dd HH:mm:ss")).as[String]
      .collect().toSeq
    assert(tz === Seq("2024-01-09 18:30:00", "2024-01-10 18:30:00"))
    // fixed_interval honors the offset too: 12h buckets aligned to
    // local 00:00/12:00 → UTC keys at 06:30/18:30
    val tzf = QueryDsl.search(ev,
      """{"aggs": {"d": {"date_histogram": {"field": "ts",
           "fixed_interval": "12h", "time_zone": "+05:30"}}}}""")
      .orderBy("d")
      .select(date_format(col("d"), "yyyy-MM-dd HH:mm:ss")).as[String]
      .collect().toSeq
    assert(tzf === Seq("2024-01-10 06:30:00", "2024-01-10 18:30:00"))
    // a named zone in a transition-free window behaves exactly like
    // its fixed offset: Jan 2024 New York is EST (-05:00), both rows
    // are the same local day, key = local midnight = 05:00 UTC
    val tzn = QueryDsl.search(ev,
      """{"aggs": {"d": {"date_histogram": {"field": "ts",
           "calendar_interval": "day", "time_zone": "America/New_York"}}}}""")
      .select(date_format(col("d"), "yyyy-MM-dd HH:mm:ss"), col("doc_count"))
      .as[(String, Long)].collect().toSeq
    assert(tzn === Seq(("2024-01-10 05:00:00", 2L)))
    bad(ev, """{"aggs": {"d": {"date_histogram": {"field": "ts",
         "calendar_interval": "day", "time_zone": "+19:00"}}}}""",
      "out of range")
    // geo_centroid: exact milli-degree mean
    val g = Seq((1L, 10.5, 20.25), (2L, -10.5, 30.75)).toDF("id", "lat", "lon")
    val cen = QueryDsl.search(g,
      """{"aggs": {"c": {"geo_centroid": {"lat_field": "lat",
           "lon_field": "lon"}}}}""").collect().head
    assert(cen.getAs[Double]("c_lat") === 0.0)
    assert(cen.getAs[Double]("c_lon") === 25.5)
    // ip_range: junk field values land in no bucket (including
    // out-of-range octets, which still CAST to a number); bad bounds loud
    val ips = Seq((1L, "10.0.0.1"), (2L, "10.0.1.200"), (3L, "junk"),
      (4L, null), (5L, "10.999.0.1"), (6L, "10.0.0.1.7"))
      .toDF("id", "ip")
    val ir = QueryDsl.search(ips,
      """{"aggs": {"net": {"ip_range": {"field": "ip",
           "ranges": [{"to": "10.0.1.0"}, {"from": "10.0.1.0"}]}}}}""")
      .select("net", "doc_count").as[(String, Long)].collect().toSeq
    assert(ir === Seq(("*-10.0.1.0", 1L), ("10.0.1.0-*", 1L)))
    bad(ips, """{"aggs": {"net": {"ip_range": {"field": "ip",
         "ranges": [{"to": "10.0.256.0"}]}}}}""", "not a dotted-quad")
    // a ':' bound now routes to the IPv6 arm (Ipv6Spec): the request
    // is valid, and every v4/dirty field value NULLs out under the v6
    // parser — both buckets empty, never a crash
    assert(QueryDsl.search(ips,
      """{"aggs": {"net": {"ip_range": {"field": "ip",
           "ranges": [{"to": "::1"}, {"from": "::1"}]}}}}""")
      .select("doc_count").as[Long].collect().toSeq === Seq(0L, 0L))
    bad(ips, """{"aggs": {"net": {"ip_range": {"field": "ip",
         "ranges": [{}]}}}}""", "unbounded range")
  }

  test("terms include/exclude filters keys map-side; date_histogram dense fill") {
    import spark.implicits._
    val t = Seq((1L, "aa"), (2L, "ab"), (3L, "ba"), (4L, "aa"), (5L, "ca"))
      .toDF("id", "k")
    // include regex is whole-value anchored; exclude array wins after
    val inc = QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "k", "include": "a."}}}}""")
      .orderBy("g").as[(String, Long)].collect().toSeq
    assert(inc === Seq(("aa", 2L), ("ab", 1L)))
    val exc = QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "k", "include": "a.",
           "exclude": ["ab"]}}}}""")
      .orderBy("g").as[(String, Long)].collect().toSeq
    assert(exc === Seq(("aa", 2L)))
    // exclude-only works too; regex must match the WHOLE value
    val exc2 = QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "k", "exclude": "a"}}}}""")
      .orderBy("g").as[(String, Long)].collect().toSeq
    assert(exc2 === Seq(("aa", 2L), ("ab", 1L), ("ba", 1L), ("ca", 1L)),
      "exclude 'a' must not match two-char values (whole-value anchor)")
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"aggs": {"g": {"terms": {"field": "k", "include": []}}}}"""))
    assert(e.getMessage.contains("include"), e.getMessage)
    // NULL-key semantics: exclude KEEPS the NULL bucket the gate-less
    // agg emits (excluding 'x' says nothing about NULL); include
    // drops it (NULL matches no regex/value)
    val tn = Seq((1L, Some("aa")), (2L, Some("ab")), (3L, None))
      .toDF("id", "k")
    val base = QueryDsl.search(tn,
      """{"aggs": {"g": {"terms": {"field": "k"}}}}""")
      .orderBy("g").as[(Option[String], Long)].collect().toSeq
    assert(base === Seq((None, 1L), (Some("aa"), 1L), (Some("ab"), 1L)))
    val exN = QueryDsl.search(tn,
      """{"aggs": {"g": {"terms": {"field": "k", "exclude": ["ab"]}}}}""")
      .orderBy("g").as[(Option[String], Long)].collect().toSeq
    assert(exN === Seq((None, 1L), (Some("aa"), 1L)),
      "exclude must not drop the NULL-key bucket")
    val exNr = QueryDsl.search(tn,
      """{"aggs": {"g": {"terms": {"field": "k", "exclude": "a."}}}}""")
      .orderBy("g").as[(Option[String], Long)].collect().toSeq
    assert(exNr === Seq((None, 1L)),
      "regex exclude must not drop the NULL-key bucket")
    val inN = QueryDsl.search(tn,
      """{"aggs": {"g": {"terms": {"field": "k", "include": "a."}}}}""")
      .orderBy("g").as[(Option[String], Long)].collect().toSeq
    assert(inN === Seq((Some("aa"), 1L), (Some("ab"), 1L)),
      "include must drop the NULL-key bucket")
    // date_histogram dense fill: empty 1d buckets appear between data
    val ev = Seq((1L, "2024-01-01 05:00:00"), (2L, "2024-01-04 07:00:00"))
      .toDF("id", "s").select(col("id"), col("s").cast("timestamp").as("ts"))
    val filled = QueryDsl.search(ev,
      """{"aggs": {"d": {"date_histogram": {"field": "ts",
           "fixed_interval": "1d", "min_doc_count": 0}}}}""")
      .orderBy("d")
      .select(date_format(col("d"), "MM-dd").as("d"), col("doc_count"))
      .as[(String, Long)].collect().toSeq
    assert(filled === Seq(("01-01", 1L), ("01-02", 0L), ("01-03", 0L),
      ("01-04", 1L)))
    // calendar series (no constant UTC step): the driver-iterated
    // local boundary walk fills the empty months
    val ev2 = Seq((1L, "2024-01-10 05:00:00"), (2L, "2024-04-04 07:00:00"))
      .toDF("id", "s").select(col("id"), col("s").cast("timestamp").as("ts"))
    val filled2 = QueryDsl.search(ev2,
      """{"aggs": {"d": {"date_histogram": {"field": "ts",
           "calendar_interval": "month", "min_doc_count": 0}}}}""")
      .orderBy("d")
      .select(date_format(col("d"), "yyyy-MM").as("d"), col("doc_count"))
      .as[(String, Long)].collect().toSeq
    assert(filled2 === Seq(("2024-01", 1L), ("2024-02", 0L),
      ("2024-03", 0L), ("2024-04", 1L)))
    val e3 = intercept[IllegalArgumentException](QueryDsl.search(ev,
      """{"aggs": {"d": {"date_histogram": {"field": "ts",
           "fixed_interval": "1d",
           "extended_bounds": {"min": "2024-01-01", "max": "2024-01-05"}}}}}"""))
    assert(e3.getMessage.contains("requires min_doc_count: 0"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](QueryDsl.search(ev,
      """{"aggs": {"d": {"date_histogram": {"field": "ts",
           "fixed_interval": "1d", "min_doc_count": 0,
           "extended_bounds": {"min": "2024-02-30", "max": "2024-03-05"}}}}}"""))
    assert(e4.getMessage.contains("not an ISO date"), e4.getMessage)
  }

  test("date_range date-math bounds: driver-resolved, floor-rounded, day-precise") {
    import spark.implicits._
    val t = Seq((1L, "1996-05-10"), (2L, "1997-03-01"), (3L, "1999-07-04"))
      .toDF("id", "s").select(col("id"), col("s").cast("date").as("d"))
    val out = QueryDsl.search(t,
      """{"aggs": {"era": {"date_range": {"field": "d",
           "now": "1999-06-15",
           "ranges": [{"to": "now-2y/y"}, {"from": "now-2y/y"}]}}}}""")
      .select("era", "doc_count").as[(String, Long)].collect().toSeq
    // now-2y/y floors to 1997-01-01: doc 1 below, docs 2+3 at/above;
    // labels keep the request's expression text
    assert(out === Seq(("*-now-2y/y", 1L), ("now-2y/y-*", 2L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"era": {"date_range": {"field": "d",
         "ranges": [{"to": "now-2y/y"}]}}}}""", "needs a sibling")
    bad("""{"aggs": {"era": {"date_range": {"field": "d",
         "now": "1999-06-15T12:30:00",
         "ranges": [{"to": "now-3h"}]}}}}""", "sub-day precision")
  }

  test("script_fields: derived columns, sortable, fail-loud combinations") {
    import spark.implicits._
    val t = Seq((1L, 100L), (2L, 400L)).toDF("doc_id", "v")
    val out = QueryDsl.search(t,
      """{"query": {"range": {"doc_id": {"gte": 1}}},
         "script_fields": {"capped": {"script": {
           "source": "params.w * _score + min(doc['v'].value, params.cap)",
           "params": {"w": 10, "cap": 250}}}},
         "sort": [{"capped": "desc"}, "doc_id"],
         "_source": ["doc_id", "capped"]}""")
      .as[(Long, Long)].collect().toSeq
    // score = 1 each: doc1 → 10 + 100 = 110, doc2 → 10 + 250 = 260
    assert(out === Seq((2L, 260L), (1L, 110L)))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"script_fields": {"doc_id": {"script": {"source": "_score"}}}}""",
      "collides with an existing column")
    bad("""{"script_fields": {}}""", "at least one field")
    bad("""{"script_fields": {"x": {"script": {"source": "_score"}}},
         "aggs": {"n": {"value_count": {"field": "doc_id"}}}}""",
      "applies to hits, not aggs")
    bad("""{"script_fields": {"x": {"source": "_score"}}}""",
      "needs {script:")
  }

  test("cardinality precision_threshold: approximate HLL inside the error bound") {
    val exact = QueryDsl.search(docs,
      """{"aggs": {"n": {"cardinality": {"field": "n_chars"}}}}""")
      .collect().head.getAs[Long]("n")
    // rsd = 1.04/sqrt(threshold); assert within 5 sigma of exact
    val approx = QueryDsl.search(docs,
      """{"aggs": {"n": {"cardinality": {"field": "n_chars",
           "precision_threshold": 3000}}}}""")
      .collect().head.getAs[Long]("n")
    val rsd = 1.04 / math.sqrt(3000.0)
    assert(math.abs(approx - exact).toDouble / exact <= 5 * rsd,
      s"approx $approx vs exact $exact beyond the HLL error bound")
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"n": {"cardinality": {"field": "n_chars",
         "precision_threshold": 50}}}}""", "[100, 40000]")
    // unknown metric options now fail loud instead of being ignored
    bad("""{"aggs": {"n": {"avg": {"field": "n_chars", "missing": 0}}}}""",
      "unsupported avg option")
    bad("""{"aggs": {"n": {"sum": {"field": "n_chars", "script": "x"}}}}""",
      "unsupported sum option")
  }

  test("filters other_bucket counts the remainder in the same pass") {
    import spark.implicits._
    val t = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("id", "v")
    val out = QueryDsl.search(t,
      """{"aggs": {"g": {"filters": {"filters": {
           "low": {"range": {"v": {"lt": 15}}},
           "mid": {"range": {"v": {"gte": 15, "lt": 35}}}},
           "other_bucket": true}}}}""")
      .select("g", "doc_count").as[(String, Long)].collect().toSeq
    assert(out === Seq(("low", 1L), ("mid", 2L), ("_other_", 1L)))
    // the plan stays ONE aggregate — no extra scan for the remainder
    val plan = QueryDsl.search(t,
      """{"aggs": {"g": {"filters": {"filters": {
           "low": {"range": {"v": {"lt": 15}}}},
           "other_bucket_key": "rest"}}}}""")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Scan ")) <= 1, plan.take(800))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"g": {"filters": {"filters": {
         "low": {"range": {"v": {"lt": 15}}}},
         "other_bucket_key": "low"}}}}""", "collides with a named filter")
    bad("""{"aggs": {"g": {"filters": {"filters": {
         "low": {"range": {"v": {"lt": 15}}}},
         "other_bucket": "yes"}}}}""", "must be a boolean")
  }

  test("case_insensitive folds term-level clauses; raw stays exact") {
    import spark.implicits._
    val t = Seq((1L, "Alpha"), (2L, "ALPHA"), (3L, "alpha"), (4L, "beta"))
      .toDF("id", "s")
    def ids(json: String): Seq[Long] = QueryDsl.search(t,
      s"""{"query": $json, "sort": ["id"], "_source": ["id"]}""")
      .as[Long].collect().toSeq
    assert(ids("""{"term": {"s": {"value": "alpha",
      "case_insensitive": true}}}""") === Seq(1L, 2L, 3L))
    assert(ids("""{"term": {"s": "alpha"}}""") === Seq(3L))
    assert(ids("""{"prefix": {"s": {"value": "ALP",
      "case_insensitive": true}}}""") === Seq(1L, 2L, 3L))
    assert(ids("""{"wildcard": {"s": {"value": "AL*A",
      "case_insensitive": true}}}""") === Seq(1L, 2L, 3L))
    assert(ids("""{"regexp": {"s": {"value": "al.ha",
      "case_insensitive": true}}}""") === Seq(1L, 2L, 3L))
    assert(ids("""{"regexp": {"s": {"value": "al.ha",
      "case_insensitive": false}}}""") === Seq(3L))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t,
        s"""{"query": $json}"""))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"term": {"s": {"value": "x", "case_insensitive": 1}}}""",
      "must be a boolean")
    bad("""{"prefix": {"s": {"value": "x", "bogus": 1}}}""",
      "unsupported prefix option")
    bad("""{"term": {"s": {"value": 5, "case_insensitive": true}}}""",
      "must be a string")
  }

  test("rank_eval: precision and MRR over rated requests, fail-loud shapes") {
    import spark.implicits._
    val t = Seq(
      (1L, "spark spark spark"), (2L, "spark spark x"),
      (3L, "spark y z"), (4L, "nothing here")).toDF("doc_id", "text")
    def innerReq = """{"query": {"match": {"text": "spark"}},
      "sort": [{"_score": "desc"}, "doc_id"],
      "size": 3, "_source": ["doc_id"]}"""
    // ranking is 1, 2, 3 (score = distinct-term overlap... all score 1,
    // so doc_id breaks ties): precision@3 with docs {2, 4} rated = 1/3
    val p = QueryDsl.rankEval(t,
      s"""{"id_field": "doc_id",
           "metric": {"precision": {"k": 3}},
           "requests": [{"id": "q1", "request": $innerReq,
             "ratings": [{"doc_id": 2, "rating": 1},
                         {"doc_id": 4, "rating": 1}]}]}""")
      .as[(String, Double)].collect().toSeq
    assert(p === Seq(("q1", 1.0 / 3)))
    // precision divides by the RETRIEVED count in the top-k window,
    // not by k (the OpenSearch contract): "nothing" matches only doc 4
    // → 1 retrieved, 1 relevant → 1.0, not 1/3
    val sparse = QueryDsl.rankEval(t,
      s"""{"id_field": "doc_id",
           "metric": {"precision": {"k": 3}},
           "requests": [{"id": "q1",
             "request": {"query": {"match": {"text": "nothing"}},
               "sort": [{"_score": "desc"}, "doc_id"],
               "size": 3, "_source": ["doc_id"]},
             "ratings": [{"doc_id": 4, "rating": 1}]}]}""")
      .as[(String, Double)].collect().toSeq
    assert(sparse === Seq(("q1", 1.0)))
    // zero retrieved → precision 0.0 (never a divide-by-zero)
    val empty = QueryDsl.rankEval(t,
      s"""{"id_field": "doc_id",
           "metric": {"precision": {"k": 3}},
           "requests": [{"id": "q1",
             "request": {"query": {"match": {"text": "absent_token"}},
               "sort": [{"_score": "desc"}, "doc_id"],
               "size": 3, "_source": ["doc_id"]},
             "ratings": [{"doc_id": 4, "rating": 1}]}]}""")
      .as[(String, Double)].collect().toSeq
    assert(empty === Seq(("q1", 0.0)))
    // MRR: first relevant is rank 2 → 1/2; threshold filters rating 0
    val m = QueryDsl.rankEval(t,
      s"""{"id_field": "doc_id",
           "metric": {"mean_reciprocal_rank": {"k": 3}},
           "requests": [{"id": "q1", "request": $innerReq,
             "ratings": [{"doc_id": 1, "rating": 0},
                         {"doc_id": 2, "rating": 1}]}]}""")
      .as[(String, Double)].collect().toSeq
    assert(m === Seq(("q1", 0.5)))
    // recall divides by the TOTAL relevant count: {2, 4} rated
    // relevant, top-3 retrieves {1, 2, 3} → 1/2
    val r = QueryDsl.rankEval(t,
      s"""{"id_field": "doc_id",
           "metric": {"recall": {"k": 3}},
           "requests": [{"id": "q1", "request": $innerReq,
             "ratings": [{"doc_id": 2, "rating": 1},
                         {"doc_id": 4, "rating": 1}]}]}""")
      .as[(String, Double)].collect().toSeq
    assert(r === Seq(("q1", 0.5)))
    // no relevant rating at all → recall undefined → loud
    val eNoRel = intercept[IllegalArgumentException](QueryDsl.rankEval(t,
      s"""{"id_field": "doc_id",
           "metric": {"recall": {"k": 3}},
           "requests": [{"id": "q1", "request": $innerReq,
             "ratings": [{"doc_id": 2, "rating": 0}]}]}"""))
    assert(eNoRel.getMessage.contains("at least one relevant rating"))
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.rankEval(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad(s"""{"id_field": "doc_id", "metric": {"precision": {}},
         "requests": [{"id": "q1",
           "request": {"query": {"match": {"text": "spark"}},
                       "_source": ["doc_id"]},
           "ratings": [{"doc_id": 1, "rating": 1}]}]}""",
      "needs an explicit sort")
    bad(s"""{"id_field": "doc_id", "metric": {"precision": {}},
         "requests": [{"id": "q1", "request": $innerReq,
             "ratings": [{"doc_id": 1, "rating": 1}]},
           {"id": "q1", "request": $innerReq,
             "ratings": [{"doc_id": 1, "rating": 1}]}]}""",
      "ids must be unique")
    bad("""{"id_field": "doc_id", "metric": {"dcg": {}}, "requests": []}""",
      "metric must be")
  }

  test("nested agg: metrics over array elements, doc_count = nested docs") {
    import spark.implicits._
    val t = Seq(
      (1L, Seq((1L, 10L), (2L, 30L))),
      (2L, Seq((1L, 5L))),
      (3L, Seq.empty[(Long, Long)]))
      .toDF("id", "raw")
      .select(col("id"), expr(
        "transform(raw, x -> named_struct('ln', x._1, 'qty', x._2))").as("items"))
    val out = QueryDsl.search(t,
      """{"aggs": {"it": {"nested": {"path": "items"},
           "aggs": {"n": {"value_count": {"field": "items.ln"}},
                    "max_qty": {"max": {"field": "items.qty"}}}}}}""")
      .collect().head
    assert(out.getAs[Long]("doc_count") === 3L) // elements, not parents
    assert(out.getAs[Long]("n") === 3L)
    assert(out.getAs[Long]("max_qty") === 30L)
    // the query filters PARENTS before the explode
    val filtered = QueryDsl.search(t,
      """{"query": {"range": {"id": {"gte": 2}}},
         "aggs": {"it": {"nested": {"path": "items"},
           "aggs": {"n": {"value_count": {"field": "items.ln"}}}}}}""")
      .collect().head
    assert(filtered.getAs[Long]("doc_count") === 1L)
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"aggs": {"it": {"nested": {"path": "items", "x": 1}}}}"""))
    assert(e.getMessage.contains("unsupported nested-agg option"), e.getMessage)
  }

  test("analyzer standard: match family folds case and punctuation") {
    import spark.implicits._
    val mixed = Seq(
      (1L, "Spark JOIN, window."),
      (2L, "spark-join batch"),
      (3L, "filter sort merge"),
      (4L, "SPARK!  (join)")).toDF("id", "t")
    // match: "Spark," and "(join)" count as spark/join tokens
    val m = QueryDsl.search(mixed,
      """{"query": {"match": {"t": {"query": "Spark, JOIN",
           "analyzer": "standard", "minimum_should_match": 2}}},
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(m === Seq((1L, 2L), (2L, 2L), (4L, 2L)))
    // match_phrase: hyphen/punctuation runs become single boundaries
    val p = QueryDsl.search(mixed,
      """{"query": {"match_phrase": {"t": {"query": "Spark JOIN!",
           "analyzer": "standard"}}},
         "sort": ["id"], "_source": ["id"]}""")
      .as[Long].collect().toSeq
    assert(p === Seq(1L, 2L, 4L))
    // match_phrase_prefix: last analyzed token matches as a prefix
    val pp = QueryDsl.search(mixed,
      """{"query": {"match_phrase_prefix": {"t": {"query": "spark jo",
           "analyzer": "standard"}}},
         "sort": ["id"], "_source": ["id"]}""")
      .as[Long].collect().toSeq
    assert(pp === Seq(1L, 2L, 4L))
    // the default stays the raw whitespace contract: no case folding,
    // so none of the punctuated docs matches
    val raw = QueryDsl.search(mixed,
      """{"query": {"match": {"t": "spark join"}},
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(raw.isEmpty, s"whitespace must not fold 'JOIN,': $raw")
    // unknown analyzer fails loud at compile, never silent whitespace
    val e = intercept[IllegalArgumentException](QueryDsl.search(mixed,
      """{"query": {"match": {"t": {"query": "x", "analyzer": "letter"}}}}"""))
    assert(e.getMessage.contains("unknown analyzer"), e.getMessage)
    // analyzer must be a string
    val e2 = intercept[IllegalArgumentException](QueryDsl.search(mixed,
      """{"query": {"match": {"t": {"query": "x", "analyzer": 3}}}}"""))
    assert(e2.getMessage.contains("analyzer must be a string"), e2.getMessage)
    // multi_match + combined_fields + match_bool_prefix take it too
    val mm = QueryDsl.search(mixed,
      """{"query": {"multi_match": {"query": "SPARK.", "fields": ["t"],
           "type": "most_fields", "analyzer": "standard"}},
         "sort": ["id"], "_source": ["id"]}""").as[Long].collect().toSeq
    assert(mm === Seq(1L, 2L, 4L))
    val cf = QueryDsl.search(mixed,
      """{"query": {"combined_fields": {"query": "Window, Batch",
           "fields": ["t"], "analyzer": "standard"}},
         "sort": ["id"], "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    assert(cf === Seq((1L, 1L), (2L, 1L)))
    val mbp = QueryDsl.search(mixed,
      """{"query": {"match_bool_prefix": {"t": {"query": "Spark, jo",
           "analyzer": "standard"}}},
         "sort": ["id"], "_source": ["id"]}""").as[Long].collect().toSeq
    assert(mbp === Seq(1L, 2L, 4L))
  }

  test("match operator and == all terms required; guards injection") {
    val andHits = QueryDsl.search(docs,
      """{"query": {"match": {"text":
           {"query": "spark join window", "operator": "and"}}},
         "sort": ["doc_id"], "_source": ["doc_id"]}""")
    val msmHits = QueryDsl.search(docs,
      """{"query": {"match": {"text":
           {"query": "spark join window", "minimum_should_match": 3}}},
         "sort": ["doc_id"], "_source": ["doc_id"]}""")
    assert(andHits.collect().toSeq === msmHits.collect().toSeq)
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"query": {"match": {"text": {"query": "a b",
           "operator": "and", "minimum_should_match": 1}}}}""",
      "cannot be combined")
    bad("""{"query": {"match": {"text": {"query": "a b",
           "operator": "xor"}}}}""", "operator must be and/or")
    // a template param carrying JSON metacharacters fails, never injects
    val e = intercept[IllegalArgumentException](QueryDsl.searchTemplate(docs,
      """{"source": "{\"query\": {\"term\": {\"lang\": \"{{l}}\"}}}",
         "params": {"l": "en\", \"injected\": \"x"}}"""))
    assert(e.getMessage.contains("JSON metacharacters"), e.getMessage)
  }

  test("search templates bind on the driver; unbound/sections fail loud") {
    val got = QueryDsl.searchTemplate(docs,
      """{"source": "{\"query\": {\"term\": {\"lang\": \"{{l}}\"}}, \"sort\": [\"doc_id\"]}",
         "params": {"l": "en", "unused": 7}}""")
    val exp = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}}, "sort": ["doc_id"]}""")
    assert(got.collect().toSeq === exp.collect().toSeq)
    def bad(json: String, fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](
        QueryDsl.searchTemplate(docs, json))
      assert(e.getMessage.contains(fragment), e.getMessage)
    }
    bad("""{"source": "{\"query\": {\"term\": {\"lang\": \"{{l}}\"}}}"}""",
      "has no binding")
    bad("""{"source": "{{#cond}}x{{/cond}}", "params": {}}""",
      "sections/partials")
    bad("""{"source": "{}", "params": {"x": {"nested": 1}}}""",
      "must be a string/integer/boolean")
  }

  test("_msearch counts: N requests, ONE scan (plan-pinned), right values") {
    val got = QueryDsl.msearchCounts(docs, Seq(
      """{"query": {"term": {"lang": "en"}}}""",
      """{"query": {"range": {"n_chars": {"gte": 300}}}}""",
      """{}"""))
    // the scan count is read off the plan STRING: AQE wraps the tree
    // in AdaptiveSparkPlanExec, which plain collect() doesn't enter
    val plan = got.queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).size === 1, plan)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq(
      (0L, docs.filter(col("lang") === "en").count()),
      (1L, docs.filter(col("n_chars") >= 300).count()),
      (2L, docs.count())))
  }

  test("_msearch full bodies: per-request parity with solo execution; agg group is ONE scan") {
    import spark.implicits._
    // the scalar group (count + metrics) alone must compile to ONE scan
    val scalarOnly = QueryDsl.msearch(docs, Seq(
      """{"query": {"term": {"lang": "en"}}}""",
      """{"aggs": {"mx": {"max": {"field": "n_chars"}}}}""",
      """{"query": {"range": {"n_chars": {"gte": 300}}},
          "aggs": {"s": {"sum": {"field": "n_chars"}}}}""",
      """{"aggs": {"vc": {"value_count": {"field": "lang"}}}}"""))
    val plan = scalarOnly.queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).size === 1, plan)
    val sr = scalarOnly.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).toSeq
    assert(sr(0) === ((0L, "count", 0L, "count",
      docs.filter(col("lang") === "en").count().toDouble)))
    assert(sr(1) === ((1L, "agg", 0L, "mx",
      docs.agg(max("n_chars")).head().getLong(0).toDouble)))
    assert(sr(2) === ((2L, "agg", 0L, "s",
      docs.filter(col("n_chars") >= 300).agg(sum("n_chars")).head()
        .getLong(0).toDouble)))
    assert(sr(3) === ((3L, "agg", 0L, "vc",
      docs.filter(col("lang").isNotNull).count().toDouble)))

    // mixed batch: every response element equals its solo execution
    val mixed = QueryDsl.msearch(docs, Seq(
      """{"query": {"match": {"text": "spark join"}}, "size": 7,
          "_source": ["doc_id", "score"]}""",
      """{"aggs": {"by_src": {"terms": {"field": "source", "size": 4}}}}""",
      """{"query": {"term": {"lang": "en"}},
          "aggs": {"by_src_en": {"terms": {"field": "source", "size": 2}}}}"""))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq
    // hits == solo _search, rank for rank
    val solo = QueryDsl.search(docs,
      """{"query": {"match": {"text": "spark join"}},
          "sort": [{"_score": "desc"}, "doc_id"], "size": 7,
          "_source": ["doc_id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    val hitRows = mixed.filter(_._1 == 0L)
    assert(hitRows.map(_._4) === solo.map(_._1.toString))
    assert(hitRows.map(_._5) === solo.map(_._2.toDouble))
    assert(hitRows.map(_._3) === (1L to solo.size.toLong))
    // terms == solo terms agg ranking (doc_count desc, key asc)
    val soloTerms = docs.groupBy(col("source").cast("string").as("k"))
      .count().orderBy(col("count").desc, col("k")).limit(4)
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble)).toSeq
    val t1 = mixed.filter(_._1 == 1L)
    assert(t1.map(r => (r._4, r._5)) === soloTerms)
    val soloEn = docs.filter(col("lang") === "en")
      .groupBy(col("source").cast("string").as("k"))
      .count().orderBy(col("count").desc, col("k")).limit(2)
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble)).toSeq
    assert(mixed.filter(_._1 == 2L).map(r => (r._4, r._5)) === soloEn)

    // hit sizes are honored per request even though the heap is shared
    val twoHits = QueryDsl.msearch(docs, Seq(
      """{"query": {"match": {"text": "spark"}}, "size": 3,
          "_source": ["doc_id", "score"]}""",
      """{"query": {"match": {"text": "join"}}, "size": 9,
          "_source": ["doc_id", "score"]}"""))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(twoHits.filter(_._1 == 0L).map(_._2) === (1L to 3L))
    assert(twoHits.filter(_._1 == 1L).map(_._2) === (1L to 9L))

    def bad(reqs: Seq[String], frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.msearch(docs, reqs))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad(Nil, "at least one request")
    bad(Seq("""{"aggs": {"a": {"avg": {"field": "text"}}}}"""),
      "must be integral") // exact-sum model: no fractional/string sums
    bad(Seq("""{"aggs": {"a": {"sum": {"field": "nope"}}}}"""),
      "unknown field")
    bad(Seq("""{"aggs": {"a": {"percentiles": {"field": "n_chars"}}}}"""),
      "must be terms or a single-value metric")
    bad(Seq("""{"aggs": {"a": {"sum": {"field": "n_chars"}},
                "b": {"max": {"field": "n_chars"}}}}"""), "exactly one")
    bad(Seq("""{"query": {"match_all": {}}, "size": 5,
        "_source": ["doc_id"]}"""), "_source must be")
    bad(Seq("""{"query": {"match_all": {}}, "aggs": {"a":
        {"max": {"field": "n_chars"}}}, "size": 3}"""), "size 0 only")
    bad(Seq("""{"suggest": {}}"""), "unsupported _msearch body key")
    bad(Seq("""{"query": {"match_all": {}}, "size": 3}"""),
      "takes a query only")
  }
}

package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** terms `min_doc_count: 0` (r14, VERDICT r13 #5): the dictionary
  * comes from the PRE-QUERY table, empty terms surface with doc_count
  * 0 and NULL sub-metrics, include/exclude gate the dictionary too,
  * and the 100k cardinality cap fails loud.
  */
class TermsDictSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", 10L), (2L, "en", 20L), (3L, "de", 5L),
    (4L, "fr", 7L), (5L, "de", 9L), (6L, null.asInstanceOf[String], 1L)
  ).toDF("id", "lang", "n")

  test("empty buckets appear with doc_count 0 and NULL metrics") {
    val got = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}},
         "size": 0,
         "aggs": {"langs": {"terms": {"field": "lang", "min_doc_count": 0},
           "aggs": {"s": {"sum": {"field": "n"}}}}}}""")
      .select(col("langs"), col("doc_count"), col("s"))
      .as[(String, Long, Option[Long])].collect().toSeq
    // doc_count desc, key asc; the NULL dictionary key is excluded
    assert(got === Seq(("en", 2L, Some(30L)), ("de", 0L, None), ("fr", 0L, None)))
  }

  test("include gates the dictionary; min_doc_count >= 1 still filters") {
    val inc = QueryDsl.search(docs,
      """{"query": {"term": {"lang": "en"}},
         "size": 0,
         "aggs": {"langs": {"terms": {"field": "lang", "min_doc_count": 0,
           "include": ["en", "de"]}}}}""")
      .select(col("langs"), col("doc_count"))
      .as[(String, Long)].collect().toSeq
    assert(inc === Seq(("en", 2L), ("de", 0L)))
    val floor = QueryDsl.search(docs,
      """{"size": 0, "aggs": {"langs": {"terms": {"field": "lang",
           "min_doc_count": 2}}}}""")
      .select(col("langs"), col("doc_count"))
      .as[(String, Long)].collect().toSeq
    assert(floor === Seq(("de", 2L), ("en", 2L)))
    val neg = intercept[IllegalArgumentException](QueryDsl.search(docs,
      """{"size": 0, "aggs": {"langs": {"terms": {"field": "lang",
           "min_doc_count": -1}}}}"""))
    assert(neg.getMessage.contains("must be >= 0"))
  }

  test("the dictionary cardinality cap fails loud") {
    val wide = spark.range(100002).select(col("id"),
      concat(lit("k"), col("id")).as("k"))
    val e = intercept[IllegalArgumentException](QueryDsl.search(wide,
      """{"query": {"term": {"k": "k1"}},
         "size": 0,
         "aggs": {"ks": {"terms": {"field": "k", "min_doc_count": 0}}}}"""))
    assert(e.getMessage.contains("dictionary cap"), e.getMessage)
  }
}

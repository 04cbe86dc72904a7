package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Multi-level `nested` (two array hops): the flat two-hop path, the
  * same-outer-element composed form, inner_hits over a two-hop path,
  * NULL-inner-array safety, and the depth-3 fail-loud wall.
  */
class NestedDepthSpec extends SparkSpec {
  import spark.implicits._

  // three docs with hand-known structure
  private def docs = Seq(
    // doc 1: items [(slot 0, subs qty [5, 20]), (slot 1, subs qty [7])]
    (1L, Seq((0L, Seq(5L, 20L)), (1L, Seq(7L))),
      // doc 2: one item, NULL subs handled below via idx -1 marker
      0),
    (2L, Seq((0L, Seq.empty[Long])), 0),
    (3L, Seq((2L, Seq(50L, 60L)), (3L, Seq(1L))), 0)
  ).toDF("id", "raw", "z")
    .withColumn("items", expr(
      """transform(raw, it -> struct(it._1 AS slot,
           CASE WHEN size(it._2) = 0 THEN CAST(NULL AS ARRAY<STRUCT<qty: BIGINT>>)
                ELSE transform(it._2, q -> struct(q AS qty)) END AS subs))"""))

  test("flat two-hop path counts matching inner elements across outer elements") {
    val got = QueryDsl.search(docs,
      """{"query": {"nested": {"path": "items.subs",
           "query": {"range": {"items.subs.qty": {"gte": 10}}}}},
         "sort": ["id"], "size": 10, "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    // doc 1: qtys 5,20,7 -> one match; doc 2: NULL subs -> none;
    // doc 3: 50,60,1 -> two matches
    assert(got === Seq((1L, 1L), (3L, 2L)))
  }

  test("composed inner nested constrains the SAME outer element") {
    val got = QueryDsl.search(docs,
      """{"query": {"nested": {"path": "items",
           "query": {"bool": {"must": [
             {"range": {"items.slot": {"gte": 1}}},
             {"nested": {"path": "items.subs",
               "query": {"range": {"items.subs.qty": {"gte": 10}}}}}]}}}},
         "sort": ["id"], "size": 10, "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    // doc 1: slot-1 item has qtys [7] -> no (its slot-0 item matching
    // qty>=10 must NOT leak across elements); doc 3: slot-2 item has
    // 50,60 -> yes (one outer element matches)
    assert(got === Seq((3L, 1L)))
  }

  test("inner_hits over a two-hop path surfaces inner elements") {
    val got = QueryDsl.search(docs,
      """{"query": {"nested": {"path": "items.subs",
           "query": {"range": {"items.subs.qty": {"gte": 10}}},
           "inner_hits": {"size": 2, "_source": ["items.subs.qty"]}}},
         "sort": ["id", "inner_rank"], "size": 10,
         "_source": ["id", "inner_rank", "inner_qty"]}""")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 20L), (3L, 1L, 50L), (3L, 2L, 60L)))
  }

  test("depth walls fail loud") {
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(docs, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"query": {"nested": {"path": "a.b.c",
        "query": {"match_all": {}}}}}""", "depth 3 is unsupported")
    bad("""{"query": {"nested": {"path": "items",
        "query": {"nested": {"path": "items.subs.deeper",
          "query": {"match_all": {}}}}}}}""", "depth 3")
    bad("""{"query": {"nested": {"path": "items.subs",
        "query": {"nested": {"path": "items.subs.deeper",
          "query": {"match_all": {}}}}}}}""", "would be depth 3")
    bad("""{"query": {"nested": {"path": "items",
        "query": {"nested": {"path": "other.subs",
          "query": {"match_all": {}}}}}}}""", "must extend the enclosing path")
  }
}

package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Multi-level `nested` (r13: up to FOUR array hops): flat multi-hop
  * paths, the same-outer-element composed form (recursively
  * composable), inner_hits over a two-hop path, NULL-inner-array
  * safety at every level, and the depth-5 fail-loud wall.
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

  // three-level docs: a -> mid -> subs, with NULLs at BOTH inner levels
  private def docs3 = Seq(
    // doc 1: slot-0 mid [(subs [5, 20]), (subs NULL)], slot-1 mid NULL
    (1L, 0), (2L, 0), (3L, 0)
  ).toDF("id", "z")
    .withColumn("a", expr(
      """CASE id
           WHEN 1 THEN array(
             struct(CAST(0 AS BIGINT) AS slot, array(
               struct(array(struct(CAST(5 AS BIGINT) AS qty),
                            struct(CAST(20 AS BIGINT) AS qty)) AS subs),
               struct(CAST(NULL AS ARRAY<STRUCT<qty: BIGINT>>) AS subs)) AS mid),
             struct(CAST(1 AS BIGINT) AS slot,
               CAST(NULL AS ARRAY<STRUCT<subs: ARRAY<STRUCT<qty: BIGINT>>>>) AS mid))
           WHEN 2 THEN array(
             struct(CAST(0 AS BIGINT) AS slot, array(
               struct(CAST(array() AS ARRAY<STRUCT<qty: BIGINT>>) AS subs)) AS mid))
           ELSE array(
             struct(CAST(2 AS BIGINT) AS slot, array(
               struct(array(struct(CAST(50 AS BIGINT) AS qty),
                            struct(CAST(60 AS BIGINT) AS qty)) AS subs),
               struct(array(struct(CAST(1 AS BIGINT) AS qty)) AS subs)) AS mid))
         END"""))

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

  test("flat THREE-hop path flattens through NULLs at both inner levels") {
    val got = QueryDsl.search(docs3,
      """{"query": {"nested": {"path": "a.mid.subs",
           "query": {"range": {"a.mid.subs.qty": {"gte": 10}}}}},
         "sort": ["id"], "size": 10, "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    // doc 1: leaf qtys 5,20 (NULL mid and NULL subs skipped) -> one;
    // doc 2: empty subs -> none; doc 3: 50,60,1 -> two
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

  test("composed nested-in-nested walks three levels on the same elements") {
    val got = QueryDsl.search(docs3,
      """{"query": {"nested": {"path": "a",
           "query": {"bool": {"must": [
             {"range": {"a.slot": {"gte": 1}}},
             {"nested": {"path": "a.mid",
               "query": {"nested": {"path": "a.mid.subs",
                 "query": {"range": {"a.mid.subs.qty": {"gte": 10}}}}}}}]}}}},
         "sort": ["id"], "size": 10, "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toSeq
    // doc 1: the slot>=1 element has mid NULL -> no (the slot-0
    // element's 20 must not leak); doc 3: slot-2 element has 50,60
    assert(got === Seq((3L, 1L)))
  }

  test("flat FOUR-hop path serves; the fifth hop fails loud") {
    val d4 = Seq((1L, 0), (2L, 0)).toDF("id", "z")
      .withColumn("w", expr(
        """array(struct(array(struct(array(struct(array(
             struct(CAST(id * 21 AS BIGINT) AS v)) AS z)) AS y)) AS x))"""))
    val got = QueryDsl.search(d4,
      """{"query": {"nested": {"path": "w.x.y.z",
           "query": {"term": {"w.x.y.z.v": 42}}}},
         "sort": ["id"], "size": 10, "_source": ["id"]}""")
      .as[Long].collect().toSeq
    assert(got === Seq(2L)) // 2 * 21 = 42
    val e = intercept[IllegalArgumentException](QueryDsl.search(d4,
      """{"query": {"nested": {"path": "w.x.y.z.v",
           "query": {"match_all": {}}}}}"""))
    assert(e.getMessage.contains("up to four array hops"), e.getMessage)
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
    bad("""{"query": {"nested": {"path": "a.b.c.d.e",
        "query": {"match_all": {}}}}}""", "up to four array hops")
    // an inner nested must extend by exactly ONE hop (deeper levels
    // compose another nested clause)
    bad("""{"query": {"nested": {"path": "items",
        "query": {"nested": {"path": "items.subs.deeper",
          "query": {"match_all": {}}}}}}}""", "by exactly one hop")
    // the composed form hits the same 4-hop total cap
    bad("""{"query": {"nested": {"path": "a.b.c.d",
        "query": {"nested": {"path": "a.b.c.d.e",
          "query": {"match_all": {}}}}}}}""", "more than four hops")
    bad("""{"query": {"nested": {"path": "items",
        "query": {"nested": {"path": "other.subs",
          "query": {"match_all": {}}}}}}}""", "must extend the enclosing path")
  }
}

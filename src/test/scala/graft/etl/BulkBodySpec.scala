package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BulkBody: the `_bulk` wire body parsed into the CDC frame and
  * applied through the ONE CdcMerge implementation.
  */
class BulkBodySpec extends SparkSpec {
  import spark.implicits._

  test("bulk body parses to the CDC frame and merges last-writer-wins") {
    val body =
      """{"index": {"_id": 1}}
        |{"title": "first", "n": 10}
        |{"create": {"_id": 2}}
        |{"title": "second", "n": 20}
        |{"index": {"_id": 1}}
        |{"title": "first-v2", "n": 11}
        |{"delete": {"_id": 2}}
        |""".stripMargin
    val batch = BulkBody.parse(spark, body)
    assert(batch.columns.toSet === Set("_doc_id", "_action", "_seq", "title", "n"))
    // body order IS the seq: the later index of id 1 wins, id 2 ends
    // as a tombstone
    val state = CdcMerge.initialState(batch)
    val live = state.filter(!col("_deleted"))
      .select("_doc_id", "title", "n").as[(Long, String, Long)]
      .collect().toSeq
    assert(live === Seq((1L, "first-v2", 11L)))
    assert(state.filter(col("_deleted")).select("_doc_id").as[Long]
      .collect().toSeq === Seq(2L))
    // a follow-up body applies on top; startSeq keeps seqs monotonic
    val batch2 = BulkBody.parse(spark,
      """{"index": {"_id": 2}}
        |{"title": "re", "n": 21}
        |""".stripMargin, startSeq = 10L)
    val live2 = CdcMerge.applyBatch(state, batch2)
      .filter(!col("_deleted"))
      .select("_doc_id", "title").as[(Long, String)].collect().toSet
    assert(live2 === Set((1L, "first-v2"), (2L, "re")))
  }

  test("bulk update resolves read-modify-write through the LWW merge") {
    // base state: two documents
    val state0 = CdcMerge.initialState(BulkBody.parse(spark,
      """{"index": {"_id": 1}}
        |{"title": "one", "n": 10}
        |{"index": {"_id": 2}}
        |{"title": "two", "n": 20}
        |""".stripMargin))
    val body =
      """{"update": {"_id": 1}}
        |{"doc": {"n": 99}}
        |{"index": {"_id": 3}}
        |{"title": "three", "n": 30}
        |{"update": {"_id": 3}}
        |{"doc": {"title": "three-v2"}}
        |{"delete": {"_id": 2}}
        |""".stripMargin
    val st1 = BulkBody.applyBulk(spark, state0, body, startSeq = 100L)
    def snap(st: org.apache.spark.sql.DataFrame) =
      CdcMerge.snapshot(st).select("_doc_id", "title", "n")
        .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    // update 1 kept title, replaced n; update 3 saw the SAME-BODY
    // index of 3; delete 2 dropped the row
    assert(snap(st1) === Seq((1L, "one", 99L), (3L, "three-v2", 30L)))
    // replay idempotence: the same body re-applied re-reads the
    // merged state and re-derives identical documents
    val st2 = BulkBody.applyBulk(spark, st1, body, startSeq = 100L)
    assert(snap(st2) === snap(st1))
    // a newer interleaved write still wins over a replayed update
    val st3 = BulkBody.applyBulk(spark, st1,
      """{"index": {"_id": 1}}
        |{"title": "newer", "n": 1}
        |""".stripMargin, startSeq = 200L)
    val st4 = BulkBody.applyBulk(spark, st3, body, startSeq = 100L)
    assert(snap(st4).filter(_._1 == 1L) === Seq((1L, "newer", 1L)))
  }

  test("bulk update fail-loud: missing doc, deleted doc, null field, script form") {
    val state0 = CdcMerge.initialState(BulkBody.parse(spark,
      """{"index": {"_id": 1}}
        |{"title": "one", "n": 10}
        |""".stripMargin))
    def bad(body: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](
        BulkBody.applyBulk(spark, state0, body, startSeq = 50L))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"update": {"_id": 7}}
          |{"doc": {"n": 1}}""".stripMargin, "missing or deleted document")
    // a delete earlier in the SAME body tombstones the target
    bad("""{"delete": {"_id": 1}}
          |{"update": {"_id": 1}}
          |{"doc": {"n": 1}}""".stripMargin, "missing or deleted document")
    bad("""{"update": {"_id": 1}}
          |{"doc": {"n": null}}""".stripMargin, "cannot distinguish absent from null")
    bad("""{"update": {"_id": 1}}
          |{"script": {"source": "ctx._source.n += 1"}}""".stripMargin,
      "unsupported _bulk update body option 'script'")
    bad("""{"update": {"_id": 1}}
          |{"doc": {}}""".stripMargin, "update doc is empty")
    bad("""{"update": {"_id": 1}}""".stripMargin, "has no source line")
    // the state-free parse still rejects update
    val e = intercept[IllegalArgumentException](BulkBody.parse(spark,
      """{"update": {"_id": 1}}
        |{"doc": {"n": 1}}""".stripMargin))
    assert(e.getMessage.contains("applyBulk"))
    // a payload type JSON cannot round-trip (timestamp) fails loud
    // BEFORE any merge — the union would otherwise silently retype
    // the whole state column
    val tsState = spark.sql(
      """SELECT CAST(1 AS BIGINT) AS _doc_id, CAST(0 AS BIGINT) AS _seq,
         false AS _deleted, TIMESTAMP '2024-01-01 00:00:00' AS ts,
         CAST(10 AS BIGINT) AS n""")
    val e2 = intercept[IllegalArgumentException](
      BulkBody.applyBulk(spark, tsState,
        """{"update": {"_id": 1}}
          |{"doc": {"n": 1}}""".stripMargin, startSeq = 5L))
    assert(e2.getMessage.contains("would silently retype"), e2.getMessage)
    // without updates the same state merges fine (no JSON round-trip)
    val ok = BulkBody.applyBulk(spark, tsState,
      """{"delete": {"_id": 1}}
        |""".stripMargin, startSeq = 5L)
    assert(CdcMerge.snapshot(ok).count() === 0L)
  }

  test("bulk body fail-loud contract") {
    def bad(body: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](BulkBody.parse(spark, body))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"update": {"_id": 1}}
          |{"doc": {"x": 1}}""".stripMargin, "partial-document")
    bad("""{"index": {}}
          |{"x": 1}""".stripMargin, "needs _id")
    bad("""{"index": {"_id": 1}}
          |{"x": 1}
          |{"index": {"_id": "a"}}
          |{"x": 2}""".stripMargin, "mixes numeric and string")
    bad("""{"index": {"_id": 1}}
          |{"_seq": 5}""".stripMargin, "reserved column")
    bad("""{"index": {"_id": 1}}""", "no source line")
    bad("""{"upsert": {"_id": 1}}
          |{"x": 1}""".stripMargin, "must be one index|create|delete")
    bad("", "empty")
    bad("""{"index": {"_id": 1, "routing": "r"}}
          |{"x": 1}""".stripMargin, "unsupported _bulk index option")
  }
}

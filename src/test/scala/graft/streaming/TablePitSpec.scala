package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Point-in-time pagination over CDC targets (r15, VERDICT r14 #6):
  * pages opened before a merge reconstruct the pinned ranking exactly
  * while merges + vacuum land mid-session; vacuum refuses pinned
  * pieces until release; double release fails loud.
  */
class TablePitSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, String, Long, Long)*): DataFrame =
    rows.toSeq.toDF("_doc_id", "_action", "_seq", "rank")

  private def pageReq(size: Int, after: Option[(Long, String)]): String = {
    val sa = after.map { case (r, id) =>
      s""""search_after": [$r, "$id"],""" }.getOrElse("")
    s"""{"query": {"match_all": {}}, $sa
        "sort": [{"rank": "desc"}, "_doc_id"], "size": $size,
        "_source": ["_doc_id", "rank"]}"""
  }

  private def pages(pit: TablePit.Pit, size: Int, n: Int): Seq[(String, Long)] = {
    var after: Option[(Long, String)] = None
    (1 to n).flatMap { _ =>
      val rows = TablePit.page(spark, pit, pageReq(size, after))
        .as[(String, Long)].collect().toSeq
      after = rows.lastOption.map { case (id, r) => (r, id) }
      rows
    }
  }

  test("mid-merge pagination: 3 pages reconstruct the pinned ranking; vacuum refuses the pin") {
    val dir = Files.createTempDirectory("graft-pit-snap").toString
    val docs = (1 to 30).map(i => (s"doc$i", "upsert", i.toLong,
      (i * 37 % 100).toLong))
    CdcStream.mergeBatch(spark, batch(docs: _*), dir, 1L)
    val pit = TablePit.open(dir)
    assert(pit.base === Some(1L) && pit.deltas.isEmpty)
    // the full ranking as of the pin
    val want = TablePit.page(spark, pit, pageReq(30, None))
      .as[(String, Long)].collect().toSeq
    assert(want.size === 30)
    // merges land mid-session: epoch 2 deletes the current top and
    // reshuffles ranks; epoch 3 adds rows — then vacuum tries to drop v=1
    CdcStream.mergeBatch(spark, batch(
      (want.head._1, "delete", 100L, 0L),
      ("doc2", "upsert", 101L, 999L)), dir, 2L)
    CdcStream.mergeBatch(spark, batch(("new1", "upsert", 102L, 888L)), dir, 3L)
    val removed = CdcStream.vacuum(dir, keep = 2)
    assert(removed === Seq(), "the pinned v=1 must survive vacuum")
    assert(CdcStream.versionsOnDisk(dir).sorted === Seq(1L, 2L, 3L))
    // 3 pages of 10 from the pit reconstruct the pinned ranking exactly
    assert(pages(pit, 10, 3) === want)
    // the live table HAS moved (delete + new rows visible)
    val live = CdcStream.readSnapshot(spark, dir).get.count()
    assert(live === 30L) // 30 - 1 delete + doc2 replaced in place + new1
    // released → vacuum reclaims v=1
    TablePit.release(pit)
    assert(CdcStream.vacuum(dir, keep = 2) === Seq(1L))
    val e = intercept[IllegalStateException](TablePit.release(pit))
    assert(e.getMessage.contains("double release"), e.getMessage)
  }

  test("delta-log target: pinned deltas survive compaction + vacuum") {
    val dir = Files.createTempDirectory("graft-pit-delta").toString
    DeltaCdc.mergeBatchDelta(spark, batch(
      ("a", "upsert", 1L, 10L), ("b", "upsert", 2L, 20L)), dir, 1L,
      compactEvery = 99)
    DeltaCdc.mergeBatchDelta(spark, batch(
      ("c", "upsert", 3L, 30L)), dir, 2L, compactEvery = 99)
    val pit = TablePit.open(dir)
    assert(pit.base === None && pit.deltas === Seq(1L, 2L))
    val want = pages(pit, 2, 2)
    assert(want.map(_._1) === Seq("c", "b", "a"))
    // epoch 3 compacts everything into v=3; folded deltas vacuum —
    // except the pinned ones
    DeltaCdc.mergeBatchDelta(spark, batch(
      ("a", "delete", 4L, 0L)), dir, 3L, compactEvery = 1)
    assert(CdcStream.versionsOnDisk(dir) === Seq(3L))
    assert(DeltaCdc.vacuumDeltas(dir) === Seq(3L),
      "only the unpinned folded delta vacuums")
    assert(DeltaCdc.deltasOnDisk(dir).sorted === Seq(1L, 2L))
    // the pit still reads the pre-compaction state
    assert(pages(pit, 2, 2) === want)
    // the live table moved ('a' tombstoned)
    assert(DeltaCdc.readSnapshot(spark, dir).get.count() === 2L)
    TablePit.release(pit)
    assert(DeltaCdc.vacuumDeltas(dir).sorted === Seq(1L, 2L))
    // an empty target fails loud
    val e = intercept[IllegalStateException](
      TablePit.open(Files.createTempDirectory("graft-pit-empty").toString))
    assert(e.getMessage.contains("nothing to pin"), e.getMessage)
  }
}

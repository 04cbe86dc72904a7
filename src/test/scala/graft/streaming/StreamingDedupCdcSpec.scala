package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDC maintenance of the streaming-dedup stores: deletes free their
  * ids AND stop shadowing near-duplicates, upserts replace atomically
  * through the normal admission gate, replay converges, and
  * compaction physically purges dead rows from both stores.
  */
class StreamingDedupCdcSpec extends SparkSpec {
  import spark.implicits._

  private def textA = (1 to 80).map(i => s"alpha${i % 29}w$i").mkString(" ")
  private def textB = (1 to 80).map(i => s"beta${i % 31}x$i").mkString(" ")
  private def textC = (1 to 80).map(i => s"gamma${i % 23}y$i").mkString(" ")

  private def near(t: String) = {
    val toks = t.split(" "); toks(3) = "CHANGED"; toks.mkString(" ")
  }

  private def live(accepted: String): Map[Long, String] =
    StreamingDedup.liveAccepted(spark, accepted, "doc_id")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toMap

  test("delete frees the id and its near-dup shadow; upsert replaces through the gate") {
    val dir = java.nio.file.Files.createTempDirectory("dedupcdc").toString
    val accepted = s"$dir/accepted"; val index = s"$dir/index"
    def pb(epoch: Long, rows: (Long, String)*) =
      StreamingDedup.processBatch(rows.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", accepted, index, 0.8, epoch = epoch)

    pb(1L, 1L -> textA, 2L -> textB)
    assert(live(accepted).keySet === Set(1L, 2L))
    // near-dup of A is shadowed while A is live
    pb(2L, 10L -> near(textA))
    assert(live(accepted).keySet === Set(1L, 2L))

    // DELETE doc 1 → its id is free and its shadow is gone
    StreamingDedup.mergeCdcBatch(
      Seq((1L, null: String, "delete")).toDF("doc_id", "text", "_action"),
      "doc_id", "text", accepted, index, epoch = 3L)
    assert(live(accepted).keySet === Set(2L))
    pb(4L, 11L -> near(textA)) // no longer shadowed
    assert(live(accepted).keySet === Set(2L, 11L))

    // UPSERT doc 2 with new text: exactly one live row, new content
    StreamingDedup.mergeCdcBatch(
      Seq((2L, textC, "upsert")).toDF("doc_id", "text", "_action"),
      "doc_id", "text", accepted, index, epoch = 5L)
    val l5 = live(accepted)
    assert(l5.keySet === Set(2L, 11L))
    assert(l5(2L) === textC)
    // old B text no longer shadows; new C text does
    pb(6L, 12L -> near(textB))
    pb(7L, 13L -> near(textC))
    assert(live(accepted).keySet === Set(2L, 11L, 12L))

    // replaying the upsert epoch converges (accept wins its own
    // tombstone tie)
    StreamingDedup.mergeCdcBatch(
      Seq((2L, textC, "upsert")).toDF("doc_id", "text", "_action"),
      "doc_id", "text", accepted, index, epoch = 5L)
    assert(live(accepted) === Map(2L -> textC, 11L -> near(textA), 12L -> near(textB)))

    // compaction purges dead rows physically from BOTH stores
    StreamingDedup.compactStores(spark, accepted, index, "doc_id", maxFiles = 1)
    val physical = spark.read.parquet(accepted)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toMap
    assert(physical === Map(2L -> textC, 11L -> near(textA), 12L -> near(textB)),
      "accepted store holds exactly the live rows after compaction")
    val idxIds = spark.read.parquet(index)
      .select(col("doc_id").cast("long")).distinct().as[Long].collect().toSet
    assert(idxIds === Set(2L, 11L, 12L),
      "index rows of dead docs purged at compaction")
    // and the purged stores still dedup correctly
    pb(8L, 14L -> near(textC))
    assert(live(accepted).keySet === Set(2L, 11L, 12L))
  }

  test("first-ever batch may be a CDC batch: fresh store, tombstones land before any data") {
    val dir = java.nio.file.Files.createTempDirectory("dedupcdcfresh").toString
    val accepted = s"$dir/accepted"; val index = s"$dir/index"

    // the tombstone append creates acceptedPath BEFORE any data file
    // exists — processBatch must not try to read a data-less store
    StreamingDedup.mergeCdcBatch(
      Seq((1L, textA, "upsert"), (2L, textB, "upsert"),
          (3L, null: String, "delete")).toDF("doc_id", "text", "_action"),
      "doc_id", "text", accepted, index, epoch = 1L)
    assert(live(accepted).keySet === Set(1L, 2L))

    // a fresh store whose FIRST batch is deletes-only holds tombstones
    // and still no data; the next upsert epoch must work too
    val dir2 = java.nio.file.Files.createTempDirectory("dedupcdcfresh2").toString
    val accepted2 = s"$dir2/accepted"; val index2 = s"$dir2/index"
    StreamingDedup.mergeCdcBatch(
      Seq((9L, null: String, "delete")).toDF("doc_id", "text", "_action"),
      "doc_id", "text", accepted2, index2, epoch = 1L)
    StreamingDedup.mergeCdcBatch(
      Seq((9L, textC, "upsert")).toDF("doc_id", "text", "_action"),
      "doc_id", "text", accepted2, index2, epoch = 2L)
    assert(live(accepted2) === Map(9L -> textC))
  }
}

package graft.etl

import scala.util.Random

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, String, Long, String)*): DataFrame =
    rows.toDF("_doc_id", "_action", "_seq", "payload")

  private def finalState(state: DataFrame): Seq[(String, String)] =
    CdcMerge.snapshot(state).orderBy("_doc_id").collect()
      .map(r => (r.getAs[String]("_doc_id"), r.getAs[String]("payload"))).toSeq

  test("insert → modify → remove leaves no visible row (tombstone kept)") {
    val st = CdcMerge.initialState(batch(
      ("k1", "upsert", 1L, "v1"),
      ("k1", "upsert", 2L, "v2"),
      ("k1", "delete", 3L, null)))
    assert(finalState(st) === Seq())
    assert(st.count() === 1) // the tombstone survives internally
  }

  test("out-of-order and duplicate delivery resolve to highest seq") {
    val st = CdcMerge.initialState(batch(
      ("k1", "delete", 3L, null),
      ("k1", "upsert", 5L, "final"),
      ("k1", "upsert", 5L, "final"),
      ("k1", "upsert", 2L, "stale"),
      ("k2", "upsert", 1L, "x")))
    assert(finalState(st) === Seq(("k1", "final"), ("k2", "x")))
  }

  test("merge against existing state: untouched keys survive, deletes apply") {
    val st0 = CdcMerge.initialState(batch(
      ("a", "upsert", 1L, "old-a"), ("b", "upsert", 1L, "old-b"),
      ("c", "upsert", 1L, "old-c")))
    val st1 = CdcMerge.applyBatch(st0,
      batch(("a", "upsert", 10L, "new-a"), ("b", "delete", 11L, null)))
    assert(finalState(st1) === Seq(("a", "new-a"), ("c", "old-c")))
  }

  test("stale upsert after newer delete cannot resurrect the doc") {
    val st0 = CdcMerge.initialState(batch(("k", "delete", 9L, null)))
    val st1 = CdcMerge.applyBatch(st0, batch(("k", "upsert", 5L, "zombie")))
    assert(finalState(st1) === Seq())
  }

  test("random cross-batch interleavings equal the last-writer-wins oracle") {
    val rnd = new Random(42)
    val keys = (1 to 20).map(i => s"k$i")
    val events = for {
      k <- keys
      s <- 1 to 10
    } yield (k, if (rnd.nextInt(5) == 0) "delete" else "upsert", s.toLong, s"$k-v$s")
    val shuffled = rnd.shuffle(events)
    val expect = events.groupBy(_._1).view.mapValues(_.maxBy(_._3)).toMap
      .collect { case (k, e) if e._2 != "delete" => (k, e._4) }.toSeq.sorted

    // 5 sequential micro-batches; disorder crosses batch boundaries
    val batches = shuffled.grouped(40).toSeq
    var state = CdcMerge.initialState(
      batches.head.toDF("_doc_id", "_action", "_seq", "payload"))
    batches.tail.foreach { evs =>
      state = CdcMerge.applyBatch(state,
        evs.toDF("_doc_id", "_action", "_seq", "payload"))
    }
    assert(finalState(state) === expect)
  }
}

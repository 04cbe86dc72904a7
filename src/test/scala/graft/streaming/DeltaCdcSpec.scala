package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Delta-log CDC contracts: the merge-on-read target must be
  * indistinguishable from the full-rewrite target (same per-key LWW +
  * tombstone semantics) while writing only O(batch) per epoch, folding
  * to a full snapshot on the compaction cadence, surviving epoch
  * replay (including replay of the compacting epoch), and refusing a
  * fresh-checkpoint restart against a live target.
  */
class DeltaCdcSpec extends SparkSpec {
  import spark.implicits._

  /** (_doc_id, _action, _seq, payload) batch in CdcMerge contract shape. */
  private def batch(rows: (String, String, Long, String)*): DataFrame =
    rows.toSeq.toDF("_doc_id", "_action", "_seq", "payload")

  private val epochs = Seq(
    batch(("a", "upsert", 1, "a1"), ("b", "upsert", 2, "b1")),
    batch(("a", "upsert", 4, "a4"), ("c", "upsert", 5, "c1")),
    batch(("b", "delete", 6, null), ("a", "upsert", 3, "stale")), // late event loses to seq 4
    batch(("d", "upsert", 7, "d1"), ("b", "upsert", 1, "resurrect-no")), // loses to tombstone seq 6
    batch(("c", "delete", 8, null)))

  private def snap(dir: String): Seq[String] =
    DeltaCdc.readSnapshot(spark, dir).get
      .select("_doc_id", "payload").orderBy("_doc_id")
      .collect().map(_.toString).toSeq

  test("delta path state equals the full-rewrite path, with and without compaction") {
    val full = Files.createTempDirectory("graft-dcdc-full").toString
    val noCompact = Files.createTempDirectory("graft-dcdc-nc").toString
    val compacting = Files.createTempDirectory("graft-dcdc-c").toString
    epochs.zipWithIndex.foreach { case (b, e) =>
      CdcStream.mergeBatch(spark, b, full, e.toLong)
      DeltaCdc.mergeBatchDelta(spark, b, noCompact, e.toLong, compactEvery = 100)
      DeltaCdc.mergeBatchDelta(spark, b, compacting, e.toLong, compactEvery = 2)
    }
    val expected = CdcStream.readSnapshot(spark, full).get
      .select("_doc_id", "payload").orderBy("_doc_id")
      .collect().map(_.toString).toSeq
    assert(expected === Seq("[a,a4]", "[d,d1]")) // b,c tombstoned; a's late seq-3 lost
    assert(snap(noCompact) === expected)
    assert(snap(compacting) === expected)
    // no-compaction target never wrote a snapshot: every epoch was O(batch)
    assert(CdcStream.versionsOnDisk(noCompact).isEmpty)
    assert(DeltaCdc.deltasOnDisk(noCompact).sorted === (0L to 4L))
    // compacting target folded at the cadence
    assert(CdcStream.versionsOnDisk(compacting).nonEmpty)
  }

  test("replay of any epoch — including the compacting one — is idempotent") {
    val dir = Files.createTempDirectory("graft-dcdc-replay").toString
    // compactEvery=3: epoch 2 compacts into v=2
    epochs.take(3).zipWithIndex.foreach { case (b, e) =>
      DeltaCdc.mergeBatchDelta(spark, b, dir, e.toLong, compactEvery = 3)
    }
    assert(CdcStream.latestVersion(dir) === Some(2L))
    val once = snap(dir)
    // crash between sink write and checkpoint commit re-runs epoch 2:
    // d=2 and v=2 are overwritten from base v<2 (none) + d=0..2
    DeltaCdc.mergeBatchDelta(spark, epochs(2), dir, 2L, compactEvery = 3)
    assert(snap(dir) === once)
    assert(CdcStream.latestVersion(dir) === Some(2L))
  }

  test("vacuumDeltas drops only folded deltas; state unchanged") {
    val dir = Files.createTempDirectory("graft-dcdc-vac").toString
    epochs.zipWithIndex.foreach { case (b, e) =>
      DeltaCdc.mergeBatchDelta(spark, b, dir, e.toLong, compactEvery = 3)
    }
    // epoch 2 compacted (v=2); deltas 3,4 are live
    val before = snap(dir)
    assert(DeltaCdc.vacuumDeltas(dir) === Seq(0L, 1L, 2L))
    assert(DeltaCdc.deltasOnDisk(dir).sorted === Seq(3L, 4L))
    assert(snap(dir) === before)
    // next compaction folds the live tail; everything vacuumable again
    DeltaCdc.mergeBatchDelta(spark,
      batch(("e", "upsert", 9, "e1")), dir, 5L, compactEvery = 3)
    assert(CdcStream.latestVersion(dir) === Some(5L))
    assert(DeltaCdc.vacuumDeltas(dir) === Seq(3L, 4L, 5L))
    assert(DeltaCdc.readSnapshot(spark, dir).get.count() === 3) // a, d, e
  }

  test("random event sequences: delta path ≡ full path at every compaction cadence") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      // per-key unique seqs (shard sequence numbers), delivered out of
      // order across epochs — the disorder CdcMerge contracts to absorb
      val events = Seq("a", "b", "c", "d", "e").flatMap { k =>
        rnd.shuffle((1 to 20).toList).take(rnd.nextInt(5)).map { seq =>
          val act = if (rnd.nextInt(4) == 0) "delete" else "upsert"
          (k, act, seq.toLong, s"$k-$seq")
        }
      }
      val shuffled = rnd.shuffle(events)
      val batches = (0 until 4).map(e => shuffled.zipWithIndex
        .collect { case (ev, i) if i % 4 == e => ev })

      def deltaRun(every: Int): Seq[String] = {
        val dir = Files.createTempDirectory(s"graft-dcdc-p$trial-$every").toString
        batches.zipWithIndex.foreach { case (b, e) =>
          DeltaCdc.mergeBatchDelta(spark, batch(b: _*), dir, e.toLong, every)
        }
        snap(dir)
      }
      val full = Files.createTempDirectory(s"graft-dcdc-p$trial-full").toString
      batches.zipWithIndex.foreach { case (b, e) =>
        CdcStream.mergeBatch(spark, batch(b: _*), full, e.toLong)
      }
      val expected = CdcStream.readSnapshot(spark, full).get
        .select("_doc_id", "payload").orderBy("_doc_id")
        .collect().map(_.toString).toSeq
      // cadence 1 = compact every epoch (≡ full path), 2 = mixed, 100 = never
      Seq(1, 2, 100).foreach { every =>
        assert(deltaRun(every) === expected, s"trial $trial, compactEvery=$every")
      }
    }
  }

  test("restart guard: an epoch below on-disk state throws") {
    val dir = Files.createTempDirectory("graft-dcdc-guard").toString
    DeltaCdc.mergeBatchDelta(spark, epochs(0), dir, 5L)
    val e = intercept[IllegalArgumentException] {
      DeltaCdc.mergeBatchDelta(spark, epochs(1), dir, 3L)
    }
    assert(e.getMessage.contains("fresh checkpoint"))
  }

  test("null-key events are parked in the DLQ, not merged") {
    val dir = Files.createTempDirectory("graft-dcdc-dlq").toString
    val withBad = Seq(
      (Option("a"), "upsert", 1L, "a1"),
      (Option.empty[String], "upsert", 2L, "orphan"))
      .toDF("_doc_id", "_action", "_seq", "payload")
    DeltaCdc.mergeBatchDelta(spark, withBad, dir, 0L)
    assert(DeltaCdc.readSnapshot(spark, dir).get.count() === 1)
    val dlq = spark.read.parquet(s"$dir/dlq/epoch=0")
    assert(dlq.count() === 1)
    assert(dlq.head().getAs[String]("payload") === "orphan")
  }
}

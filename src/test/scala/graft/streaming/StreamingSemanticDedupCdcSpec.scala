package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDC maintenance of the semantic-dedup accepted corpus: a deleted
  * vector frees its id and stops shadowing its ε-neighbors, an upsert
  * replaces the vector (possibly moving cid) through the admission
  * gate, replay converges, and compaction physically purges dead rows
  * even across cid partitions.
  */
class StreamingSemanticDedupCdcSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dims)(d => (((seed * 31 + d * 7) % 13) - 6) / 6.0f)
  private def near(v: Array[Float]): Array[Float] =
    v.map(x => x * 1.0001f + 1e-5f)

  private def live(accepted: String): Set[Long] =
    StreamingSemanticDedup.liveAccepted(spark, accepted, "vec_id")
      .select(col("vec_id").cast("long")).as[Long].collect().toSet

  test("delete frees the eps-shadow; upsert replaces; compaction purges across cids") {
    val dir = java.nio.file.Files.createTempDirectory("semcdc").toString
    val accepted = s"$dir/accepted"
    def pb(epoch: Long, rows: (Long, Array[Float])*) =
      StreamingSemanticDedup.processBatch(rows.toSeq.toDF("vec_id", "embedding"),
        "vec_id", "embedding", accepted, 0.9, epoch = epoch)

    val vA = vec(1); val vB = vec(5)
    pb(1L, 1L -> vA, 2L -> vB)
    assert(live(accepted) === Set(1L, 2L))
    // ε-dup of A shadowed while A lives
    pb(2L, 10L -> near(vA))
    assert(live(accepted) === Set(1L, 2L))

    // DELETE vec 1 → shadow gone, id free
    StreamingSemanticDedup.mergeCdcBatch(
      Seq((1L, null: Array[Float], "delete")).toDF("vec_id", "embedding", "_action"),
      "vec_id", "embedding", accepted, epoch = 3L)
    assert(live(accepted) === Set(2L))
    pb(4L, 11L -> near(vA))
    assert(live(accepted) === Set(2L, 11L))

    // UPSERT vec 2 with a different vector (seed chosen so every
    // sign-group sum is far from zero — near() must stay in the same
    // bucket, since cross-bucket ε-dups are out of SemDeDup's contract)
    val vC = vec(2)
    StreamingSemanticDedup.mergeCdcBatch(
      Seq((2L, vC, "upsert")).toDF("vec_id", "embedding", "_action"),
      "vec_id", "embedding", accepted, epoch = 5L)
    assert(live(accepted) === Set(2L, 11L))
    // the NEW vector shadows its ε-dups; the OLD one no longer does
    pb(6L, 12L -> near(vC))
    pb(7L, 13L -> near(vB))
    assert(live(accepted) === Set(2L, 11L, 13L))

    // replay of the upsert epoch converges
    StreamingSemanticDedup.mergeCdcBatch(
      Seq((2L, vC, "upsert")).toDF("vec_id", "embedding", "_action"),
      "vec_id", "embedding", accepted, epoch = 5L)
    assert(live(accepted) === Set(2L, 11L, 13L))

    // compaction purges dead rows physically — including vec 2's old
    // version sitting in a DIFFERENT cid partition than its new one
    StreamingSemanticDedup.compactAccepted(spark, accepted, "vec_id", maxFiles = 1)
    val physical = spark.read.option("mergeSchema", "true").parquet(accepted)
      .select(col("vec_id").cast("long")).as[Long].collect().toSeq
    assert(physical.sorted === Seq(2L, 11L, 13L),
      s"exactly one physical row per live id, got $physical")
    // and admission still works on the purged store
    pb(8L, 14L -> near(vC))
    assert(live(accepted) === Set(2L, 11L, 13L))
  }

  test("first-ever batch may be a CDC batch: fresh store, tombstones land before any data") {
    val dir = java.nio.file.Files.createTempDirectory("semcdcfresh").toString
    val accepted = s"$dir/accepted"

    // tombstone append creates acceptedPath before any data partition
    // exists — the probe must treat the store as empty, not unreadable
    StreamingSemanticDedup.mergeCdcBatch(
      Seq((1L, vec(1), "upsert"), (2L, vec(5), "upsert"),
          (3L, null: Array[Float], "delete"))
        .toDF("vec_id", "embedding", "_action"),
      "vec_id", "embedding", accepted, epoch = 1L)
    assert(live(accepted) === Set(1L, 2L))

    // deletes-only first batch, then an upsert of the same id
    val dir2 = java.nio.file.Files.createTempDirectory("semcdcfresh2").toString
    val accepted2 = s"$dir2/accepted"
    StreamingSemanticDedup.mergeCdcBatch(
      Seq((9L, null: Array[Float], "delete")).toDF("vec_id", "embedding", "_action"),
      "vec_id", "embedding", accepted2, epoch = 1L)
    StreamingSemanticDedup.mergeCdcBatch(
      Seq((9L, vec(2), "upsert")).toDF("vec_id", "embedding", "_action"),
      "vec_id", "embedding", accepted2, epoch = 2L)
    assert(live(accepted2) === Set(9L))
  }
}

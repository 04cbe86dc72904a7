package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  // distinct seeds share no tokens at all; near-dups are made by
  // appending a short suffix to the same seed's text
  private def doc(seed: Int, tokens: Int = 50): String =
    (1 to tokens).map(i => s"s${seed}t$i").mkString(" ")

  private def dirs(): (String, String, String) = {
    val base = Files.createTempDirectory("graft-sdedup")
    (s"$base/accepted", s"$base/index", s"$base/ckpt")
  }

  private def acceptedIds(path: String): Set[Long] =
    spark.read.parquet(path).select("doc_id").as[Long].collect().toSet

  test("cross-batch near-dups are dropped, novel docs accepted, index grows") {
    val (acc, idx, _) = dirs()
    val b1 = Seq((1L, doc(1)), (2L, doc(2)), (3L, doc(3))).toDF("doc_id", "text")
    StreamingDedup.processBatch(b1, "doc_id", "text", acc, idx, 0.8)
    assert(acceptedIds(acc) === Set(1L, 2L, 3L))

    // 100 near-dups accepted doc 1; 101 novel; 102/103 intra-batch
    // near-dups of each other (lower id survives)
    val b2 = Seq(
      (100L, doc(1) + " extra"),
      (101L, doc(9)),
      (102L, doc(8) + " tail"),
      (103L, doc(8) + " fins")).toDF("doc_id", "text")
    StreamingDedup.processBatch(b2, "doc_id", "text", acc, idx, 0.8)
    assert(acceptedIds(acc) === Set(1L, 2L, 3L, 101L, 102L))

    // accepted doc 102 is now indexed: its future near-dups drop too
    val b3 = Seq((200L, doc(8) + " coda")).toDF("doc_id", "text")
    StreamingDedup.processBatch(b3, "doc_id", "text", acc, idx, 0.8)
    assert(acceptedIds(acc) === Set(1L, 2L, 3L, 101L, 102L))
  }

  test("epoch replay is idempotent on the accepted set") {
    val (acc, idx, _) = dirs()
    val b1 = Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text")
    StreamingDedup.processBatch(b1, "doc_id", "text", acc, idx, 0.8)
    val once = acceptedIds(acc)
    StreamingDedup.processBatch(b1, "doc_id", "text", acc, idx, 0.8)
    assert(acceptedIds(acc) === once)
    assert(spark.read.parquet(acc).count() === once.size.toLong,
      "replay must not append duplicate accepted rows")
  }

  test("streaming wiring: foreachBatch loop dedups across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val (acc, idx, ckpt) = dirs()
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.start(in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", acc, idx, ckpt, threshold = 0.8)
    in.addData((1L, doc(1)), (2L, doc(2)))
    q.processAllAvailable()
    in.addData((10L, doc(1) + " more"), (11L, doc(5)))
    q.processAllAvailable()
    q.stop()
    assert(acceptedIds(acc) === Set(1L, 2L, 11L))
  }
}

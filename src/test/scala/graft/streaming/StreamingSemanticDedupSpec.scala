package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // deterministic unit-ish vectors: family = (7*seed) mod 5, so seeds
  // used in one test must hit distinct residues (all
  // positive → every vector of a seed family lands in the same sign
  // bucket); near-dups perturb one coordinate slightly
  private def vec(seed: Int, wobble: Float = 0f): Array[Float] = {
    val v = Array.tabulate(8)(d => 0.5f + ((seed * 7 + d * 3) % 5) * 0.1f)
    v(0) = v(0) + wobble
    v
  }

  private def dirs(): (String, String) = {
    val base = Files.createTempDirectory("graft-semdedup-stream")
    (s"$base/accepted", s"$base/ckpt")
  }

  private def acceptedIds(path: String): Set[Long] =
    spark.read.parquet(path).select("vec_id").as[Long].collect().toSet

  test("cross-batch ε-ball dups drop, novel vectors accepted, probe stays pruned") {
    val (acc, _) = dirs()
    val b1 = Seq((1L, vec(1)), (2L, vec(2)), (3L, vec(3)))
      .toDF("vec_id", "embedding")
    StreamingSemanticDedup.processBatch(b1, "vec_id", "embedding", acc, 0.999)
    assert(acceptedIds(acc) === Set(1L, 2L, 3L))

    // 100 is an ε-dup of accepted 1; 101 novel; 102/103 intra-batch
    // dups of each other (lower id survives)
    val b2 = Seq(
      (100L, vec(1, wobble = 0.001f)),
      (101L, vec(9)),
      (102L, vec(5)),
      (103L, vec(5, wobble = 0.001f))).toDF("vec_id", "embedding")
    StreamingSemanticDedup.processBatch(b2, "vec_id", "embedding", acc, 0.999)
    assert(acceptedIds(acc) === Set(1L, 2L, 3L, 101L, 102L))

    // accepted corpus is the index: later dups of 102 drop too
    val b3 = Seq((200L, vec(5, wobble = -0.001f))).toDF("vec_id", "embedding")
    StreamingSemanticDedup.processBatch(b3, "vec_id", "embedding", acc, 0.999)
    assert(acceptedIds(acc) === Set(1L, 2L, 3L, 101L, 102L))

    // the layout really is bucket-partitioned (pruned probe scans),
    // on the same ids SemanticDedup.bucketIds computes standalone
    val persisted = spark.read.parquet(acc)
      .select(col("vec_id"), col("cid").cast("long").as("cid"))
    val recomputed = graft.operators.SemanticDedup.bucketIds(
      spark.read.parquet(acc), "vec_id", "embedding")
    assert(persisted.join(recomputed, Seq("vec_id", "cid"), "left_anti").isEmpty)
  }

  test("epoch replay is idempotent on the accepted set") {
    val (acc, _) = dirs()
    val b1 = Seq((1L, vec(1)), (2L, vec(2))).toDF("vec_id", "embedding")
    StreamingSemanticDedup.processBatch(b1, "vec_id", "embedding", acc, 0.999)
    val first = acceptedIds(acc)
    StreamingSemanticDedup.processBatch(b1, "vec_id", "embedding", acc, 0.999)
    assert(acceptedIds(acc) === first)
  }

  test("MemoryStream wiring: foreachBatch loop dedups across real micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val (acc, ckpt) = dirs()
    val in = MemoryStream[(Long, Array[Float])]
    val q = StreamingSemanticDedup.start(
      in.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", acc, ckpt, threshold = 0.999)
    try {
      in.addData((1L, vec(1)), (2L, vec(2)))
      q.processAllAvailable()
      in.addData((10L, vec(1, wobble = 0.001f)), (11L, vec(5)))
      q.processAllAvailable()
      assert(acceptedIds(acc) === Set(1L, 2L, 11L))
    } finally q.stop()
  }
}

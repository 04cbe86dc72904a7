package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamingSemanticDedup

/** Skew-guard behavior of the SEMANTIC dedup path — the embedding-side
  * mirror of [[DedupGuardSpec]]: exact-duplicate collapse before the
  * ε-ball pair kernel, the post-collapse hot-bucket cap, and the same
  * guards threaded through the streaming epoch loop. The 2k-identical
  * -embeddings case is the degenerate one a raw implementation pays
  * C(2000,2) ≈ 2M kernel pairs for inside a single sign bucket; with
  * collapse it is one representative and a declarative re-expansion —
  * zero kernel pairs.
  */
class SemanticDedupGuardSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dims)(d => (((seed * 31 + d * 7) % 13) - 6) / 6.0f)

  test("2000 identical embeddings collapse to one representative (no quadratic pair work)") {
    val n = 2000
    val v = vec(1)
    // lit array keeps ONE copy in the plan; also proves the collapse
    // fingerprints the QUANTIZED value, not object identity
    val e = spark.range(1, n + 1)
      .select(col("id").as("vec_id"),
        array(v.map(x => lit(x)).toIndexedSeq: _*).as("embedding"))
    val out = SemanticDedup.assignments(e, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.length === n)
    assert(out.count(_._2 == 1L) === 1, "exactly one kept")
    assert(out.forall { case (id, kept, rep) =>
      if (id == 1L) kept == 1L && rep == 1L else kept == 0L && rep == 1L
    })
    // and the degenerate corpus is NOT a hot bucket: collapse absorbed it
    assert(SemanticDedup.hotBuckets(e, "vec_id", "embedding", 0.9,
      maxBucket = 2).isEmpty)
  }

  test("collapse preserves assignments on a mixed corpus (vs brute force)") {
    val T = 0.9
    val raw = Seq(
      1L -> vec(1), 2L -> vec(1), 3L -> vec(1), // identical group
      4L -> vec(1).map(x => x * 1.0001f + 1e-4f), // near-dup, byte-distinct
      5L -> vec(2), 6L -> vec(3), 7L -> vec(2) // others (5,7 identical)
    )
    val e = raw.toDF("vec_id", "embedding")
    val got = SemanticDedup.assignments(e, "vec_id", "embedding", T)
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // brute force over the quantized vectors — the exact contract
    val q = e.select(col("vec_id"),
        graft.functions.VectorFns.quantize(col("embedding")))
      .as[(Long, Array[Long])].collect().sortBy(_._1)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val cid = q.map { case (id, v) => id -> SignIvf.cidOf(v, 4) }.toMap
    val expected = q.map { case (id, v) =>
      val lower = q.filter { case (o, ov) =>
        o < id && cid(o) == cid(id) && cos(ov, v) >= T
      }.map(_._1)
      val rep = if (lower.isEmpty) id else lower.min
      (id, cid(id).toLong, if (lower.isEmpty) 1L else 0L, rep)
    }.toSeq
    assert(got.toSeq === expected)
  }

  test("hot buckets beyond maxBucket skip ε-marking (recall cap) and are observable") {
    // near-identical but byte-distinct vectors: collapse can't merge
    // them, so one sign bucket floods
    val e = (1 to 8).map { i =>
      (i.toLong, vec(1).map(x => x + i * 1e-4f))
    }.toDF("vec_id", "embedding")
    val hot = SemanticDedup.hotBuckets(e, "vec_id", "embedding", 0.9, maxBucket = 2)
    assert(hot.count() > 0, "expected an oversized bucket on templated vectors")

    val open = SemanticDedup.assignments(e, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(open.values.count(_ == 1L) === 1, "default cap: greedy pass removes all but one")

    val capped = SemanticDedup.assignments(e, "vec_id", "embedding", 0.9,
        maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(capped.values.forall(_ == 1L),
      "capped bucket skips cross-group marking — all kept, none invented")

    // exact duplicates are immune to the cap: collapse, not the kernel,
    // removes them
    val dups = (1 to 6).map(i => (i.toLong, vec(1))).toDF("vec_id", "embedding")
    val dupOut = SemanticDedup.assignments(dups, "vec_id", "embedding", 0.9,
        maxBucket = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(dupOut.count(_._2 == 1L) === 1)
    assert(dupOut.forall { case (id, _, rep) => rep == (if (id == 1L) id else 1L) })
  }

  test("streaming epoch absorbs a 2000-identical-embedding batch") {
    val dir = java.nio.file.Files.createTempDirectory("semguard").toString
    val accepted = s"$dir/accepted"
    val n = 2000
    val v1 = vec(1); val v2 = vec(5)
    val batch1 = spark.range(1, n + 1)
      .select(col("id").as("vec_id"),
        array(v1.map(x => lit(x)).toIndexedSeq: _*).as("embedding"))
    StreamingSemanticDedup.processBatch(batch1, "vec_id", "embedding",
      accepted, 0.9)
    val acc1 = spark.read.parquet(accepted)
    assert(acc1.count() === 1L, "one survivor from 2000 identical vectors")
    assert(acc1.select("vec_id").as[Long].head() === 1L)

    // next epoch: more of the same flood plus one genuinely new vector
    val batch2 = spark.range(n + 1, 2 * n)
      .select(col("id").as("vec_id"),
        array(v1.map(x => lit(x)).toIndexedSeq: _*).as("embedding"))
      .union(Seq((5000L, v2)).toDF("vec_id", "embedding"))
    StreamingSemanticDedup.processBatch(batch2, "vec_id", "embedding",
      accepted, 0.9)
    val acc2 = spark.read.parquet(accepted).select("vec_id").as[Long]
      .collect().toSet
    assert(acc2 === Set(1L, 5000L),
      "flood members dropped by the probe, the new vector accepted")
  }
}

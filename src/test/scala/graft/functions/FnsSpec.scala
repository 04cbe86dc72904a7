package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("rollingHash matches a plain-Scala reference implementation") {
    val p = (1L << 31) - 1
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => Math.floorMod(acc * 31L + c.toLong, p))
    val inputs = Seq("", "a", "spark", "the quick brown fox", "ümlaut-free ascii")
    val got = inputs.toDF("s")
      .select(TextFns.rollingHash(col("s")).as("h")).collect().map(_.getLong(0))
    assert(got.toSeq === inputs.map(ref))
  }

  test("normalizeText canonicalizes case and whitespace") {
    val got = Seq("  The   QUICK\tbrown  ", "the quick brown")
      .toDF("s").select(TextFns.normalizeText(col("s"))).collect().map(_.getString(0))
    assert(got(0) === got(1))
  }

  test("shingles3: sliding distinct 3-grams; short docs collapse whole") {
    val got = Seq("a b c d", "x y")
      .toDF("s")
      .select(TextFns.shingles3(TextFns.tokens(col("s"))).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq("x y"))
  }

  test("minhash signature similarity tracks Jaccard similarity") {
    // two near-identical docs vs two unrelated docs
    val d1 = (1 to 100).map(i => s"tok$i").mkString(" ")
    val d2 = (1 to 95).map(i => s"tok$i").mkString(" ") + " x1 x2 x3 x4 x5"
    val d3 = (200 to 300).map(i => s"tok$i").mkString(" ")
    val sigs = Seq(d1, d2, d3).toDF("s")
      .select(TextFns.minhashSignature(
        TextFns.shingles3(TextFns.tokens(col("s"))), 32).as("sig"))
      .collect().map(_.getSeq[Long](0))
    def agree(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    assert(agree(sigs(0), sigs(1)) > 0.5) // high-jaccard pair
    assert(agree(sigs(0), sigs(2)) < 0.2) // unrelated pair
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val near = base + " extra"
    val far = (500 to 580).map(i => s"w$i").mkString(" ")
    val fps = Seq(base, near, far).toDF("s")
      .select(TextFns.simhash60(TextFns.tokens(col("s"))).as("fp"))
      .collect().map(_.getLong(0))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(0), fps(1)) <= 3)
    assert(ham(fps(0), fps(2)) > 10)
  }

  test("quantized cosine of identical vectors is 1.0; orthogonal is 0.0") {
    val df = Seq(
      (Array(1.0f, 0.0f, 0.5f), Array(1.0f, 0.0f, 0.5f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
      .select(
        VectorFns.quantize(col("a")).as("qa"),
        VectorFns.quantize(col("b")).as("qb"))
      .select(VectorFns.qcosine(
        VectorFns.qdot(col("qa"), col("qb")),
        VectorFns.qnorm2(col("qa")), VectorFns.qnorm2(col("qb"))).as("sim"))
    val sims = df.collect().map(_.getDouble(0))
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(sims(1) === 0.0)
  }

  test("HLL approx distinct error shrinks with the rsd knob") {
    val row = Tables.load(spark, sf(), "lineitem")
      .agg(
        approx_count_distinct(col("l_orderkey")).as("default_rsd"), // rsd 5%
        approx_count_distinct(col("l_orderkey"), 0.005).as("tight_rsd"),
        countDistinct(col("l_orderkey")).as("exact")).head()
    val exact = row.getLong(2).toDouble
    assert(math.abs(row.getLong(0) - exact) / exact < 0.15)
    assert(math.abs(row.getLong(1) - exact) / exact < 0.02)
  }

  test("IVF ANN recall beats its corpus-scan fraction vs brute force") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(graft.Registry.byName("q75_ann_brute").run(spark, sf()))
    // trained k-means quantizer (spec-only — float training isn't
    // oracle-portable): nprobe/nlist = 25% of the corpus scanned;
    // uncorrelated buckets would give ~0.25 recall
    val kmeans = pairs(graft.operators.IvfIndex.topK(
      graft.sources.Tables.load(spark, sf(), "embeddings"),
      "vec_id", "embedding", org.apache.spark.sql.functions.col("vec_id") % 50 === 0,
      graft.operators.IvfIndex.Params(nlist = 16, nprobe = 4, iters = 3, k = 5)))
    val kmRecall = (brute & kmeans).size.toDouble / brute.size
    assert(kmRecall >= 0.5, s"k-means IVF recall $kmRecall too low")
    // analytic sign quantizer (the oracle-checked q76 path): untrained,
    // so weaker than k-means — it must still clearly beat the 0.25
    // uncorrelated-bucket baseline for its 4/16-bucket scan fraction
    // (measured 0.46 with multi-probe ordering, vs 0.36 Hamming-order)
    val sign = pairs(graft.Registry.byName("q76_ann_ivf").run(spark, sf()))
    val signRecall = (brute & sign).size.toDouble / brute.size
    assert(signRecall >= 0.35, s"sign-IVF recall $signRecall too low")
  }
}

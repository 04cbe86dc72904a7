package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The pinned-IEEE exponential kernel's two independent contracts:
  *
  *   1. ACCURACY — the range-reduced Taylor kernel tracks
  *      java.lang.Math.exp within 1 ppm over its whole domain
  *      [−14, 0] (the q342/q343 oracles share the kernel TEXT with
  *      the engine, so the hash gate pins only cross-engine
  *      determinism; this spec is what pins the arithmetic to the
  *      real exponential).
  *   2. CONSTANTS — the driver-side λ constants embedded in compiled
  *      requests come from StrictMath.log (fdlibm, bit-specified by
  *      the JVM spec); the literals the q342/q343 oracles replay are
  *      pinned here so a tzdata-style platform drift would fail this
  *      spec before it could silently shift scores.
  */
class PinnedExpSpec extends SparkSpec {

  test("pinned exp kernel stays within 1 ppm of java.lang.Math.exp on [-14, 0]") {
    import spark.implicits._
    val grid = (0 to 2800).map(i => -14.0 * i / 2800.0)
    val edges = Seq(0.0, -1e-12, -1e-6, -0.6931471805599453,
      -0.6931471805599454, -1.0, -13.999999999, -14.0, -14.0000001, -42.0)
    val xs = (grid ++ edges).distinct
    val got = xs.toDF("x")
      .withColumn("ppm", expr(QueryDsl.pinnedExpPpmSql("x")))
      .select("x", "ppm").as[(Double, Long)].collect()
    assert(got.length === xs.length)
    got.foreach { case (x, ppm) =>
      if (x < -14.0) assert(ppm === 0L, s"x=$x must underflow to 0")
      else {
        val want = math.floor(1e6 * java.lang.Math.exp(x))
        assert(math.abs(ppm - want) <= 1.0, s"x=$x ppm=$ppm want=$want")
        assert(ppm >= 0L && ppm <= 1000000L, s"x=$x ppm=$ppm out of range")
      }
    }
    // the exact endpoint: exp(0) is EXACTLY the neutral 10^6 (n=0,
    // r=0, poly=1.0 — no rounding anywhere on this path)
    assert(got.toMap.apply(0.0) === 1000000L)
  }

  test("oracle lambda constants pin to StrictMath (fdlibm) bit-for-bit") {
    // the constant ln(1/2) every 0.5-decay request derives from —
    // q342 divides it by scale, q343 by scale^2; if this literal ever
    // moves, the oracles' embedded lambdas are stale
    assert(java.lang.Double.toString(StrictMath.log(0.5)) ===
      "-0.6931471805599453")
    assert(java.lang.Double.toString(StrictMath.log(0.5) / 200.0) ===
      "-0.0034657359027997266")
    assert(java.lang.Double.toString(StrictMath.log(0.5) / (150.0 * 150.0)) ===
      "-3.080654135821979E-5")
  }

  test("exp/gauss decay semantics: origin scores 10^6, decay at scale, missing is neutral") {
    import spark.implicits._
    val t = Seq((1L, Some(300L)), (2L, Some(500L)), (3L, Some(100L)),
      (4L, Option.empty[Long]), (5L, Some(310L))).toDF("id", "v")
    def run(fn: String, spec: String) = QueryDsl.search(t,
      s"""{"query": {"function_score": {
            "query": {"match_all": {}},
            "functions": [{"$fn": {"v": $spec}}],
            "boost_mode": "replace"}},
          "sort": ["id"], "size": 10, "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toMap
    val e = run("exp", """{"origin": 300, "scale": 200, "decay": 0.5}""")
    assert(e(1L) === 1000000L)            // d = 0
    assert(e(2L) === 500000L)             // d = scale -> decay exactly
    assert(e(4L) === 1000000L)            // missing field -> neutral
    assert(e(3L) === e(2L))               // symmetric |v - origin|
    assert(e(5L) < 1000000L && e(5L) > e(2L)) // monotone in distance
    val g = run("gauss", """{"origin": 300, "scale": 200, "decay": 0.5}""")
    assert(g(1L) === 1000000L)
    assert(g(2L) === 500000L)             // d = scale -> decay exactly
    assert(g(4L) === 1000000L)
    assert(g(5L) > e(5L))                 // gauss is flatter near origin
    // offset: distances inside it score the full 10^6
    val eo = run("exp",
      """{"origin": 300, "scale": 200, "offset": 250, "decay": 0.5}""")
    assert(eo(2L) === 1000000L && eo(3L) === 1000000L)
    // far past the underflow horizon: exact 0, never negative
    val far = run("exp", """{"origin": 300, "scale": 1, "decay": 0.5}""")
    assert(far(2L) === 0L)
    // validation stays loud
    def bad(fn: String, spec: String, frag: String): Unit = {
      val ex = intercept[IllegalArgumentException](run(fn, spec))
      assert(ex.getMessage.contains(frag), ex.getMessage)
    }
    bad("exp", """{"origin": 300, "scale": 0, "decay": 0.5}""",
      "scale must be positive")
    bad("gauss", """{"origin": 300, "scale": 10, "decay": 1}""",
      "strictly inside (0, 1)")
    bad("exp", """{"origin": 300, "scale": 10, "offset": -1}""",
      "offset must be >= 0")
    bad("exp", """{"scale": 10}""", "requires an integer 'origin'")
    bad("exp", """{"origin": 1, "scale": 10, "sigma": 2}""",
      "unsupported exp decay option 'sigma'")
  }
}

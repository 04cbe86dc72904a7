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
    // the static JVM kernel (what the ENGINE evaluates — one codegen
    // call, no Janino cliff) must match the SQL-text form (what the
    // ORACLES replay) bit-for-bit on every grid point
    val parity = xs.toDF("x")
      .select(col("x"),
        expr(QueryDsl.pinnedExpPpmSql("x")).as("sql_ppm"),
        graft.plans.PinnedExp(col("x")).as("jvm_ppm"))
      .as[(Double, Long, Long)].collect()
    parity.foreach { case (x, a, b) =>
      assert(a === b, s"SQL/JVM kernel divergence at x=$x: $a vs $b")
    }
    // and the two read the SAME coefficient constants
    assert(graft.plans.PinnedMath.ExpCoefD.toSeq ===
      QueryDsl.ExpCoef.map(_.toDouble))
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

  test("pinned ln kernel stays within 1 ppm of java.lang.Math.log") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val xs = (Seq(1L, 2L, 3L, 10L, 100L, 1000L, 1000000L,
      (1L << 31), (1L << 52), (1L << 62), Long.MaxValue) ++
      (0 to 60).map(k => (1L << k) - 1).filter(_ >= 1) ++
      (0 to 60).map(k => (1L << k) + 1) ++
      (1 to 400).map(_ => math.abs(rnd.nextLong()) % 100000000L + 1L)).distinct
    val got = xs.toDF("x")
      .select(col("x"), QueryDsl.pinnedLnPpm(col("x")).as("ppm"))
      .as[(Long, Long)].collect()
    assert(got.length === xs.length)
    got.foreach { case (x, ppm) =>
      val want = math.floor(1e6 * java.lang.Math.log(x.toDouble))
      assert(math.abs(ppm - want) <= 1.0, s"x=$x ppm=$ppm want=$want")
    }
    // ln(1) is EXACTLY 0 (n=0, m=1, t=0 — no rounding on this path),
    // and ln(2^k) is exactly floor(10^6·k·ln2)
    assert(got.toMap.apply(1L) === 0L)
    // the ln(10) literal the log10 arm divides by
    assert(java.lang.Double.toString(StrictMath.log(10.0)) ===
      "2.302585092994046")
    // the JVM kernel and the oracle CTE generator must read the SAME
    // constants — one definition, two replays
    assert(graft.plans.PinnedMath.Coef.toSeq ===
      QueryDsl.LnCoef.map(_.toDouble))
    assert(graft.plans.PinnedMath.Ln2 === QueryDsl.Ln2Lit.toDouble)
  }

  test("log-modified field_value_factor rides the ppm rails and raises on non-positive") {
    import spark.implicits._
    val t = Seq((1L, 0L), (2L, 9L), (3L, 99L)).toDF("id", "v")
    def run(mod: String) = QueryDsl.search(t,
      s"""{"query": {"function_score": {
            "query": {"match_all": {}},
            "functions": [{"field_value_factor":
              {"field": "v", "modifier": "$mod"}}],
            "boost_mode": "replace"}},
          "sort": ["id"], "size": 10, "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toMap
    val ln1p = run("ln1p")
    assert(ln1p(1L) === 0L)                                    // ln(1) = 0
    assert(ln1p(2L) === math.floor(1e6 * math.log(10.0)).toLong)
    assert(ln1p(3L) === math.floor(1e6 * math.log(100.0)).toLong)
    val log1p = run("log1p")
    // DOCUMENTED: the log10 family is within 1 ppm but NOT decade-
    // exact — floor(floor(1e6·ln10)/ln10) = 999999 (an approximate ln
    // cannot make powers of ten land exactly; the oracle replays the
    // same arithmetic)
    assert(log1p(2L) === 999999L)
    // ln of a zero value raises (the negative-log footgun made loud)
    val e = intercept[Throwable](run("ln"))
    assert(e.getMessage.contains("log of non-positive"), e.getMessage)
    // ppm mixing guard extends to log-modified field_value_factor
    val e2 = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"query": {"function_score": {"query": {"match_all": {}},
          "functions": [{"field_value_factor": {"field": "v", "modifier": "ln1p"}},
                        {"weight": 2}]}}}"""))
    assert(e2.getMessage.contains("cannot mix ppm-scaled"), e2.getMessage)
    // reciprocal stays out
    val e3 = intercept[IllegalArgumentException](run("reciprocal"))
    assert(e3.getMessage.contains("reciprocal"), e3.getMessage)
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
    // DATE MODE: ISO origin + duration scale — the recency boost.
    // Exact-decay-at-scale can land either side of a ppm (λ·d only
    // approximates ln(decay) when scale isn't a power of two), so the
    // pins are the exact origin, near-halving, and monotonicity.
    val dt = Seq(
      (1L, Some("2024-01-15 00:00:00")),
      (2L, Some("2024-01-22 00:00:00")),  // +7d = scale
      (3L, Some("2024-01-29 00:00:00")),  // +14d
      (4L, Option.empty[String])
    ).toDF("id", "s0").select(col("id"), to_timestamp(col("s0")).as("ts"))
    val dd = QueryDsl.search(dt,
      """{"query": {"function_score": {
           "query": {"match_all": {}},
           "functions": [{"exp": {"ts": {
             "origin": "2024-01-15T00:00:00", "scale": "7d",
             "decay": 0.5}}}],
           "boost_mode": "replace"}},
         "sort": ["id"], "size": 10, "_source": ["id", "score"]}""")
      .as[(Long, Long)].collect().toMap
    assert(dd(1L) === 1000000L)
    assert(math.abs(dd(2L) - 500000L) <= 1L)
    assert(math.abs(dd(3L) - 250000L) <= 1L)
    assert(dd(4L) === 1000000L)            // NULL ts -> neutral
    // validation stays loud
    def bad(fn: String, spec: String, frag: String): Unit = {
      val ex = intercept[IllegalArgumentException](run(fn, spec))
      assert(ex.getMessage.contains(frag), ex.getMessage)
    }
    def badD(json: String, frag: String): Unit = {
      val ex = intercept[IllegalArgumentException](QueryDsl.search(dt, json))
      assert(ex.getMessage.contains(frag), ex.getMessage)
    }
    badD("""{"query": {"function_score": {"query": {"match_all": {}},
        "functions": [{"exp": {"ts": {"origin": "2024-01-15T00:00:00",
          "scale": 7}}}]}}}""", "duration string in date mode")
    badD("""{"query": {"function_score": {"query": {"match_all": {}},
        "functions": [{"exp": {"ts": {"origin": "2024-01-15T00:00:00",
          "scale": "7w"}}}]}}}""", "must match <n>[dhms]")
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

package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** RangeBandJoin must equal the raw theta join exactly — including
  * boundary points (pt == lo in, pt == hi out) — and be invariant to
  * the band width (a pure physical knob).
  */
class RangeBandJoinSpec extends SparkSpec {
  import spark.implicits._

  private def data(seed: Int) = {
    val rnd = new Random(seed)
    val pts = (0 until 200).map(i => (i.toLong, rnd.nextInt(1000).toDouble))
      .toDF("p_id", "pt")
    val ivs = (0 until 40).map { i =>
      val lo = rnd.nextInt(900)
      (i.toLong, lo.toDouble, (lo + 1 + rnd.nextInt(150)).toDouble)
    }.toDF("iv_id", "lo", "hi")
    (pts, ivs)
  }

  private def theta(pts: org.apache.spark.sql.DataFrame,
      ivs: org.apache.spark.sql.DataFrame) =
    pts.join(ivs, col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("p_id", "iv_id").orderBy("p_id", "iv_id").collect().toSeq

  private def banded(pts: org.apache.spark.sql.DataFrame,
      ivs: org.apache.spark.sql.DataFrame, w: Double) =
    RangeBandJoin.join(pts, ivs, "pt", "lo", "hi", w)
      .select("p_id", "iv_id").orderBy("p_id", "iv_id").collect().toSeq

  test("equals the raw theta join on random data") {
    val (pts, ivs) = data(11)
    assert(banded(pts, ivs, 64.0) === theta(pts, ivs))
  }

  test("boundary semantics: lo inclusive, hi exclusive, exactly at band edges") {
    val pts = Seq((1L, 100.0), (2L, 200.0), (3L, 199.9999)).toDF("p_id", "pt")
    val ivs = Seq((1L, 100.0, 200.0)).toDF("iv_id", "lo", "hi")
    val got = banded(pts, ivs, 100.0).map(r => r.getLong(0))
    assert(got === Seq(1L, 3L)) // pt=100 in, pt=200 out (hi exclusive)
  }

  test("result is invariant to band width") {
    val (pts, ivs) = data(42)
    val w1 = banded(pts, ivs, 16.0)
    val w2 = banded(pts, ivs, 500.0)
    assert(w1 === w2)
  }

  test("non-finite interval bounds are refused, not silently dropped") {
    val pts = Seq((1L, 5.0)).toDF("p_id", "pt")
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)) {
      val ivs = Seq((1L, 0.0, bad)).toDF("iv_id", "lo", "hi")
      val ex = intercept[Exception] { banded(pts, ivs, 10.0) }
      assert(ex.getMessage.contains("non-finite interval bound"),
        s"hi=$bad should raise, got: ${ex.getMessage}")
      val ivs2 = Seq((1L, bad, 10.0)).toDF("iv_id", "lo", "hi")
      val ex2 = intercept[Exception] { banded(pts, ivs2, 10.0) }
      assert(ex2.getMessage.contains("non-finite interval bound"))
    }
    // non-finite POINTS stay exact without a guard (residual re-checks)
    val weird = Seq((1L, Double.NaN), (2L, Double.PositiveInfinity), (3L, 5.0))
      .toDF("p_id", "pt")
    val ivs = Seq((7L, 0.0, 10.0)).toDF("iv_id", "lo", "hi")
    assert(banded(weird, ivs, 4.0).map(_.getLong(0)) === Seq(3L))
  }

  test("reversed intervals band to empty — no descending-sequence blowup") {
    val pts = Seq((1L, 5.0)).toDF("p_id", "pt")
    // lo=1e9, hi=0 at width 1 would be a ~10⁹-element descending
    // sequence without the guard; with it, instantly empty
    val ivs = Seq((1L, 1e9, 0.0), (2L, 0.0, 10.0)).toDF("iv_id", "lo", "hi")
    val got = RangeBandJoin.join(pts, ivs, "pt", "lo", "hi", 1.0)
      .select("iv_id").as[Long].collect().toSeq
    assert(got === Seq(2L))
  }

  test("suggestWidth returns the median span and auto-width join is exact") {
    val ivs = Seq((1L, 0.0, 10.0), (2L, 100.0, 120.0), (3L, 200.0, 230.0))
      .toDF("iv_id", "lo", "hi")
    val w = RangeBandJoin.suggestWidth(ivs, "lo", "hi")
    assert(w === 20.0) // spans 10, 20, 30 → median 20
    val (pts, rivs) = data(7)
    assert(RangeBandJoin.join(pts, rivs, "pt", "lo", "hi")
      .select("p_id", "iv_id").orderBy("p_id", "iv_id").collect().toSeq
      === theta(pts, rivs))
    // degenerate spans fall back to 1.0
    val deg = Seq((1L, 5.0, 5.0), (2L, 9.0, 3.0)).toDF("iv_id", "lo", "hi")
    assert(RangeBandJoin.suggestWidth(deg, "lo", "hi") === 1.0)
  }
}

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
}

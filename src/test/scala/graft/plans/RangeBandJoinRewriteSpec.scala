package graft.plans

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The range-band optimizer rule end to end: with the width conf set,
  * a declarative `pt >= lo && pt < hi` join over integral columns —
  * which Spark plans as a nested loop — rewrites into a banded
  * equi-join that returns exactly the un-rewritten result; fractional
  * columns (NaN/Infinity hazard), joins with an equi key, and sessions
  * without the conf must not fire; reversed dirty intervals must not
  * blow up the generated Sequence.
  */
class RangeBandJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def finalNodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(flatten) ++ (p match {
        case q: QueryStageExec => flatten(q.plan)
        case _ => Nil
      }))
    flatten(root)
  }

  /** Integral (Long) data: the types the rule fires on. */
  private def data(reversedRow: Boolean = false) = {
    val rnd = new Random(5)
    val pts = (0 until 300).map(i => (i.toLong, rnd.nextInt(2000).toLong))
      .toDF("p_id", "pt")
    val ivRows = (0 until 50).map { i =>
      val lo = rnd.nextInt(1900).toLong
      (i.toLong, lo, lo + 1 + rnd.nextInt(200))
    } ++ (if (reversedRow) Seq((99L, 1500L, 100L)) else Nil)
    (pts, ivRows.toDF("iv_id", "lo", "hi"))
  }

  private def thetaJoin(pts: DataFrame, ivs: DataFrame) =
    pts.join(ivs, col("pt") >= col("lo") && col("pt") < col("hi"))
      .select(col("p_id"), col("iv_id"))

  private def withWidth[A](w: String)(f: => A): A = {
    spark.conf.set(RangeBandJoinRewrite.WidthConf, w)
    try f finally spark.conf.unset(RangeBandJoinRewrite.WidthConf)
  }

  private def pairs(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  private def fired(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }.nonEmpty

  test("rewritten join equals the nested-loop result, bag-exact") {
    val (pts, ivs) = data()
    val want = pairs(thetaJoin(pts, ivs))
    val got = withWidth("128") { pairs(thetaJoin(pts, ivs)) }
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("with the width conf set, no nested-loop or cartesian executes") {
    val (pts, ivs) = data()
    withWidth("128") {
      val j = thetaJoin(pts, ivs)
      assert(fired(j), s"band Generate missing:\n${j.queryExecution.optimizedPlan}")
      val nodes = finalNodes(j)
      assert(!nodes.exists(n =>
          n.isInstanceOf[BroadcastNestedLoopJoinExec] ||
            n.isInstanceOf[CartesianProductExec]),
        s"interval join still executes as a nested loop:\n${nodes.head}")
    }
  }

  test("strict/inclusive operator combinations and reversed spellings fire and agree") {
    val (pts, ivs) = data()
    // pt > lo && pt <= hi, written with the bounds on the left side
    def q = pts.join(ivs, lit(0L) + col("lo") < col("pt") && col("hi") >= col("pt"))
      .select(col("p_id"), col("iv_id"))
    val want = pairs(q)
    val got = withWidth("64") {
      assert(fired(q), s"rule did not fire on >/<= reversed spelling:\n${q.queryExecution.optimizedPlan}")
      pairs(q)
    }
    assert(got === want)
  }

  test("a reversed dirty interval (lo > hi) matches nothing and does not throw") {
    val (pts, ivs) = data(reversedRow = true)
    val want = pairs(thetaJoin(pts, ivs))
    val got = withWidth("128") { pairs(thetaJoin(pts, ivs)) }
    assert(got === want)
    assert(!got.exists(_._2 == 99L))
  }

  test("fractional columns do not fire (NaN/Infinity would break banding)") {
    val pts = Seq((1L, 10.0), (2L, 500.0)).toDF("p_id", "pt")
    val ivs = Seq((1L, 0.0, Double.NaN), (2L, 5.0, 20.0)).toDF("iv_id", "lo", "hi")
    withWidth("128") {
      val j = thetaJoin(pts, ivs)
      assert(!fired(j), "rule fired on double columns")
      // Spark NaN-greatest ordering: pt < NaN is true — both points match iv 1
      assert(pairs(j) === Seq((1L, 1L), (1L, 2L), (2L, 1L)))
    }
  }

  test("without the conf the rule does not fire") {
    val (pts, ivs) = data()
    assert(!fired(thetaJoin(pts, ivs)), "rule fired without the opt-in width conf")
  }

  test("joins that already have an equi key are left alone") {
    val (pts, ivs) = data()
    withWidth("128") {
      val j = pts.join(ivs,
        col("p_id") === col("iv_id") && col("pt") >= col("lo") && col("pt") < col("hi"))
      assert(!fired(j), "rule must not fire on an existing equi-join")
    }
  }

  test("point side on the right is handled symmetrically") {
    val (pts, ivs) = data()
    def q = ivs.join(pts, col("pt") >= col("lo") && col("pt") < col("hi"))
      .select(col("p_id"), col("iv_id"))
    val want = pairs(q)
    val got = withWidth("64") { pairs(q) }
    assert(got === want)
  }
}

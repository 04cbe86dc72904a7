package graft.plans

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The range-band optimizer rule end to end: with the width conf set,
  * a declarative `pt >= lo && pt < hi` join — which Spark plans as a
  * nested loop — rewrites into a banded equi-join that returns exactly
  * the un-rewritten result; without the conf (or with an equi key
  * present) the rule must not fire.
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

  private def data() = {
    val rnd = new Random(5)
    val pts = (0 until 300).map(i => (i.toLong, rnd.nextInt(2000).toDouble))
      .toDF("p_id", "pt")
    val ivs = (0 until 50).map { i =>
      val lo = rnd.nextInt(1900)
      (i.toLong, lo.toDouble, (lo + 1 + rnd.nextInt(200)).toDouble)
    }.toDF("iv_id", "lo", "hi")
    (pts, ivs)
  }

  private def thetaJoin(pts: DataFrame, ivs: DataFrame) =
    pts.join(ivs, col("pt") >= col("lo") && col("pt") < col("hi"))
      .select(col("p_id"), col("iv_id"))

  private def withWidth[A](w: String)(f: => A): A = {
    spark.conf.set(RangeBandJoinRewrite.WidthConf, w)
    try f finally spark.conf.unset(RangeBandJoinRewrite.WidthConf)
  }

  test("rewritten join equals the nested-loop result, bag-exact") {
    val (pts, ivs) = data()
    val want = thetaJoin(pts, ivs).collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = withWidth("128") {
      thetaJoin(pts, ivs).collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(got.nonEmpty)
    assert(got.sorted.toSeq === want.sorted.toSeq)
  }

  test("with the width conf set, no nested-loop or cartesian executes") {
    val (pts, ivs) = data()
    withWidth("128") {
      val j = thetaJoin(pts, ivs)
      val optimized = j.queryExecution.optimizedPlan
      assert(optimized.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.nonEmpty, s"band Generate missing from the optimized plan:\n$optimized")
      val nodes = finalNodes(j)
      assert(!nodes.exists(n =>
          n.isInstanceOf[BroadcastNestedLoopJoinExec] ||
            n.isInstanceOf[CartesianProductExec]),
        s"interval join still executes as a nested loop:\n${nodes.head}")
    }
  }

  test("without the conf the rule does not fire") {
    val (pts, ivs) = data()
    val j = thetaJoin(pts, ivs)
    assert(j.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }.isEmpty, "rule fired without the opt-in width conf")
  }

  test("joins that already have an equi key are left alone") {
    val (pts, ivs) = data()
    withWidth("128") {
      val j = pts.join(ivs,
        col("p_id") === col("iv_id") && col("pt") >= col("lo") && col("pt") < col("hi"))
      assert(j.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.isEmpty, "rule must not fire on an existing equi-join")
    }
  }

  test("point side on the right is handled symmetrically") {
    val (pts, ivs) = data()
    val want = ivs.join(pts, col("pt") >= col("lo") && col("pt") < col("hi"))
      .select(col("p_id"), col("iv_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = withWidth("64") {
      ivs.join(pts, col("pt") >= col("lo") && col("pt") < col("hi"))
        .select(col("p_id"), col("iv_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(got.sorted.toSeq === want.sorted.toSeq)
  }
}

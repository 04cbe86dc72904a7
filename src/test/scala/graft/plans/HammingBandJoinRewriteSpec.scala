package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns
import graft.operators.SimHash
import graft.sources.Tables

/** The hamming-band optimizer rule end to end: a declarative
  * `hamming_distance(x, y) <= 3` self-join — which Spark would execute
  * as a nested loop over all pairs — is rewritten into a banded
  * equi-join, executes without any nested-loop/cartesian operator, and
  * returns exactly the hand-banded SimHash.nearDupPairs result (the
  * q73 oracle semantics).
  */
class HammingBandJoinRewriteSpec extends SparkSpec {
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

  private lazy val docs = Tables.load(spark, sf(), "documents")
  private lazy val fps = SimHash.fingerprints(docs, "doc_id", "text")

  test("declarative hamming join matches hand-banded SimHash pairs") {
    val joined = fps.as("x").join(fps.as("y"),
        TextFns.hamming(col("x.fp"), col("y.fp")) <= 3 &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        TextFns.hamming(col("x.fp"), col("y.fp")).cast("long").as("dist"))
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = SimHash.nearDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // bag equality: the first-matching-band condition must emit each
    // qualifying pair exactly once
    assert(got.sorted.toSeq === want.sorted.toSeq)
  }

  test("the rewrite replaces the nested-loop join with an equi-join") {
    val joined = fps.as("x").join(fps.as("y"),
        TextFns.hamming(col("x.fp"), col("y.fp")) <= 3 &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    val optimized = joined.queryExecution.optimizedPlan
    assert(optimized.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
    }.size >= 2, s"band Expand missing from the optimized plan:\n$optimized")
    val nodes = finalNodes(joined)
    assert(!nodes.exists(n =>
        n.isInstanceOf[BroadcastNestedLoopJoinExec] || n.isInstanceOf[CartesianProductExec]),
      s"similarity join still executes as a nested loop:\n${nodes.head}")
  }

  test("joins that already have an equi key are left alone") {
    val j = fps.as("x").join(fps.as("y"),
      col("x.doc_id") === col("y.doc_id") &&
        TextFns.hamming(col("x.fp"), col("y.fp")) <= 3)
    assert(j.queryExecution.optimizedPlan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
    }.isEmpty, "rule must not fire on an existing equi-join")
    // trivially: every fingerprint is within distance 0 of itself
    assert(j.count() === fps.count())
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Predicate plumbing shared by the band-join rewrite rules
  * ([[HammingBandJoinRewrite]], [[RangeBandJoinRewrite]]): conjunct
  * splitting, cross-side orientation, and the existing-equi-key guard
  * that both makes the rules fire only on nested-loop joins and makes
  * them idempotent (their output joins carry an equi key).
  */
private[plans] object BandJoinRewriteHelpers {

  def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  def sidesOf(a: Expression, b: Expression,
      l: LogicalPlan, r: LogicalPlan): Boolean =
    a.references.nonEmpty && b.references.nonEmpty &&
      a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)

  def hasEquiKey(cs: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean =
    cs.exists {
      case EqualTo(a, b) => sidesOf(a, b, l, r) || sidesOf(b, a, l, r)
      case EqualNullSafe(a, b) => sidesOf(a, b, l, r) || sidesOf(b, a, l, r)
      case _ => false
    }
}

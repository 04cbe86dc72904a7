package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Expand, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: a join whose only cross-side predicate is
  * `hamming_distance(x, y) <= r` (r small) is a similarity join Spark
  * can only execute as a nested-loop over all pairs — O(|L|·|R|)
  * comparisons. By pigeonhole, two 64-bit fingerprints within hamming
  * distance r agree exactly on at least one of r+1 disjoint bit
  * blocks, so the rule rewrites the join into a banded EQUI-join (the
  * same block trick `SimHash.nearDupPairs` hand-codes):
  *
  *   - each side is `Expand`ed r+1-fold with (band, block-value)
  *     columns,
  *   - the join becomes an equi-join on (band, block-value) — hash
  *     partitionable, so candidates are generated only where a block
  *     collides,
  *   - a first-matching-band predicate (band d admits a pair only if
  *     blocks 0..d-1 all differ) keeps exactly ONE joined row per
  *     qualifying pair, preserving bag semantics without a distinct,
  *   - the original condition is retained, so block-colliding pairs
  *     beyond distance r are still filtered out.
  *
  * Fires only when the join has NO equi conjunct of its own (the
  * nested-loop case — which also makes the rule idempotent: its output
  * join is an equi-join). Cost: each side's row count inflates r+1×
  * before the shuffle, in exchange for never materializing the
  * all-pairs product — the trade that keeps a 10⁶-document SimHash
  * join feasible where a nested loop is 5·10¹¹ comparisons.
  *
  * Registered through [[GraftExtensions]]; reachable from any
  * DataFrame/SQL query using `hamming_distance`, no operator-specific
  * API needed.
  */
object HammingBandJoinRewrite extends Rule[LogicalPlan] {
  import BandJoinRewriteHelpers.{conjuncts, hasEquiKey, sidesOf}

  /** Widest radius worth banding: r+1 bands of ≥ 8 bits each. */
  private val MaxRadius = 7

  /** Bits [d·w, (d+1)·w) of `x` (the last block absorbs the 64 % nb
    * remainder), as a resolved expression.
    */
  private def block(x: Expression, d: Int, nb: Int): Expression = {
    val w = 64 / nb
    val shift = d * w
    val width = if (d == nb - 1) 64 - shift else w
    if (width == 64) x
    else BitwiseAnd(ShiftRightUnsigned(x, Literal(shift)), Literal((1L << width) - 1))
  }

  /** The banded-join radius predicate: (x-from-left, y-from-right, r). */
  private def hammingPred(cs: Seq[Expression], l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression, Int)] = {
    def oriented(hd: HammingDistance, rad: Int) =
      if (sidesOf(hd.left, hd.right, l, r)) Some((hd.left, hd.right, rad))
      else if (sidesOf(hd.right, hd.left, l, r)) Some((hd.right, hd.left, rad))
      else None
    cs.iterator.flatMap {
      case LessThanOrEqual(hd: HammingDistance, Literal(rad: Int, IntegerType)) =>
        oriented(hd, rad)
      case LessThan(hd: HammingDistance, Literal(rad: Int, IntegerType)) =>
        oriented(hd, rad - 1)
      case GreaterThanOrEqual(Literal(rad: Int, IntegerType), hd: HammingDistance) =>
        oriented(hd, rad)
      case GreaterThan(Literal(rad: Int, IntegerType), hd: HammingDistance) =>
        oriented(hd, rad - 1)
      case _ => None
    }.collectFirst { case t if t._3 >= 0 && t._3 <= MaxRadius &&
        t._1.deterministic && t._2.deterministic => t }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, jt, Some(cond), hint) if jt == Inner || jt == Cross =>
      val cs = conjuncts(cond)
      if (hasEquiKey(cs, l, r)) j
      else hammingPred(cs, l, r) match {
        case None => j
        case Some((x, y, radius)) =>
          val nb = radius + 1
          val bandL = AttributeReference("__hbj_band_l", IntegerType, nullable = false)()
          val valL = AttributeReference("__hbj_val_l", LongType)()
          val bandR = AttributeReference("__hbj_band_r", IntegerType, nullable = false)()
          val valR = AttributeReference("__hbj_val_r", LongType)()
          val expL = Expand(
            (0 until nb).map(d => l.output :+ Literal(d) :+ block(x, d, nb)),
            l.output :+ bandL :+ valL, l)
          val expR = Expand(
            (0 until nb).map(d => r.output :+ Literal(d) :+ block(y, d, nb)),
            r.output :+ bandR :+ valR, r)
          // band d admits a pair only when every earlier block differs,
          // so each qualifying pair survives in exactly one band (its
          // first matching block — one exists by pigeonhole)
          val firstMatch = (1 until nb).map { d =>
            Or(Not(EqualTo(bandL, Literal(d))),
              (0 until d).map(e => Not(EqualTo(block(x, e, nb), block(y, e, nb))))
                .reduce[Expression](And))
          }.foldLeft[Expression](Literal.TrueLiteral)(And)
          val newCond = And(
            And(EqualTo(bandL, bandR), EqualTo(valL, valR)),
            And(firstMatch, cond))
          Project(l.output ++ r.output,
            Join(expL, expR, Inner, Some(newCond), hint))
      }
  }
}

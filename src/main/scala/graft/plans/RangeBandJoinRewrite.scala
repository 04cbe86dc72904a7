package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, ByteType, DecimalType, DoubleType, IntegerType, LongType, ShortType}

import BandJoinRewriteHelpers.{conjuncts, hasEquiKey, sidesOf}

/** Optimizer rule: a join whose only cross-side predicate is a range
  * containment `pt >= lo && pt < hi` (any >=/>/<=/< combination) is an
  * interval join Spark can only execute as a nested-loop over all
  * pairs. The rule rewrites it into the banded equi-join
  * [[graft.operators.RangeBandJoin]] hand-codes: the point side gains
  * its `floor(pt/W)` band, the interval side explodes to the
  * `floor(lo/W)..floor(hi/W)` bands it overlaps, and the join becomes
  * an equi-join on the band with the ORIGINAL predicate retained as
  * residual. A qualifying pair shares exactly one band (the point's),
  * so the rewrite is exact with no dedup — unlike the hamming rule, no
  * first-matching-band bookkeeping is needed.
  *
  * The band width W is a physical knob the optimizer cannot infer (it
  * should sit near the median interval span), so the rule is OPT-IN:
  * it fires only when `spark.graft.rangeJoin.bandWidth` is set to a
  * positive number on the session. Cost: the interval side inflates by
  * ≈ span/W rows before the shuffle.
  *
  * Exactness guards:
  *  - fires only on NON-FRACTIONAL columns (integral/decimal): a
  *    float/double bound can be NaN or ±Infinity, whose floor collapses
  *    to a finite band — `pt < NaN` matches every point under Spark's
  *    NaN-greatest ordering, but a NaN-banded interval would reach only
  *    one band, silently dropping rows;
  *  - a reversed interval (lo > hi — matches nothing) generates an
  *    EMPTY band array rather than feeding `Sequence` a descending
  *    range that throws at runtime.
  *
  * Fires only on Inner/Cross joins with NO equi conjunct of their own
  * (the nested-loop case — which also makes the rule idempotent: its
  * output join is an equi-join). Registered through
  * [[GraftExtensions]].
  */
object RangeBandJoinRewrite extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.bandWidth"

  /** No NaN/Infinity representable: floor-banding is safe. */
  private def bandable(e: Expression): Boolean = (e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _: DecimalType => true
    case _ => false
  }) && e.deterministic

  /** Normalized bound conjuncts: (point expr, bound expr) with the
    * point expr on the GREATER side for lowers, LESser side for uppers.
    */
  private def lowers(cs: Seq[Expression]): Seq[(Expression, Expression)] =
    cs.collect {
      case GreaterThanOrEqual(p, b) => (p, b)
      case GreaterThan(p, b) => (p, b)
      case LessThanOrEqual(b, p) => (p, b)
      case LessThan(b, p) => (p, b)
    }

  private def uppers(cs: Seq[Expression]): Seq[(Expression, Expression)] =
    cs.collect {
      case LessThanOrEqual(p, b) => (p, b)
      case LessThan(p, b) => (p, b)
      case GreaterThanOrEqual(b, p) => (p, b)
      case GreaterThan(b, p) => (p, b)
    }

  /** Find pt bounded below and above across sides:
    * (pt, lo, hi, ptOnLeft).
    */
  private def rangePred(cs: Seq[Expression], l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val los = lowers(cs).filter(t => bandable(t._1) && bandable(t._2))
    val his = uppers(cs).filter(t => bandable(t._1) && bandable(t._2))
    val cands = for {
      (p1, lo) <- los.iterator
      (p2, hi) <- his.iterator
      if p1.semanticEquals(p2)
    } yield (p1, lo, hi)
    cands.collectFirst {
      case (p, lo, hi) if sidesOf(p, lo, l, r) && sidesOf(p, hi, l, r) =>
        (p, lo, hi, true)
      case (p, lo, hi) if sidesOf(lo, p, l, r) && sidesOf(hi, p, l, r) =>
        (p, lo, hi, false)
    }
  }

  private def width: Option[Double] =
    conf.getConfString(WidthConf, "").toDoubleOption.filter(_ > 0)

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(l, r, jt, Some(cond), hint) if jt == Inner || jt == Cross =>
        val cs = conjuncts(cond)
        if (hasEquiKey(cs, l, r)) j
        else rangePred(cs, l, r) match {
          case None => j
          case Some((pt, lo, hi, ptOnLeft)) =>
            def band(e: Expression): Expression =
              Floor(Divide(Cast(e, DoubleType), Literal(w)))

            val ptSide = if (ptOnLeft) l else r
            val ivSide = if (ptOnLeft) r else l

            val bandP = Alias(band(pt), "__rbj_band_p")()
            val newPt = Project(ptSide.output :+ bandP, ptSide)

            val bandI = AttributeReference("__rbj_band_i", LongType)()
            // Sequence is TimeZoneAwareExpression: without an explicit
            // timeZoneId it reports unresolved and fails plan validation.
            // The reversed-bounds guard emits no bands for a lo > hi
            // interval (original semantics: matches nothing) instead of
            // letting Sequence throw on a descending range.
            val bands = If(LessThanOrEqual(band(lo), band(hi)),
              Sequence(band(lo), band(hi), None, Some(conf.sessionLocalTimeZone)),
              Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false)))
            val newIv = Generate(
              Explode(bands),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bandI), child = ivSide)

            val newCond = And(EqualTo(bandP.toAttribute, bandI), cond)
            val (nl, nr) = if (ptOnLeft) (newPt, newIv) else (newIv, newPt)
            Project(l.output ++ r.output, Join(nl, nr, Inner, Some(newCond), hint))
        }
    }
  }
}

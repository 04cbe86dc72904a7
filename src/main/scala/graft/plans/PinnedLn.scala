package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** The pinned-IEEE natural-log kernel behind the field_value_factor
  * log family: `floor(10⁶·ln(x))` for an integral x ≥ 1, never libm
  * log. A Column-tree formulation of the same arithmetic (62-branch
  * CASE chains for the range reduction, the Horner tail inlined per
  * use) generated a 14k-line whole-stage method that Janino refused —
  * so the kernel is ONE static JVM method behind a `doGenCode`
  * expression instead (the AsciiFold ladder: a measured codegen
  * cliff, not a premature drop).
  *
  * Determinism: Java 17 floating point is strict IEEE 754 (JEP 306 —
  * every +,−,×,÷ correctly rounded, bit-identical on every JVM), and
  * [[PinnedMath.lnPpm]] uses only those ops in a fixed order, so the
  * DuckDB oracle replays the arithmetic term for term through the
  * generated CTE chain ([[graft.search.QueryDsl.pinnedLnPpmOracleCtes]]
  * — both sides read the SAME literal constants). Accuracy vs
  * java.lang.Math.log is property-spec'd (PinnedExpSpec, ≤ 1 ppm).
  *
  * Negative or zero input is the CALLER's contract to guard (the
  * field_value_factor arm raises before this expression evaluates);
  * the expression itself returns the x=1 → 0 floor for any x < 1
  * rather than trapping — it must never crash a scan mid-partition on
  * a row the guard already routed away.
  */
case class PinnedLn(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pinned_ln_ppm"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(x: Any): Any =
    PinnedMath.lnPpm(x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.plans.PinnedMath.lnPpm($x);")

  override protected def withNewChildInternal(newChild: Expression): PinnedLn =
    copy(child = newChild)
}

object PinnedLn {
  def apply(c: Column): Column =
    ColumnBridge.column(PinnedLn(ColumnBridge.expression(c)))
}

/** The pinned-IEEE exponential kernel as a static JVM method — the
  * engine-side twin of the SQL text the oracles replay
  * ([[graft.search.QueryDsl.pinnedExpPpmSql]]): floor(10⁶·exp(x)) for
  * x ≤ 0, 0 below −14. The SQL-text form embedded the x expression
  * ~40 times (range reduction + the Horner tail), which blows past
  * Janino's method limit the moment x is anything bigger than a
  * column reference (the geo-decay haversine did it) — interpreted
  * fallback on the corpus hot path. One static call keeps whole-stage
  * codegen; op-for-op parity with the SQL text is spec-pinned
  * (PinnedExpSpec), so oracles keep replaying the text form.
  */
case class PinnedExp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pinned_exp_ppm"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(x: Any): Any =
    PinnedMath.expPpm(x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.plans.PinnedMath.expPpm($x);")

  override protected def withNewChildInternal(newChild: Expression): PinnedExp =
    copy(child = newChild)
}

object PinnedExp {
  def apply(c: Column): Column =
    ColumnBridge.column(PinnedExp(ColumnBridge.expression(c)))
}

/** The static kernels [[PinnedLn]] (and future pinned scalar
  * expressions) call from generated code. Pure strict-IEEE JVM
  * arithmetic with the SAME literal constants the oracle CTE
  * generator embeds — one definition, two replays.
  */
object PinnedMath {

  private[graft] val Ln2 = 0.6931471805599453
  // 1/3, 1/5, ..., 1/15 — must stay in lock-step with
  // graft.search.QueryDsl.LnCoef (spec-pinned)
  private[graft] val Coef = Array(0.3333333333333333, 0.2, 0.14285714285714285,
    0.1111111111111111, 0.09090909090909091, 0.07692307692307693,
    0.06666666666666667)

  // 1/3!, 1/4!, …, 1/13! — must stay in lock-step with
  // graft.search.QueryDsl.ExpCoef (spec-pinned)
  private[graft] val ExpCoefD = Array(0.16666666666666666,
    0.041666666666666664, 0.008333333333333333, 0.001388888888888889,
    1.984126984126984e-4, 2.48015873015873e-5, 2.755731922398589e-6,
    2.755731922398589e-7, 2.505210838544172e-8, 2.08767569878681e-9,
    1.6059043836821613e-10)

  /** floor(10⁶ · exp(x)) for x ≤ 0 — op-for-op the SQL text of
    * `pinnedExpPpmSql`: underflow to 0 below −14; n = floor(x/ln2) as
    * an INT then back to double (the SQL's CAST round trip — values
    * identical, n ∈ [−21, 0]); r = x − n·ln2; degree-13 Taylor in the
    * same Horner order (… + r·0.0 innermost — the SQL's fold seed);
    * 2ⁿ via scalb (exactly the SQL's power-of-two CASE literals).
    */
  def expPpm(x: Double): Long = {
    if (x < -14.0) return 0L
    val ni = math.floor(x / Ln2).toInt
    val r = x - ni.toDouble * Ln2
    var poly = 0.0
    var i = ExpCoefD.length - 1
    while (i >= 0) { poly = ExpCoefD(i) + r * poly; i -= 1 }
    val p = 1.0 + r * (1.0 + r * (0.5 + r * poly))
    val twoN = java.lang.Math.scalb(1.0, ni)
    math.floor(1000000.0 * (twoN * p)).toLong
  }

  /** floor(10⁶ · ln(x)) for x ≥ 1: n = floor(log2 x) by bit position
    * (exact), m = x/2ⁿ ∈ [1, 2) (power-of-two divide; x past 2⁵³
    * rounds in the long→double conversion — IEEE-defined), ln(m) by
    * the atanh series 2t(1 + t²/3 + … + t¹⁴/15), t = (m−1)/(m+1).
    * Identical op order to the oracle CTE chain.
    */
  def lnPpm(x: Long): Long = {
    if (x <= 1L) return 0L
    val n = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val m = x.toDouble / (1L << n).toDouble
    val t = (m - 1.0) / (m + 1.0)
    val t2 = t * t
    var poly = 0.0
    var i = Coef.length - 1
    while (i >= 0) { poly = Coef(i) + t2 * poly; i -= 1 }
    math.floor(1000000.0 * (n.toDouble * Ln2
      + (2.0 * t) * (1.0 + t2 * poly))).toLong
  }
}

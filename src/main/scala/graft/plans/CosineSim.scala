package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: quantized cosine similarity between two
  * embedding arrays, fused into one codegen'd loop.
  *
  * Follows the engine's determinism contract
  * ([[graft.functions.VectorFns]]): elements are quantized to
  * 1e-7-resolution longs (round half-away-from-zero), dot product and
  * norms are exact integer arithmetic, and the result is one IEEE
  * divide of the dot by the two sqrt'd norms — bit-identical to the
  * declarative `quantize`+`qdot` composition and to the DuckDB oracle
  * replaying the same integer math.
  *
  * Why an expression and not a kernel: the `mapPartitions` kernels
  * (CosinePairs/KnnJoin/AnnTopK) own the pair-quadratic paths, but any
  * *declarative* per-row scoring (a join condition, a projection after
  * an equi-join on bucket ids, SQL text) previously had to choose
  * between interpreted higher-order functions (~3 µs/pair — the
  * round-1 q74/q75 incident) or leaving the DataFrame API. This stays
  * inside whole-stage codegen at kernel-ish cost per pair. Registered
  * as SQL function `cosine_sim` by [[GraftExtensions]].
  *
  * Semantics: result is NULL if either input is NULL, either vector
  * contains a NULL element (`zip_with`/`aggregate` null propagation —
  * what the declarative composition yields), or either vector has zero
  * norm; mismatched lengths throw (a data bug worth failing loudly on,
  * matching the kernels' behavior).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (va, vb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = va.numElements()
    if (n != vb.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch ($n vs ${vb.numElements()})")
    val (fa, fb) = (isFloat(left.dataType), isFloat(right.dataType))
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < n) {
      if (va.isNullAt(i) || vb.isNullAt(i)) return null
      val xa = CosineSim.q(if (fa) va.getFloat(i).toDouble else va.getDouble(i))
      val xb = CosineSim.q(if (fb) vb.getFloat(i).toDouble else vb.getDouble(i))
      dot += xa * xb; na += xa * xa; nb += xb * xb
      i += 1
    }
    if (na == 0L || nb == 0L) null
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloat(left.dataType)) "getFloat" else "getDouble"
    val getB = if (isFloat(right.dataType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val ta = ctx.freshName("ta")
      val tb = ctx.freshName("tb")
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      val hasNull = ctx.freshName("hasNull")
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          throw new IllegalArgumentException(
            "cosine_sim: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
        }
        long $dot = 0L; long $na = 0L; long $nb = 0L;
        boolean $hasNull = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $hasNull = true; break; }
          final double $ta = ((double) $a.$getA($i)) * 1.0E7D;
          final double $tb = ((double) $b.$getB($i)) * 1.0E7D;
          final long $xa = $ta >= 0D ? (long) Math.floor($ta + 0.5D)
                                     : (long) Math.ceil($ta - 0.5D);
          final long $xb = $tb >= 0D ? (long) Math.floor($tb + 0.5D)
                                     : (long) Math.ceil($tb - 0.5D);
          $dot += $xa * $xb; $na += $xa * $xa; $nb += $xb * $xb;
        }
        if ($hasNull || $na == 0L || $nb == 0L) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = ((double) $dot) / (Math.sqrt((double) $na) * Math.sqrt((double) $nb));
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** 1e-7 quantizer, round half-away-from-zero — must agree with the
    * codegen path above and with `VectorFns.quantize`/the oracle's
    * `round(x*1e7)`.
    */
  @inline private[plans] def q(v: Double): Long = {
    val t = v * 1.0e7
    if (t >= 0d) math.floor(t + 0.5d).toLong else math.ceil(t - 0.5d).toLong
  }

  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: APPLY a trained BPE merge table to a
  * symbol array in ONE map-only pass (r15, VERDICT r14 #3 — the
  * operator an LLM-data pipeline actually runs daily; training is the
  * rare job). The merge list rides the expression tree as a broadcast
  * constant (k ≤ 64 by the `Bpe.merges` contract), and the kernel
  * applies each merge IN STEP ORDER, leftmost-greedy non-overlapping —
  * exactly the fold the trainer ran, so
  * `encode(corpus, merges(corpus, k))` reproduces the training
  * symbolization token-for-token (spec-pinned). This sequential
  * contract is the engine's pinned divergence from re-scanning
  * priority encoders (e.g. HF's loop-until-fixpoint): one pass per
  * merge, k passes total, each a plain in-place JVM loop — no
  * per-token heap, no regex, no HOF lambdas.
  *
  * A merged symbol can never re-trigger as the LEFT of its own pair in
  * place (a+b != a), so the in-place scan IS the leftmost
  * non-overlapping application. NULL array → NULL (unary null
  * propagation); NULL elements pass through unmerged (they can never
  * equal a pair side — the trainer's fold appends them the same way).
  */
case class BpeEncode(child: Expression, as: Array[String], bs: Array[String])
    extends UnaryExpression {

  require(as.length == bs.length, "bpe merge table sides must align")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }

  @transient private lazy val asU: Array[UTF8String] =
    as.map(UTF8String.fromString)
  @transient private lazy val bsU: Array[UTF8String] =
    bs.map(UTF8String.fromString)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[ArrayData], asU, bsU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeAs", asU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val bRef = ctx.addReferenceObj("bpeBs", bsU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BpeEncode.encode($c, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  // Array fields: content-based equality so canonicalization works
  // (the GeoRegionShape lesson).
  override def equals(o: Any): Boolean = o match {
    case BpeEncode(c, a2, b2) =>
      c == child && java.util.Arrays.equals(as.asInstanceOf[Array[AnyRef]],
        a2.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(bs.asInstanceOf[Array[AnyRef]],
          b2.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode: Int =
    31 * (31 * child.hashCode +
      java.util.Arrays.hashCode(as.asInstanceOf[Array[AnyRef]])) +
      java.util.Arrays.hashCode(bs.asInstanceOf[Array[AnyRef]])
}

object BpeEncode {

  /** The one kernel both eval paths call: k in-place leftmost-greedy
    * merge passes over the symbol buffer, in step order.
    */
  def encode(syms: ArrayData, as: Array[UTF8String],
      bs: Array[UTF8String]): ArrayData = {
    var m = syms.numElements()
    val buf = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      buf(i) = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      i += 1
    }
    var j = 0
    while (j < as.length) {
      val a = as(j); val b = bs(j)
      var merged: UTF8String = null // built lazily, once per pass
      var o = 0
      i = 0
      while (i < m) {
        val s = buf(i)
        if (o > 0 && buf(o - 1) != null && s != null &&
            buf(o - 1).equals(a) && s.equals(b)) {
          if (merged == null) merged = UTF8String.concat(a, b)
          buf(o - 1) = merged
        } else {
          buf(o) = s
          o += 1
        }
        i += 1
      }
      m = o
      j += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Column-level entry point — `table` rows as (a, b) in step order. */
  def apply(c: Column, table: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(c),
      table.map(_._1).toArray, table.map(_._2).toArray))
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the `standard` analyzer's column
  * normalizer ([[graft.search.Analyzer]]) as ONE byte pass —
  * `[A-Z]` lowercased, `[a-z0-9]` kept, every other byte a separator,
  * separator runs collapsed to a single space, ends trimmed.
  *
  * Semantically identical to the declarative
  * `trim(lower(regexp_replace(c, "[^A-Za-z0-9]+", " ")))` it
  * replaces (multi-byte UTF-8 sequences are runs of non-ASCII bytes →
  * one space after collapsing, exactly what the char-wise regex
  * produces), but WITHOUT the regex engine and the UTF8String→String
  * round-trips: the scale probe measured the analyzed scan families
  * (q230/q232/q234) compute-bound on that regex at 100× corpus —
  * normalization is the hot loop of every analyzed scan, the
  * textbook case for a codegen'd expression over a black-box regex.
  * ASCII-only by construction, so the twin contract with
  * `Analyzer.Standard.normText` is locale-proof for free.
  *
  * NULL in → NULL out (standard unary null propagation).
  */
case class AsciiFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "ascii_fold"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    AsciiFold.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val in = ctx.freshName("in")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val o = ctx.freshName("o")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val up = ctx.freshName("up")
      val keep = ctx.freshName("keep")
      val pend = ctx.freshName("pend")
      s"""
        final byte[] $in = $c.getBytes();
        final int $n = $in.length;
        final byte[] $out = new byte[$n];
        int $o = 0; boolean $pend = false;
        for (int $i = 0; $i < $n; $i++) {
          final byte $b = $in[$i];
          final boolean $up = $b >= 65 && $b <= 90;
          final boolean $keep = ($b >= 97 && $b <= 122) || ($b >= 48 && $b <= 57);
          if ($up || $keep) {
            if ($pend && $o > 0) { $out[$o] = 32; $o++; }
            $pend = false;
            $out[$o] = $up ? (byte) ($b + 32) : $b;
            $o++;
          } else { $pend = true; }
        }
        ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($out, 0, $o);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): AsciiFold =
    copy(child = newChild)
}

object AsciiFold {

  /** Interpreted twin of the generated loop — MUST match it byte for
    * byte (shared by `nullSafeEval` and the spec's equivalence
    * checks).
    */
  def fold(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val n = in.length
    val out = new Array[Byte](n)
    var o = 0
    var pend = false
    var i = 0
    while (i < n) {
      val b = in(i)
      val up = b >= 'A' && b <= 'Z'
      val keep = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (up || keep) {
        if (pend && o > 0) { out(o) = ' '; o += 1 }
        pend = false
        out(o) = if (up) (b + 32).toByte else b
        o += 1
      } else pend = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(AsciiFold(ColumnBridge.expression(c)))
}

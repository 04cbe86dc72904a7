package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a CUSTOM analyzer's column normalizer
  * (r16, VERDICT r15 #6) — a named base fold ([[AsciiFold]] `standard`
  * or [[EnglishFold]] `english`), then per-token removal of a
  * caller-supplied STOP LIST and a SYNONYM map rewriting member tokens
  * to their group's canonical token ("television" → "tv"), re-joined
  * on single spaces so the engine's one token machinery applies
  * unchanged downstream (the Analyzer doctrine). Stop-check runs
  * BEFORE the synonym map — a stopped token never canonicalizes.
  *
  * The config (stop set + synonym map, both tiny and driver-resolved)
  * rides the expression tree as a broadcast reference object; both
  * eval paths call the one [[CustomFold.Cfg.fold]] kernel, and
  * `Analyzer.Custom.normText` delegates to the same instance, so the
  * column/driver twins agree by construction. Config tokens are
  * PRE-FOLDED lowercase-alnum singletons (validated at
  * `Analyzer.custom` build time), so membership tests run on exactly
  * the token shapes the base fold emits.
  *
  * DuckDB replay (the oracle recipe): the base analyzer's own replay,
  * then `list_filter(toks, t -> t NOT IN (<stop>))` and
  * `list_transform(toks, t -> CASE WHEN t = '<member>' THEN '<canon>'
  * … ELSE t END)`.
  *
  * NULL in → NULL out (standard unary null propagation).
  */
case class CustomFold(child: Expression, baseName: String,
    stop: Seq[String], synFrom: Seq[String], synTo: Seq[String])
    extends UnaryExpression {

  require(synFrom.length == synTo.length, "synonym map sides must align")

  override def dataType: DataType = StringType
  override def prettyName: String = "custom_fold"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  @transient private lazy val cfg =
    new CustomFold.Cfg(baseName, stop, synFrom, synTo)

  override def nullSafeEval(input: Any): Any =
    cfg.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("customFoldCfg", cfg,
      classOf[CustomFold.Cfg].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.fold($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CustomFold =
    copy(child = newChild)
}

object CustomFold {

  /** The one shared kernel config — Seq fields give the expression
    * structural equality for free (the GeoRegionShape
    * canonicalization lesson), the HashSet/HashMap here are the hot
    * per-token lookups.
    */
  final class Cfg(baseName: String, stop: Seq[String],
      synFrom: Seq[String], synTo: Seq[String]) extends Serializable {
    private val english = baseName == "english"
    @transient private lazy val stopSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      stop.foreach(s.add)
      s
    }
    @transient private lazy val synMap: java.util.HashMap[String, String] = {
      val m = new java.util.HashMap[String, String]()
      synFrom.indices.foreach(i => m.put(synFrom(i), synTo(i)))
      m
    }

    def fold(s: UTF8String): UTF8String = {
      val std = (if (english) EnglishFold.fold(s) else AsciiFold.fold(s)).toString
      if (std.isEmpty) return UTF8String.EMPTY_UTF8
      val sb = new java.lang.StringBuilder(std.length)
      var start = 0
      val n = std.length
      while (start < n) {
        var end = std.indexOf(' ', start)
        if (end < 0) end = n
        if (end > start) {
          val tok = std.substring(start, end)
          if (!stopSet.contains(tok)) {
            if (sb.length > 0) sb.append(' ')
            val mapped = synMap.get(tok)
            sb.append(if (mapped == null) tok else mapped)
          }
        }
        start = end + 1
      }
      UTF8String.fromString(sb.toString)
    }
  }

  /** Column-level entry point. */
  def apply(c: Column, baseName: String, stop: Seq[String],
      synFrom: Seq[String], synTo: Seq[String]): Column =
    ColumnBridge.column(CustomFold(ColumnBridge.expression(c), baseName,
      stop, synFrom, synTo))
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IPv6 text → the 8 16-bit group values (`array<bigint>`), NULL on
  * ANY dirt — the engine's one v6 parser, as a static JVM method
  * behind a `doGenCode` expression. A Column-tree formulation of the
  * same grammar (8 per-group CASEs, per-group regex validation, conv)
  * generated ~6.5k lines inside the fused whole-stage method and blew
  * Janino's 64KB limit (interpreted fallback on the scan hot path) —
  * the AsciiFold ladder again: a measured codegen cliff, and plain
  * JVM string walking is faster than the expression tree anyway.
  *
  * Grammar: RFC 4291 §2.2 forms 1 (full, 8 groups) and 2
  * (::-compressed); the dotted-quad-suffix form 3 NULLs out like any
  * other dirt (documented). Determinism is trivial — integer/string
  * work only, no floating point. The grammar is pinned against
  * java.net.InetAddress on valid forms and a 15-case dirt battery
  * (Ipv6Spec), and the oracle fixtures derive group values from their
  * own construction, never from this parser.
  */
case class Ipv6Parse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ipv6_groups"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(x: Any): Any =
    Ipv6Parse.parse(x.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = graft.plans.Ipv6Parse.parse($x);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Ipv6Parse =
    copy(child = newChild)
}

object Ipv6Parse {
  def apply(c: Column): Column =
    ColumnBridge.column(Ipv6Parse(ColumnBridge.expression(c)))

  /** Lenient parse: the 8 group values, or null on any dirt. */
  def parse(u: UTF8String): GenericArrayData = {
    val g = groupsOrNull(u.toString)
    if (g == null) null else new GenericArrayData(g)
  }

  /** The one grammar, shared by the lenient column parser and the
    * strict driver bound parser (graft.search.QueryDsl.ipv6Groups).
    */
  def groupsOrNull(raw: String): Array[Long] = {
    val s = raw.toLowerCase
    val len = s.length
    if (len < 2 || len > 45) return null
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (!((c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || c == ':'))
        return null
      i += 1
    }
    if (s.contains(":::")) return null
    val dc = s.indexOf("::")
    if (dc >= 0 && s.lastIndexOf("::") != dc) return null
    def side(p: String): Array[String] =
      if (p.isEmpty) Array.empty else p.split(":", -1)
    val groups: Array[String] =
      if (dc >= 0) {
        val ls = side(s.substring(0, dc))
        val rs = side(s.substring(dc + 2))
        if (ls.length + rs.length > 7) return null
        ls ++ Array.fill(8 - ls.length - rs.length)("0") ++ rs
      } else {
        val g = side(s)
        if (g.length != 8) return null
        g
      }
    val out = new Array[Long](8)
    var k = 0
    while (k < 8) {
      val g = groups(k)
      if (g.isEmpty || g.length > 4) return null
      // chars already validated hex-or-colon; a colon can't survive
      // the splits, so g is pure hex here
      out(k) = java.lang.Long.parseLong(g, 16)
      k += 1
    }
    out
  }
}

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
  * Grammar: RFC 4291 §2.2 forms 1 (full, 8 groups), 2
  * (::-compressed), and 3 (trailing dotted quad supplying the last
  * 32 bits — `::ffff:192.0.2.1` and friends; dual-stack access logs
  * are full of v4-mapped addresses, VERDICT r12 #3). Form 3 rewrites
  * the quad to its two hex groups and falls through to the forms-1/2
  * grammar, so group-count/compression rules are enforced once. Quad
  * octets are strict decimal 0-255 with no leading zeros (the
  * inet_aton octal trap — `010` is dirt, not 8). Determinism is
  * trivial — integer/string
  * work only, no floating point. The grammar is pinned against
  * java.net.InetAddress on valid forms and a 15-case dirt battery
  * (Ipv6Spec), and the oracle fixtures derive group values from their
  * own construction, never from this parser.
  */
case class Ipv6Parse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // dirt NULLs out even when the input column is non-nullable — the
  // default child.nullable would let codegen elide the null slot and
  // emit an unassignable `false` literal for ev.isNull
  override def nullable: Boolean = true
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
    val s0 = raw.toLowerCase
    if (s0.length < 2 || s0.length > 45) return null
    // Form 3: a trailing dotted quad is the last 32 bits. Rewrite it
    // to its two hex groups and fall through — the forms-1/2 grammar
    // then enforces group counts and compression rules unchanged.
    val s =
      if (s0.indexOf('.') < 0) s0
      else {
        val lc = s0.lastIndexOf(':')
        if (lc < 0 || lc == s0.length - 1) return null
        val q = quadValueOrNeg(s0.substring(lc + 1))
        if (q < 0) return null
        s0.substring(0, lc + 1) +
          java.lang.Long.toHexString(q >>> 16) + ":" +
          java.lang.Long.toHexString(q & 0xffffL)
      }
    val len = s.length
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

  /** Dotted quad → its 32-bit value, or -1 on any dirt: exactly four
    * decimal octets 0-255, 1-3 digits each, no leading zeros (a
    * multi-digit octet starting with '0' is the ambiguous inet_aton
    * octal form — dirt, never reinterpreted).
    */
  private def quadValueOrNeg(q: String): Long = {
    val parts = q.split("\\.", -1)
    if (parts.length != 4) return -1L
    var v = 0L
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3) return -1L
      if (p.length > 1 && p.charAt(0) == '0') return -1L
      var o = 0
      var j = 0
      while (j < p.length) {
        val c = p.charAt(j)
        if (c < '0' || c > '9') return -1L
        o = o * 10 + (c - '0')
        j += 1
      }
      if (o > 255) return -1L
      v = (v << 8) | o
      i += 1
    }
    v
  }
}

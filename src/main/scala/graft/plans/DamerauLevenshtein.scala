package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: full (unrestricted) Damerau-Levenshtein
  * distance — the Lowrance-Wagner edit model where a transposition of
  * adjacent characters is ONE edit and, unlike the restricted/OSA
  * variant, a transposed pair may still take part in later edits
  * (`ca -> abc` = 2: transpose + insert; OSA says 3). This is the
  * model the oracle's `damerau_levenshtein` implements (probed:
  * ca/abc=2, ab/ba=1), so engine and oracle agree bit-for-bit, and it
  * is the edit model OpenSearch's `fuzziness` uses when
  * `transpositions: true` (its default there; this engine defaults to
  * plain levenshtein for consistency with its other fuzzy surfaces —
  * see the fuzzy-clause scaladoc).
  *
  * Codegen emits one static call (the Spark `levenshtein` builtin's
  * own pattern) — the DP stays in compiled Scala, the expression stays
  * inside whole-stage codegen. Distances are computed over UTF-16
  * chars; the token surfaces this feeds are analyzer output
  * (ASCII-alphanumeric), where chars == code points.
  *
  * NULL in -> NULL out (standard binary null propagation).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.DamerauLevenshtein$$.MODULE$$.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Lowrance-Wagner full Damerau-Levenshtein over UTF-16 chars.
    * `da` (last row where each char of `a` appeared) is an int[128]
    * for ASCII with a lazily-built map spillover, so the common
    * analyzer-token case allocates two small arrays and nothing else.
    */
  def distance(au: UTF8String, bu: UTF8String): Int = {
    val a = au.toString
    val b = bu.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= la) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val daAscii = new Array[Int](128)
    var daExt: java.util.HashMap[Character, Integer] = null
    def daGet(c: Char): Int =
      if (c < 128) daAscii(c)
      else if (daExt == null) 0
      else { val v = daExt.get(c); if (v == null) 0 else v.intValue() }
    def daPut(c: Char, v: Int): Unit =
      if (c < 128) daAscii(c) = v
      else {
        if (daExt == null) daExt = new java.util.HashMap[Character, Integer]()
        daExt.put(c, v); ()
      }
    i = 1
    while (i <= la) {
      var db = 0
      val ac = a.charAt(i - 1)
      j = 1
      while (j <= lb) {
        val bc = b.charAt(j - 1)
        val k = daGet(bc)
        val l = db
        val cost = if (ac == bc) { db = j; 0 } else 1
        var m = d(i * w + j) + cost                        // substitution
        val ins = d((i + 1) * w + j) + 1                   // insertion
        if (ins < m) m = ins
        val del = d(i * w + j + 1) + 1                     // deletion
        if (del < m) m = del
        val tr = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1) // transposition
        if (tr < m) m = tr
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      daPut(ac, i)
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }

  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the `english` analyzer's column
  * normalizer (r15, VERDICT r14 #2) — [[AsciiFold]]'s standard pass,
  * then per-token STOP-WORD removal and a deterministic suffix
  * stemmer, re-joined on single spaces so the engine's one token
  * machinery (`split(_, " ")`, padded-contains phrases) applies
  * unchanged downstream. One static-call JVM kernel (the GeoWalk
  * doctrine): a `filter`/`transform` HOF chain would run interpreted
  * in the hot loop of every analyzed scan.
  *
  * The stop list is the classic 33-word English set (a, an, and, are,
  * as, at, be, but, by, for, if, in, into, is, it, no, not, of, on,
  * or, such, that, the, their, then, there, these, they, this, to,
  * was, will, with), applied BEFORE stemming.
  *
  * The stemmer is a PINNED first-match-wins rule chain — deliberately
  * NOT Porter (whose measure/cvc machinery is not replayable as plain
  * SQL); every rule is expressible with `LIKE`/`substr`/`length`, so
  * DuckDB replays the whole analyzer token-for-token (the twin
  * contract every analyzed oracle rides on):
  *
  *   1. `…sses` → drop `es`                     (dresses → dress)
  *   2. `…ies`, len ≥ 5 → `…y`                  (parties → party)
  *   3. `…ss` / `…us` → unchanged               (chess, status)
  *   4. `…s`, len ≥ 4 → drop `s`                (runs → run)
  *   5. `…ing`, len ≥ 6 → drop `ing`, undouble  (running → run)
  *   6. `…ed`, len ≥ 5 → drop `ed`, undouble    (wanted → want)
  *
  * where undouble removes one of a trailing doubled consonant in
  * {b, d, f, g, m, n, p, r, t} (never `ll`/`ss`: falling → fall).
  * Documented divergences from Porter: no e-restoration (making →
  * mak, not make) and short tokens pass through (gas stays gas; sing
  * keeps its -ing) — both sides of a match analyze identically, so
  * recall on the everyday inflections (plural / -ing / -ed) is what
  * the rule set buys, with zero cross-engine drift.
  *
  * The DuckDB replay (the oracle recipe, used by q394+):
  * {{{
  * array_to_string(list_transform(list_filter(
  *   string_split(trim(lower(regexp_replace(x, '[^A-Za-z0-9]+', ' ', 'g'))), ' '),
  *   t -> t <> '' AND t NOT IN (<stop list>)),
  *   t -> CASE
  *     WHEN t LIKE '%sses' THEN substr(t, 1, length(t)-2)
  *     WHEN t LIKE '%ies' AND length(t) >= 5 THEN substr(t, 1, length(t)-3) || 'y'
  *     WHEN t LIKE '%ss' OR t LIKE '%us' THEN t
  *     WHEN t LIKE '%s' AND length(t) >= 4 THEN substr(t, 1, length(t)-1)
  *     WHEN t LIKE '%ing' AND length(t) >= 6 THEN CASE
  *       WHEN substr(t, length(t)-3, 1) = substr(t, length(t)-4, 1)
  *        AND substr(t, length(t)-3, 1) IN ('b','d','f','g','m','n','p','r','t')
  *       THEN substr(t, 1, length(t)-4) ELSE substr(t, 1, length(t)-3) END
  *     WHEN t LIKE '%ed' AND length(t) >= 5 THEN CASE
  *       WHEN substr(t, length(t)-2, 1) = substr(t, length(t)-3, 1)
  *        AND substr(t, length(t)-2, 1) IN ('b','d','f','g','m','n','p','r','t')
  *       THEN substr(t, 1, length(t)-3) ELSE substr(t, 1, length(t)-2) END
  *     ELSE t END), ' ')
  * }}}
  *
  * NULL in → NULL out (standard unary null propagation).
  */
case class EnglishFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "english_fold"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    EnglishFold.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.EnglishFold.fold($c);")

  override protected def withNewChildInternal(newChild: Expression): EnglishFold =
    copy(child = newChild)
}

object EnglishFold {

  /** The pinned stop list — checked AFTER standard normalization, so
    * membership is on lowercase ASCII tokens.
    */
  val StopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  private val stopJava: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    StopWords.foreach(s.add)
    s
  }

  private def undoubles(ch: Char): Boolean = ch match {
    case 'b' | 'd' | 'f' | 'g' | 'm' | 'n' | 'p' | 'r' | 't' => true
    case _ => false
  }

  private def undouble(t: String): String =
    if (t.length >= 2 && t.charAt(t.length - 1) == t.charAt(t.length - 2) &&
        undoubles(t.charAt(t.length - 1)))
      t.substring(0, t.length - 1)
    else t

  /** The pinned rule chain — first match wins. Pure ASCII input (runs
    * after [[AsciiFold.fold]]).
    */
  def stem(t: String): String = {
    val n = t.length
    if (t.endsWith("sses")) t.substring(0, n - 2)
    else if (t.endsWith("ies") && n >= 5) t.substring(0, n - 3) + "y"
    else if (t.endsWith("ss") || t.endsWith("us")) t
    else if (t.endsWith("s") && n >= 4) t.substring(0, n - 1)
    else if (t.endsWith("ing") && n >= 6) undouble(t.substring(0, n - 3))
    else if (t.endsWith("ed") && n >= 5) undouble(t.substring(0, n - 2))
    else t
  }

  /** The one kernel both eval paths call (codegen via static call,
    * interpreted via `nullSafeEval`) — and `Analyzer.English.normText`
    * DELEGATES here, so the column/driver twins cannot drift by
    * construction.
    */
  def fold(s: UTF8String): UTF8String = {
    val std = AsciiFold.fold(s).toString
    if (std.isEmpty) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder(std.length)
    var start = 0
    val n = std.length
    while (start < n) {
      var end = std.indexOf(' ', start)
      if (end < 0) end = n
      if (end > start) {
        val tok = std.substring(start, end)
        if (!stopJava.contains(tok)) {
          if (sb.length > 0) sb.append(' ')
          sb.append(stem(tok))
        }
      }
      start = end + 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(EnglishFold(ColumnBridge.expression(c)))
}

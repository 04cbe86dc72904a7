package graft.search

import java.time.{DayOfWeek, LocalDate, LocalDateTime}
import java.time.temporal.{ChronoUnit, TemporalAdjusters}

/** OpenSearch date-math evaluator for `range` bounds — the commonest
  * dashboard range form (`"gte": "now-7d/d"`), resolved ENTIRELY ON
  * THE DRIVER so the compiled predicate is a plain literal timestamp
  * comparison that pushes to the parquet scan (min/max-prunable).
  * The reference's search collection serves this grammar on every
  * Kibana-style time filter (the SEARCH collection of
  * /root/reference/lib/opensearch-dynamodb-etl-cdk-stack.ts:91).
  *
  * Grammar (the subset real requests use; anything else fails loud):
  *
  *   expr   := anchor op* round?
  *   anchor := "now" | <ISO date or datetime> "||"
  *   op     := ("+" | "-") digits unit
  *   round  := "/" unit
  *   unit   := y | M | w | d | h | m | s
  *
  * Determinism: the engine bans wall-clock reads (a replayed query
  * must hash identically), so `now` is NEVER `Date.now` — the request
  * supplies it as a sibling `"now"` key in the range bounds object,
  * and a `now`-anchored expression without one fails loud.
  *
  * Rounding follows the OpenSearch bound-type rule, expressed in
  * half-open form so no last-millisecond literals exist:
  *   gte x/u  →  col >= floor_u(x)          (round down)
  *   gt  x/u  →  col >= floor_u(x) + 1u     (beyond the entire unit)
  *   lt  x/u  →  col <  floor_u(x)          (before the entire unit)
  *   lte x/u  →  col <  floor_u(x) + 1u     (include the entire unit)
  * `/w` floors to the ISO week start (Monday).
  */
object DateMath {

  /** A parsed expression: the anchor with all ± offsets applied, plus
    * the optional rounding unit (applied per bound type by the caller).
    */
  final case class Resolved(base: LocalDateTime, round: Option[Char])

  private val OpRe = """([+-])(\d+)([yMwdhms])""".r

  private val AnchorPrefixRe = """^\d{4}-\d{2}-\d{2}(T[^|]*)?\|\|""".r

  /** Date-math detection: engage only for strings a plain literal
    * comparison could never plausibly mean. `now` engages only when
    * followed by nothing or an op/round character (`+`/`-`/`/`) — a
    * lexicographic bound like `"nowhere"` keeps the historical raw
    * string comparison; `||` engages only after an ISO-date-shaped
    * anchor, so a literal value containing `||` stays raw too.
    */
  def isDateMath(s: String): Boolean =
    (s.startsWith("now") &&
      (s.length == 3 || "+-/".contains(s.charAt(3)))) ||
    AnchorPrefixRe.findFirstIn(s).isDefined

  /** Parse an ISO anchor (`yyyy-MM-dd` or `yyyy-MM-ddTHH:mm:ss`). */
  def parseAnchor(s: String): LocalDateTime =
    try {
      if (s.length == 10) LocalDate.parse(s).atStartOfDay
      else LocalDateTime.parse(s)
    } catch {
      case _: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"'$s' is not an ISO date (yyyy-MM-dd) or datetime (yyyy-MM-ddTHH:mm:ss)")
    }

  /** Evaluate an expression against the request-supplied `now`. */
  def eval(expr: String, now: Option[LocalDateTime]): Resolved = {
    val (anchor, ops) =
      if (expr.startsWith("now"))
        (now.getOrElse(throw new IllegalArgumentException(
          "a now-anchored bound needs a sibling \"now\" key (the engine " +
            "bans wall-clock reads; supply the instant in the request)")),
          expr.drop(3))
      else expr.split("\\|\\|", -1) match {
        case Array(a, rest) => (parseAnchor(a), rest)
        case _ => throw new IllegalArgumentException(
          s"date math '$expr' must have exactly one '||' anchor separator")
      }
    val (mathPart, round) = ops.lastIndexOf('/') match {
      case -1 => (ops, None)
      case i =>
        val u = ops.substring(i + 1)
        if (u.length != 1 || !"yMwdhms".contains(u))
          throw new IllegalArgumentException(
            s"date math '$expr': rounding unit must be one of y M w d h m s")
        (ops.substring(0, i), Some(u.head))
    }
    // the op section must be EXACTLY a run of ±N-unit terms — any
    // residue (stray characters, unknown units) fails loud
    val matched = OpRe.findAllMatchIn(mathPart).toSeq
    if (matched.map(_.matched).mkString != mathPart)
      throw new IllegalArgumentException(
        s"date math '$expr': malformed op section '$mathPart' " +
          "(expected (+|-)<digits><y|M|w|d|h|m|s> terms)")
    val base = matched.foldLeft(anchor) { (t, m) =>
      val n = m.group(2).toLong * (if (m.group(1) == "-") -1 else 1)
      add(t, m.group(3).head, n)
    }
    Resolved(base, round)
  }

  def add(t: LocalDateTime, unit: Char, n: Long): LocalDateTime = unit match {
    case 'y' => t.plusYears(n)
    case 'M' => t.plusMonths(n)
    case 'w' => t.plusWeeks(n)
    case 'd' => t.plusDays(n)
    case 'h' => t.plusHours(n)
    case 'm' => t.plusMinutes(n)
    case 's' => t.plusSeconds(n)
    case u   => throw new IllegalArgumentException(s"unknown date-math unit '$u'")
  }

  /** Floor to the start of the unit (ISO Monday for weeks). */
  def truncate(t: LocalDateTime, unit: Char): LocalDateTime = unit match {
    case 'y' => t.toLocalDate.withDayOfYear(1).atStartOfDay
    case 'M' => t.toLocalDate.withDayOfMonth(1).atStartOfDay
    case 'w' => t.toLocalDate
      .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY)).atStartOfDay
    case 'd' => t.toLocalDate.atStartOfDay
    case 'h' => t.truncatedTo(ChronoUnit.HOURS)
    case 'm' => t.truncatedTo(ChronoUnit.MINUTES)
    case 's' => t.truncatedTo(ChronoUnit.SECONDS)
    case u   => throw new IllegalArgumentException(s"unknown date-math unit '$u'")
  }

  /** Session-timezone-safe literal form for `cast(_ as timestamp)` —
    * a java.sql.Timestamp literal would detour through the JVM default
    * zone; the string cast resolves in Spark's (UTC-pinned) session
    * zone, matching the oracle's naive timestamps.
    */
  def literal(t: LocalDateTime): String =
    t.format(java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss"))
}

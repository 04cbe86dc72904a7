package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis chain shared by every tokenizing surface — the
  * match-family DSL clauses ([[QueryDsl]]) and the materialized BM25
  * index ([[graft.etl.SearchIndex]]).
  *
  * The reference's search collection is OpenSearch
  * (/root/reference/lib/opensearch-dynamodb-etl-cdk-stack.ts:91), whose
  * default `standard` analyzer lowercases and splits on non-letter
  * boundaries before terms ever reach the inverted index — so
  * `match "Spark"` finds the token `spark.` in real mixed-case,
  * punctuated text. This engine's historical default is the raw
  * whitespace split (the q41/q44 contracts, oracle-locked); the
  * analyzer is therefore an explicit, named step:
  *
  *  - `whitespace` — identity normalization; tokens are the raw
  *    single-space split. The default everywhere (backward-compatible
  *    with every existing oracle).
  *  - `standard` — every maximal run of non-`[A-Za-z0-9]` characters
  *    becomes a single space FIRST, then the (now pure-ASCII) text is
  *    lowercased, ends trimmed. Strip-before-lower makes the JVM
  *    default locale irrelevant (see [[Analyzer.Standard]]) and pins
  *    the non-ASCII edge cases: a character like U+212A (KELVIN SIGN)
  *    is stripped, never lowered into ASCII `k`. ASCII-alphanumeric
  *    token contract: deterministic and portable across engines
  *    (DuckDB replicates it as
  *    `trim(lower(regexp_replace(x, '[^A-Za-z0-9]+', ' ', 'g')))` —
  *    the q228–q234 oracle recipe).
  *
  * Design: an analyzer is a COLUMN NORMALIZER, not a tokenizer — it
  * rewrites text so that the engine's single-space token machinery
  * (`split(_, " ")`, padded-contains phrase matching) applies
  * unchanged downstream. That keeps the whole match family on one
  * code path: the clause normalizes the field column and the query
  * text with the same analyzer and proceeds exactly as before. Pure
  * codegen (`lower`/`regexp_replace`/`trim`), no UDFs, stays inside
  * whole-stage codegen and never blocks filter pushdown on sibling
  * predicates.
  *
  * Index parity: [[graft.etl.SearchIndex]] stores the analyzer name in
  * its write-once meta sidecar and applies the same normalization at
  * build, CDC-merge and serve time, so an index can never drift from
  * the scan-time semantics (the indexed = scanned contract).
  */
sealed abstract class Analyzer(val name: String) {
  /** Normalize a text column so `split(_, " ")` yields the analyzed
    * tokens (no empty tokens except on all-separator input).
    */
  def norm(c: Column): Column

  /** Driver-side twin of [[norm]] for query text — MUST agree with it
    * character-for-character on any input, or query terms and indexed
    * tokens drift.
    */
  def normText(s: String): String
}

object Analyzer {

  /** Raw single-space tokens — the engine's historical default. */
  case object Whitespace extends Analyzer("whitespace") {
    override def norm(c: Column): Column = c
    override def normText(s: String): String = s
  }

  /** Lowercase + split on non-alphanumerics (ASCII token contract).
    *
    * Locale-proofing: non-`[A-Za-z0-9]` characters are stripped BEFORE
    * lowering, so the lowercasing only ever sees pure ASCII and the
    * twins cannot drift on a non-English default locale (Spark's
    * `lower()` falls through to JVM `toLowerCase()` with the DEFAULT
    * locale for non-ASCII input — on a Turkish-locale JVM `"I"` lowers
    * to `"ı"` in the column path but `Locale.ROOT` keeps `"i"` in the
    * query path; stripping first makes the locale irrelevant).
    */
  case object Standard extends Analyzer("standard") {
    // one native byte pass ([[graft.plans.AsciiFold]]) — semantically
    // the declarative trim(lower(regexp_replace(c, "[^A-Za-z0-9]+",
    // " "))) but without the regex engine: normalization is the hot
    // loop of every analyzed scan, and the 100× scale probe measured
    // the regex as the bottleneck of the analyzed families
    override def norm(c: Column): Column = graft.plans.AsciiFold(c)
    override def normText(s: String): String =
      s.replaceAll("[^A-Za-z0-9]+", " ")
        .toLowerCase(java.util.Locale.ROOT).trim
  }

  /** Standard + stop-word removal + the pinned suffix stemmer (r15,
    * VERDICT r14 #2) — the everyday OpenSearch text-index analyzer:
    * "running" matches "run", "parties" matches "party", "the"/"and"
    * never pollute term stats. One [[graft.plans.EnglishFold]] kernel;
    * the rule chain and its DuckDB SQL replay live on that class.
    * `normText` DELEGATES to the same kernel, so the column/driver
    * twins agree by construction, not by parallel implementation.
    */
  case object English extends Analyzer("english") {
    override def norm(c: Column): Column = graft.plans.EnglishFold(c)
    override def normText(s: String): String =
      graft.plans.EnglishFold.fold(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
  }

  /** CUSTOM analyzer (r16, VERDICT r15 #6): a named base (`standard`
    * or `english`), caller stop words, and synonym groups — the two
    * knobs every real search deployment turns ("tv" = "television",
    * domain noise words). Applied AFTER the base fold, per token:
    * custom stop removal first, then each group member rewrites to the
    * group's canonical token (the FIRST member as written). One
    * [[graft.plans.CustomFold]] kernel; `normText` delegates to the
    * same config, so the twins agree by construction.
    *
    * `stop` and `groups` here are the FOLDED canonical forms —
    * construct through [[Analyzer.custom]] (which folds and validates
    * raw caller input) or by name round-trip. The NAME is the
    * serialized definition (`custom:base=…;stop=…;syn=m1,m2|m3,m4`),
    * so everything that stores an analyzer name — the BM25 index meta
    * sidecar above all — round-trips the full semantics through
    * [[Analyzer.of]] with zero new plumbing. The parse path must NOT
    * re-fold members: the english stemmer is not idempotent
    * ("settings" → "setting" → "set"), so re-folding would silently
    * shift the map between a build and its serve.
    */
  final case class Custom private[Analyzer] (base: Analyzer,
      stop: Seq[String], groups: Seq[Seq[String]])
      extends Analyzer(Custom.serialize(base, stop, groups)) {
    private val synFrom = groups.flatMap(g => g.drop(1))
    private val synTo = groups.flatMap(g => g.drop(1).map(_ => g.head))
    @transient private lazy val cfg =
      new graft.plans.CustomFold.Cfg(base.name, stop, synFrom, synTo)
    override def norm(c: Column): Column =
      graft.plans.CustomFold(c, base.name, stop, synFrom, synTo)
    override def normText(s: String): String =
      cfg.fold(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
  }

  object Custom {
    private[Analyzer] def serialize(base: Analyzer, stop: Seq[String],
        groups: Seq[Seq[String]]): String =
      s"custom:base=${base.name};stop=${stop.mkString(",")};" +
        s"syn=${groups.map(_.mkString(",")).mkString("|")}"
  }

  private val FoldedToken = "[a-z0-9]+".r

  /** Build a custom analyzer from RAW caller input: folds every stop
    * word and synonym member through the base analyzer once, validates
    * the result (each must fold to exactly one token; groups must stay
    * distinguishable and disjoint), and fails loud on every silent-
    * drift shape — a stop word the base already removes, a group
    * collapsing to one token, a member claimed by two groups or by the
    * stop list.
    */
  def custom(baseName: String, stopwords: Seq[String],
      synonyms: Seq[Seq[String]]): Custom = {
    val base = of(baseName) match {
      case b @ (Standard | English) => b
      case other => throw new IllegalArgumentException(
        s"custom analyzer base must be standard or english, got " +
          s"'${other.name}' (whitespace tokens are not twin-replayable)")
    }
    def foldOne(raw: String, what: String): String =
      base.normText(raw) match {
        case t @ FoldedToken() => t
        case "" => throw new IllegalArgumentException(
          s"custom analyzer $what '$raw' folds to nothing under the " +
            s"'$baseName' base (already stopped or all-separator) - it " +
            "could never match a token")
        case folded => throw new IllegalArgumentException(
          s"custom analyzer $what '$raw' must fold to a single token " +
            s"under the '$baseName' base, got '$folded'")
      }
    val foldedStop = stopwords.map(foldOne(_, "stop word")).distinct.sorted
    val foldedGroups = synonyms.map { g =>
      val folded = g.map(foldOne(_, "synonym member"))
      val distinct = folded.distinct
      if (distinct.size < 2) throw new IllegalArgumentException(
        s"custom analyzer synonym group ${g.mkString("[", ", ", "]")} " +
          s"collapses to ${distinct.mkString("'", "', '", "'")} under the " +
          s"'$baseName' base - its members already analyze identically")
      distinct
    }
    val members = foldedGroups.flatten
    if (members.distinct.size != members.size)
      throw new IllegalArgumentException(
        "custom analyzer synonym groups overlap after folding - a token " +
          "in two groups has no single canonical form")
    members.find(foldedStop.contains).foreach(m =>
      throw new IllegalArgumentException(
        s"custom analyzer synonym member '$m' is also a stop word - a " +
          "stopped token never reaches the synonym map"))
    Custom(base, foldedStop, foldedGroups)
  }

  val all: Seq[Analyzer] = Seq(Whitespace, Standard, English)

  /** Named lookup — fail loud on unknown names (a typo must never
    * silently fall back to whitespace semantics). `custom:…` names
    * (the serialized definition, see [[Custom]]) parse back to the
    * full analyzer WITHOUT re-folding their already-folded tokens.
    */
  def of(name: String): Analyzer =
    if (name.startsWith("custom:")) parseCustom(name)
    else all.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"unknown analyzer '$name' (supported: ${all.map(_.name).mkString(", ")}, custom:…)"))

  private def parseCustom(name: String): Custom = {
    def bad(why: String) = throw new IllegalArgumentException(
      s"malformed custom analyzer name '$name': $why")
    val body = name.stripPrefix("custom:")
    val parts = body.split(";", -1)
    if (parts.length != 3 || !parts(0).startsWith("base=") ||
        !parts(1).startsWith("stop=") || !parts(2).startsWith("syn="))
      bad("expected custom:base=…;stop=…;syn=…")
    val base = of(parts(0).stripPrefix("base=")) match {
      case b @ (Standard | English) => b
      case other => bad(s"base '${other.name}' is not standard/english")
    }
    def toks(s: String, what: String): Seq[String] =
      if (s.isEmpty) Seq.empty
      else s.split(",", -1).toSeq.map {
        case t @ FoldedToken() => t
        case t => bad(s"$what '$t' is not a folded token")
      }
    val stop = toks(parts(1).stripPrefix("stop="), "stop word")
    if (stop != stop.distinct.sorted) bad("stop list must be sorted, unique")
    val groups = parts(2).stripPrefix("syn=") match {
      case "" => Seq.empty[Seq[String]]
      case s => s.split("\\|", -1).toSeq.map { g =>
        val ms = toks(g, "synonym member")
        if (ms.size < 2) bad(s"synonym group '$g' needs 2+ members")
        if (ms.distinct.size != ms.size) bad(s"synonym group '$g' repeats a member")
        ms
      }
    }
    val members = groups.flatten
    if (members.distinct.size != members.size) bad("synonym groups overlap")
    members.find(stop.contains).foreach(m => bad(s"member '$m' is also a stop word"))
    Custom(base, stop, groups)
  }
}

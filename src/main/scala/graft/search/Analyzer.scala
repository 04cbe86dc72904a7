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

  val all: Seq[Analyzer] = Seq(Whitespace, Standard, English)

  /** Named lookup — fail loud on unknown names (a typo must never
    * silently fall back to whitespace semantics).
    */
  def of(name: String): Analyzer =
    all.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"unknown analyzer '$name' (supported: ${all.map(_.name).mkString(", ")})"))
}

package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** OpenSearch-style JSON query-DSL compiler.
  *
  * The reference system's clients speak the OpenSearch `_search` request
  * body (query DSL JSON) against the managed search collection
  * (/root/reference/lib/opensearch-dynamodb-etl-cdk-stack.ts:91 declares a
  * SEARCH-type collection; the ETL in assets/custom_resource.py feeds it).
  * This compiler lets those clients keep their request bodies: it parses
  * the JSON once on the driver and compiles it to the SAME Catalyst
  * `Column` expressions the handwritten query surface uses, so filters
  * still push to the parquet scan, pruning still applies, and the whole
  * request stays inside whole-stage codegen. No UDFs, no per-row JSON
  * work — the JSON exists only at plan-build time.
  *
  * Supported query clauses (fail-loud on anything else):
  * `term`, `terms`, `range` (gt/gte/lt/lte), `prefix`, `wildcard`
  * (`*`/`?`), `exists`, `match` (whitespace tokens, score = number of
  * distinct query terms present, `minimum_should_match` supported),
  * `match_phrase` (token-boundary substring), `match_phrase_prefix`
  * (search-as-you-type), `match_bool_prefix` (bag-of-terms
  * type-ahead: full terms + a prefix on the last token),
  * `match_all`, `bool` (must / filter / must_not
  * / should with `minimum_should_match`), `constant_score`, `fuzzy`
  * (token edit distance, `fuzziness`/`prefix_length`), `terms_set`,
  * `dis_max` (`tie_breaker`), `boosting` (`negative_boost`),
  * `pinned` (curated ids above organic hits), `ids` (explicit id list
  * against a named `field`), `regexp` (whole-value anchored match),
  * `multi_match` (`best_fields`/`most_fields` over several fields),
  * `simple_query_string` (the `+term -term "phrase"` human syntax over
  * one field), `function_score` (integer-weighted filter functions,
  * `score_mode` sum/max × `boost_mode` multiply/sum),
  * `distance_feature` (integer ppm proximity decay to an origin),
  * `rank_feature` (integer ppm saturation boost x/(x+pivot)),
  * `geo_distance` (haversine radius filter over named lat/lon
  * columns, 6-dp-rounded before comparison so the boundary is
  * engine-portable),
  * `geo_bounding_box` (axis-aligned lat/lon box as four pushed band
  * predicates),
  * `query_string` (the full Lucene grammar: fielded terms, quoted
  * phrases, AND/OR/NOT precedence, grouping, integer `^boosts`),
  * `nested` (same-element conjunction over an array-of-structs column
  * via a higher-order filter — no explode, no join),
  * `script_score` (a Painless-shaped integer script compiled by
  * [[ScoreScript]] straight to codegen'd Catalyst arithmetic — zero
  * row-time interpretation), `wrapper` (base64-shipped query decoded
  * once on the driver), `combined_fields` (term-centric multi-field
  * match — a term counts once if present in ANY field),
  * `span_first` (term within the first `end` token positions —
  * per-row computable, so a plain clause), and, compiled at
  * the REQUEST level because they depend on corpus state:
  * `more_like_this` (the q118 tf·idf postings plan), `span_near`
  * (positional postings, ordered or not; clauses are `span_term` or
  * `span_multi` — a prefix/wildcard/fuzzy/regexp postings filter,
  * also standalone and inside `span_or`), `percolate` (reverse
  * search: an inline stored-query registry compiled to map-side
  * predicates, the q98 contract), the `suggest` section
  * (term suggester — the q117 banded levenshtein vocab walk —, the
  * two-word phrase suggester — q121's bigram-evidence re-rank — and
  * the completion suggester — q115's prefix autocomplete),
  * the `knn` request (exact filtered cosine top-k of an inline
  * vector by the integer-quantize recipe, the q75 contract — or,
  * with an `index` arm, served from the partition-pruned IVF layout),
  * and `intervals` (k-term ordered proximity with a total gap
  * budget — span_near's postings shape generalized to a k−1-step
  * equi-join chain; trailing-`*` stem terms widen a term's postings
  * to a prefix).
  *
  * Scoring is the engine's deterministic integer model (the q41
  * contract): a matched term-level clause scores 1, a `match` clause
  * scores its distinct-term overlap count, `bool` sums must + matched
  * should scores (filter context scores 0, as in OpenSearch). `dis_max`
  * and `boosting` emit ppm-scaled scores (×10⁶) so their fractional
  * `tie_breaker`/`negative_boost` stay exact integers. Scores are LONG,
  * so cross-engine comparison is exact — no float tie ambiguity.
  *
  * Analyzer: every FULL-TEXT surface (the match family, both human
  * query grammars, intervals, span_near, more_like_this, the three
  * suggesters, significant_text) takes a per-clause `"analyzer"`
  * option ([[Analyzer]] — `whitespace` default, `standard` =
  * strip-then-lowercase via the native [[graft.plans.AsciiFold]]
  * expression) applied identically to the field column and the query
  * text. Term-level clauses (term/prefix/wildcard/fuzzy/regexp/
  * terms_set) stay raw BY THE OPENSEARCH CONTRACT — term-level
  * queries are not analyzed there either; their folding knob is the
  * term-level `case_insensitive` option (term/prefix/wildcard/regexp).
  *
  * Request level: `query`, `sort` (field names or `{field: {order}}`,
  * `_score` sorts by the computed score, `_geo_distance` by the
  * deterministic haversine to an origin), `min_score` (integer
  * relevance floor), `from`/`size`,
  * `search_after` (keyset paging over the declared sort), `_source`
  * (projection; the name `score` selects the computed score),
  * `highlight` (tag-wrapped fragment columns — multi-field,
  * `number_of_fragments` ≥ 1 per field, q46/q239 contracts),
  * `collapse` (one hit — or top `inner_hits.size` — per distinct
  * field value, one window over the hit set), `script_fields`
  * (computed per-hit columns through the [[ScoreScript]] compiler —
  * sortable, projectable), the PIT wire trio
  * ([[openPit]]/[[searchPit]]/[[closePit]] — `{"pit": {"id"}}` +
  * `search_after` paging a PINNED index version), the [[rankEval]]
  * endpoint (precision@k / MRR over rated requests), and
  * `aggs` with `terms` (+ `include`/`exclude` key filters applied
  * map-side before the shuffle, nested metric sub-aggs or one
  * `top_hits`), `nested` (metrics over array-of-structs elements),
  * `composite` (multi-source buckets with `after` keyset paging,
  * pruned before the groupBy),
  * `range` (overlapping [from, to) buckets), `date_range`
  * (calendar-anchored [from, to) buckets), `ip_range` (dotted-quad
  * IPv4 [from, to) buckets via one codegen'd octet split),
  * `rare_terms` (the long
  * tail at/under `max_doc_count`), `filters` (named
  * sub-query buckets), `filter` (ONE sub-query bucket — a
  * conditional global aggregate), `global` (sub-aggs over the whole
  * corpus, ignoring the query), `missing` (the NULL-field bucket),
  * `multi_terms` (composite-key terms, one groupBy on all key
  * fields), `significant_terms`, `adjacency_matrix`
  * (pairwise filter-intersection counts, one pass),
  * `matrix_stats` (exact-moment mean/variance/covariance/correlation
  * of two integral fields), `geo_grid` (fixed-degree lat/lon cells),
  * `auto_date_histogram` (finest calendar unit within a bucket
  * target, deterministic), `significant_text` (token doc-frequency
  * over-representation), `sampler` (deterministic top-scored sample
  * with a required unique tiebreak), `string_stats` (lengths + global
  * character entropy),
  * pipeline aggs over a
  * histogram/date_histogram series (`cumulative_sum`, `derivative`,
  * `serial_diff`, `moving_avg` via `buckets_path`, windows over the
  * bounded bucket table) plus `bucket_selector` (mini-script HAVING)
  * and `bucket_sort` (ORDER BY + from/size over buckets, also under
  * `terms`), sibling `avg|sum|min|max|stats_bucket` aggs (the
  * one-row sibling table),
  * global metric aggs, `histogram` (+ `offset`, and `min_doc_count: 0`
  * with `extended_bounds` — empty buckets appear aligned to the
  * shifted boundaries, so pipeline aggs over sparse series stay
  * correct), `date_histogram`
  * (calendar_interval day/month/year or exact-microsecond
  * `fixed_interval`, with fixed `±HH:mm` `time_zone` offsets —
  * shift→truncate→unshift — or a request-supplied DST transition
  * table `{"transitions": [[iso_utc, offset_min], …]}` bucketing by
  * the LOCAL calendar: the day containing a transition is one
  * 23h/25h bucket, keyed by the UTC instant of its local boundary;
  * named IANA zone strings fail loud), `stats`, `extended_stats` (exact
  * integer moments, integral fields enforced), `weighted_avg`,
  * `top_metrics` (top-sort-row
  * metric via struct max), `boxplot` (discrete five-number summary),
  * `scripted_metric` (a ScoreScript map
  * expression + a named monoid reduce), `percentile_ranks`
  * (inclusive-CDF percent per value, engine-exact), `geo_centroid`
  * (exact milli-degree integer mean per axis),
  * `avg`/`min`/`max`/`sum`/`value_count`/`cardinality`/`percentiles`
  * (discrete — engine-exact, no interpolation). A request with
  * `aggs` returns the bucket table (the `size: 0` idiom) — except
  * `top_hits`, which returns the per-bucket top hit rows; otherwise the
  * hit table.
  */
object QueryDsl extends QueryDslClauses with QueryDslRequests
    with QueryDslEndpoints with QueryDslPipeline with QueryDslAggs {

  /** The ONE bare-term shape both human query grammars
    * (`simple_query_string` and `query_string`) accept — shared so
    * the two tokenizers can never drift.
    */
  private[search] val BareTermRe = """[\p{L}\p{N}_][\p{L}\p{N}_'.-]*""".r

  /** A `min_doc_count: 0` dense-fill request: the key series to
    * full-outer-join against the bucket table — numeric (histogram,
    * shifted by `off`) or time (fixed-interval date_histogram in
    * exact microseconds, shifted by the time-zone offset).
    */
  private[search] sealed trait HistoFill
  private[search] final case class NumFill(field: String, iv: Long, off: Long,
      bounds: Option[(Long, Long)]) extends HistoFill
  private[search] final case class DateFill(field: String, ivUs: Long,
      tzOffUs: Long, bounds: Option[(Long, Long)]) extends HistoFill
  /** Dense time series whose bucket keys have NO constant UTC step —
    * calendar intervals and transition-table/named time zones — so
    * the key series is iterated driver-side in LOCAL wall time
    * ([[QueryDslAggs.localDenseKeys]]) into ≤100k literal UTC-micro
    * keys (the Kibana-default dashboard shape: `calendar_interval:
    * day` + named `time_zone` + `min_doc_count: 0`).
    */
  private[search] final case class DateFillKeys(keys: Seq[Long])
      extends HistoFill

  /** Compiled form of the `query` part: a row predicate plus the
    * deterministic LONG score expression. `ppm` marks clauses whose
    * score is ×10⁶-scaled (dis_max, boosting, best_fields
    * multi_match, distance_feature, rank_feature): unit- and
    * ppm-scale scores are NOT commensurate, so positions that would
    * sum or re-scale them (bool scoring sections mixing the two,
    * dis_max/boosting over a ppm sub-clause, pinned's organic slot,
    * function_score's additive boost) fail loud instead of silently
    * mis-ranking — e.g. a ppm organic score could cross pinned's
    * 10¹² pin band, breaking the pins-always-first guarantee.
    */
  final case class CompiledQuery(pred: Column, score: Column,
      ppm: Boolean = false,
      /** `_name`d clause predicates collected on the way up — the
        * relevance-debugging surface: the hit table surfaces them as a
        * stringified sorted `matched_queries` list (the q131 rule: no
        * bare array columns cross the engine boundary).
        */
      named: Seq[(String, Column)] = Nil)

  def parse(json: String): JValue = JsonMethods.parse(json)

  // -------------------------------------------------------------- helpers

  private[search] def fieldValue(body: JValue, clause: String): (String, JValue) =
    body match {
      case JObject(List((f, JObject(opts)))) if opts.exists(_._1 == "value") =>
        (f, opts.find(_._1 == "value").get._2)
      case JObject(List((f, v))) => (f, v)
      case other => fail(s"$clause requires {field: value}: ${render(other)}")
    }

  /** [[fieldValue]] plus the term-level `case_insensitive` option —
    * STRICT on the value-object form (unknown options fail loud, not
    * silently ignored).
    */
  private[search] def fieldValueCi(body: JValue, clause: String): (String, JValue, Boolean) =
    body match {
      case JObject(List((f, JObject(opts)))) if opts.exists(_._1 == "value") =>
        val m = opts.toMap
        m.keySet.diff(Set("value", "case_insensitive")).foreach(k =>
          fail(s"unsupported $clause option '$k' on '$f'"))
        (f, m("value"), caseInsensitiveOpt(m, s"$clause on '$f'"))
      case JObject(List((f, v))) => (f, v, false)
      case other => fail(s"$clause requires {field: value}: ${render(other)}")
    }

  /** [[fieldValueCi]] plus the term-level integer `boost` (the term
    * clause's rule: score boost instead of 1, float boosts fail loud
    * under the exact scoring model) — the top-level
    * prefix/wildcard/regexp form; span_multi keeps the boost-less
    * [[fieldValueCi]] (spans are positional, a wrapped query's boost
    * has nothing to scale there — OpenSearch ignores it, this engine
    * refuses it).
    */
  private[search] def fieldValueCiBoost(body: JValue, clause: String)
      : (String, JValue, Boolean, Long) =
    body match {
      case JObject(List((f, JObject(opts)))) if opts.exists(_._1 == "value") =>
        val m = opts.toMap
        m.keySet.diff(Set("value", "case_insensitive", "boost")).foreach(k =>
          fail(s"unsupported $clause option '$k' on '$f'"))
        val b = m.get("boost") match {
          case Some(JInt(i)) if i >= 1 => i.toLong
          case None                    => 1L
          case Some(other) => fail(s"$clause boost must be a positive " +
            s"integer (exact scoring): ${render(other)}")
        }
        (f, m("value"), caseInsensitiveOpt(m, s"$clause on '$f'"), b)
      case JObject(List((f, v))) => (f, v, false, 1L)
      case other => fail(s"$clause requires {field: value}: ${render(other)}")
    }

  private[search] def litOf(v: JValue): Column = lit(scalaOf(v))

  private[search] def scalaOf(v: JValue): Any = v match {
    case JString(s)  => s
    case JInt(i)     => i.toLong
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JBool(b)    => b
    case other       => fail(s"unsupported literal: ${render(other)}")
  }

  /** OpenSearch wildcard (`*`, `?`) → SQL LIKE, escaping LIKE's own
    * metacharacters in the literal parts.
    */
  private[search] def wildcardToLike(pattern: String): String =
    pattern.flatMap {
      case '*'  => "%"
      case '?'  => "_"
      case '%'  => "\\%"
      case '_'  => "\\_"
      case '\\' => "\\\\"
      case c    => c.toString
    }

  /** Optional [0, 1] fraction parsed into exact ppm (×10⁶) — the
    * scale every fractional DSL knob (tie_breaker, negative_boost)
    * uses so scores stay integral.
    */
  private[search] def ppmOf(m: Map[String, JValue], key: String, default: Long): Long = {
    val v = m.get(key) match {
      case Some(JDouble(d))  => math.round(d * 1000000L)
      case Some(JInt(i))     => i.toLong * 1000000L
      case Some(JDecimal(d)) => math.round(d.toDouble * 1000000L)
      case None              => default
      case Some(other)       => fail(s"$key must be numeric: ${render(other)}")
    }
    if (v < 0L || v > 1000000L) fail(s"$key must be in [0, 1]")
    v
  }

  private[search] def strOpt(m: Map[String, JValue], k: String): Option[String] =
    m.get(k).collect { case JString(s) => s }

  /** Present-but-wrong-typed integers fail loud: a float or string
    * where an int belongs must never silently become the default.
    */
  private[search] def intOpt(m: Map[String, JValue], k: String): Option[Int] =
    m.get(k).map {
      case JInt(i) => i.toInt
      case other   => fail(s"$k must be an integer: ${render(other)}")
    }

  private[search] def render(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

  private[search] def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"query-dsl: $msg")
}

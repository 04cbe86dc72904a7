package graft.search

import org.apache.spark.sql.{Column, DataFrame}
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
  * `match_phrase` (token-boundary substring), `match_all`, and `bool`
  * (must / filter / must_not / should with `minimum_should_match`).
  *
  * Scoring is the engine's deterministic integer model (the q41
  * contract): a matched term-level clause scores 1, a `match` clause
  * scores its distinct-term overlap count, `bool` sums must + matched
  * should scores (filter context scores 0, as in OpenSearch). Scores are
  * LONG, so cross-engine comparison is exact — no float tie ambiguity.
  *
  * Request level: `query`, `sort` (field names or `{field: {order}}`,
  * `_score` sorts by the computed score), `from`/`size`, `_source`
  * (projection; the name `score` selects the computed score), and
  * `aggs` with `terms` (+ nested metric sub-aggs), global metric aggs,
  * `histogram`, `date_histogram` (calendar_interval day/month), `stats`,
  * `avg`/`min`/`max`/`sum`/`value_count`/`cardinality`. A request with
  * `aggs` returns the bucket table (the `size: 0` idiom); otherwise the
  * hit table.
  */
object QueryDsl {

  /** Compiled form of the `query` part: a row predicate plus the
    * deterministic LONG score expression.
    */
  final case class CompiledQuery(pred: Column, score: Column)

  def parse(json: String): JValue = JsonMethods.parse(json)

  // ---------------------------------------------------------------- query

  /** Compile the `query` object of a request body. */
  def compileQuery(q: JValue): CompiledQuery = q match {
    case JObject(List((clause, body))) => compileClause(clause, body)
    case JObject(Nil)                  => CompiledQuery(lit(true), lit(0L))
    case other =>
      fail(s"query must be a single-clause object, got: ${render(other)}")
  }

  private def compileClause(clause: String, body: JValue): CompiledQuery =
    clause match {
      case "match_all" => CompiledQuery(lit(true), lit(0L))
      case "term"      => termClause(body, multi = false)
      case "terms"     => termClause(body, multi = true)
      case "range"     => rangeClause(body)
      case "prefix"    =>
        val (f, v) = fieldValue(body, "prefix")
        CompiledQuery(col(f).startsWith(litOf(v)), lit(1L))
      case "wildcard" =>
        val (f, v) = fieldValue(body, "wildcard")
        val pat = v match {
          case JString(s) => wildcardToLike(s)
          case other      => fail(s"wildcard pattern must be a string: ${render(other)}")
        }
        CompiledQuery(col(f).like(pat), lit(1L))
      case "exists" => body match {
        case JObject(fs) => fs.toMap.get("field") match {
          case Some(JString(f)) => CompiledQuery(col(f).isNotNull, lit(1L))
          case _ => fail("exists requires {\"field\": name}")
        }
        case _ => fail("exists requires {\"field\": name}")
      }
      case "match"        => matchClause(body)
      case "match_phrase" => phraseClause(body)
      case "bool"         => boolClause(body)
      case other =>
        fail(s"unsupported query clause '$other' (supported: match_all, term, " +
          "terms, range, prefix, wildcard, exists, match, match_phrase, bool)")
    }

  private def termClause(body: JValue, multi: Boolean): CompiledQuery =
    body match {
      case JObject(List((f, v))) =>
        val pred =
          if (multi) v match {
            case JArray(vs) => col(f).isin(vs.map(scalaOf): _*)
            case other => fail(s"terms values must be an array: ${render(other)}")
          }
          else col(f) === litOf(v)
        CompiledQuery(pred, lit(1L))
      case other => fail(s"term/terms requires {field: value}: ${render(other)}")
    }

  private def rangeClause(body: JValue): CompiledQuery = body match {
    case JObject(List((f, JObject(bounds)))) =>
      if (bounds.isEmpty) fail(s"range on '$f' has no bounds")
      val preds = bounds.map {
        case ("gte", v) => col(f) >= litOf(v)
        case ("gt", v)  => col(f) > litOf(v)
        case ("lte", v) => col(f) <= litOf(v)
        case ("lt", v)  => col(f) < litOf(v)
        case (k, _)     => fail(s"unsupported range bound '$k' on '$f'")
      }
      CompiledQuery(preds.reduce(_ && _), lit(1L))
    case other => fail(s"range requires {field: {bounds}}: ${render(other)}")
  }

  /** `match`: whitespace-tokenized overlap. Score = count of DISTINCT
    * query terms present in the field (the q41 semantics — codegen'd
    * array intersection, no shuffle). `minimum_should_match` gates the
    * predicate (default 1).
    */
  private def matchClause(body: JValue): CompiledQuery = body match {
    case JObject(List((f, spec))) =>
      val (queryText, msm) = spec match {
        case JString(s) => (s, 1L)
        case JObject(opts) =>
          val m = opts.toMap
          val q = m.get("query") match {
            case Some(JString(s)) => s
            case _ => fail(s"match on '$f' requires a string 'query'")
          }
          val n = m.get("minimum_should_match") match {
            case Some(JInt(i)) => i.toLong
            case None          => 1L
            case Some(other) => fail(s"minimum_should_match must be an int: ${render(other)}")
          }
          m.keySet.diff(Set("query", "minimum_should_match")).foreach(k =>
            fail(s"unsupported match option '$k' on '$f'"))
          (q, n)
        case other => fail(s"match body must be string or object: ${render(other)}")
      }
      val terms = queryText.trim.split("\\s+").toSeq.distinct
      if (terms.isEmpty || terms == Seq("")) fail(s"match on '$f' has an empty query")
      val termArr = array(terms.map(lit): _*)
      val score =
        size(array_intersect(array_distinct(split(col(f), " ")), termArr)).cast("long")
      CompiledQuery(score >= lit(msm), score)
    case other => fail(s"match requires {field: spec}: ${render(other)}")
  }

  /** `match_phrase`: the engine's token-boundary substring contract
    * (q59) — the space-padded text contains the space-joined phrase.
    */
  private def phraseClause(body: JValue): CompiledQuery = body match {
    case JObject(List((f, v))) =>
      val phrase = v match {
        case JString(s) => s.trim
        case JObject(opts) => opts.toMap.get("query") match {
          case Some(JString(s)) => s.trim
          case _ => fail(s"match_phrase on '$f' requires a string 'query'")
        }
        case other => fail(s"match_phrase body must be string or object: ${render(other)}")
      }
      if (phrase.isEmpty) fail(s"match_phrase on '$f' has an empty phrase")
      val padded = concat(lit(" "), col(f), lit(" "))
      CompiledQuery(padded.contains(s" $phrase "), lit(1L))
    case other => fail(s"match_phrase requires {field: phrase}: ${render(other)}")
  }

  private def boolClause(body: JValue): CompiledQuery = body match {
    case JObject(parts) =>
      val m = parts.toMap
      m.keySet.diff(Set("must", "filter", "must_not", "should", "minimum_should_match"))
        .foreach(k => fail(s"unsupported bool section '$k'"))
      def section(name: String): Seq[CompiledQuery] = m.get(name) match {
        case None              => Nil
        case Some(JArray(cs))  => cs.map(compileQuery)
        case Some(one: JObject) => Seq(compileQuery(one))
        case Some(other) => fail(s"bool.$name must be a clause or array: ${render(other)}")
      }
      val must    = section("must")
      val filter  = section("filter")
      val mustNot = section("must_not")
      val should  = section("should")

      // minimum_should_match default: 1 when should is the only match
      // criterion, else 0 (OpenSearch's rule).
      val msmDefault = if (should.nonEmpty && must.isEmpty && filter.isEmpty) 1L else 0L
      val msm = m.get("minimum_should_match") match {
        case Some(JInt(i)) => i.toLong
        case None          => msmDefault
        case Some(other) => fail(s"minimum_should_match must be an int: ${render(other)}")
      }

      val base = (must ++ filter).map(_.pred) ++ mustNot.map(c => !c.pred)
      val shouldMatched =
        if (should.isEmpty) lit(0L)
        else should.map(c => when(c.pred, 1L).otherwise(0L)).reduce(_ + _)
      val preds = base ++ (if (msm > 0L) Seq(shouldMatched >= lit(msm)) else Nil)
      val pred = if (preds.isEmpty) lit(true) else preds.reduce(_ && _)

      // Query-context scoring: must scores always (pred already gates
      // them), should scores only when the clause matched; filter and
      // must_not contribute nothing (filter context).
      val scoreParts = must.map(_.score) ++
        should.map(c => when(c.pred, c.score).otherwise(0L))
      val score =
        if (scoreParts.isEmpty) lit(0L) else scoreParts.reduce(_ + _)
      CompiledQuery(pred, score)
    case other => fail(s"bool requires an object body: ${render(other)}")
  }

  // -------------------------------------------------------------- request

  /** Compile a full `_search` request body against `table`. Returns the
    * hit table (with a `score` column when the query scores), or the
    * bucket table when `aggs` is present.
    */
  def search(table: DataFrame, requestJson: String): DataFrame = {
    val req = parse(requestJson) match {
      case o: JObject => o.obj.toMap
      case other      => fail(s"request body must be an object: ${render(other)}")
    }
    req.keySet.diff(Set("query", "sort", "from", "size", "_source", "aggs"))
      .foreach(k => fail(s"unsupported request key '$k'"))

    val compiled = req.get("query").map(compileQuery)
      .getOrElse(CompiledQuery(lit(true), lit(0L)))
    val filtered = table.filter(compiled.pred)

    req.get("aggs") match {
      case Some(aggs) => compileAggs(filtered, aggs)
      case None =>
        val scored = filtered.withColumn("score", compiled.score)
        val sorted = req.get("sort") match {
          case None    => scored
          case Some(s) => scored.orderBy(sortCols(s): _*)
        }
        val paged = (req.get("from"), req.get("size")) match {
          case (Some(JInt(f)), Some(JInt(n))) => sorted.offset(f.toInt).limit(n.toInt)
          case (Some(JInt(f)), None)          => sorted.offset(f.toInt)
          case (None, Some(JInt(n)))          => sorted.limit(n.toInt)
          case (None, None)                   => sorted
          case _ => fail("from/size must be integers")
        }
        req.get("_source") match {
          case None => paged
          case Some(JArray(fields)) =>
            paged.select(fields.map {
              case JString(f) => col(f)
              case other      => fail(s"_source entries must be strings: ${render(other)}")
            }: _*)
          case Some(other) => fail(s"_source must be an array: ${render(other)}")
        }
    }
  }

  private def sortCols(sort: JValue): Seq[Column] = {
    def one(v: JValue): Column = v match {
      case JString(f) => sortField(f, "asc")
      case JObject(List((f, JString(ord)))) => sortField(f, ord)
      case JObject(List((f, JObject(opts)))) => opts.toMap.get("order") match {
        case Some(JString(ord)) => sortField(f, ord)
        case _                  => sortField(f, "asc")
      }
      case other => fail(s"unsupported sort entry: ${render(other)}")
    }
    sort match {
      case JArray(entries) => entries.map(one)
      case single          => Seq(one(single))
    }
  }

  private def sortField(f: String, order: String): Column = {
    val c = if (f == "_score") col("score") else col(f)
    order match {
      case "asc"  => c.asc
      case "desc" => c.desc
      case other  => fail(s"sort order must be asc|desc, got '$other'")
    }
  }

  // ----------------------------------------------------------------- aggs

  /** Compile the `aggs` object over the (already filtered) hits.
    *
    * One bucket agg (`terms` | `histogram` | `date_histogram`) with
    * metric sub-aggs compiles to a single groupBy (one shuffle, partial
    * aggregation map-side); metric-only aggs compile to a one-row global
    * aggregate. Bucket output: the key column (named after the agg),
    * `doc_count`, then sub-agg columns named `<aggName>_<metric>` for
    * `stats` / `<aggName>` otherwise — ordered doc_count desc, key asc
    * (the OpenSearch terms default, made total).
    */
  def compileAggs(hits: DataFrame, aggs: JValue): DataFrame = {
    val entries = aggs match {
      case JObject(es) if es.nonEmpty => es
      case other => fail(s"aggs must be a non-empty object: ${render(other)}")
    }
    // Split bucket aggs from metric aggs.
    val (bucketAggs, metricAggs) = entries.partition {
      case (_, JObject(spec)) =>
        spec.exists(p => Set("terms", "histogram", "date_histogram").contains(p._1))
      case _ => false
    }
    if (bucketAggs.size > 1)
      fail("at most one bucket agg per request (compose composite queries instead)")

    bucketAggs.headOption match {
      case Some((name, JObject(spec))) =>
        if (metricAggs.nonEmpty)
          fail("mixing a bucket agg with top-level metric aggs is unsupported")
        val m = spec.toMap
        val subs: Seq[Column] = m.get("aggs") match {
          case None             => Nil
          case Some(JObject(s)) => s.flatMap { case (subName, subSpec) => metricCols(subName, subSpec) }
          case Some(other)      => fail(s"aggs.$name.aggs must be an object: ${render(other)}")
        }
        val (keyCol, size) = m.collectFirst {
          case ("terms", JObject(t)) =>
            val tm = t.toMap
            val f = strOpt(tm, "field").getOrElse(fail(s"terms agg '$name' needs a field"))
            (col(f).as(name), intOpt(tm, "size"))
          case ("histogram", JObject(h)) =>
            val hm = h.toMap
            val f = strOpt(hm, "field").getOrElse(fail(s"histogram agg '$name' needs a field"))
            val interval = hm.get("interval") match {
              case Some(JInt(i))    => lit(i.toLong)
              case Some(JDouble(d)) => lit(d)
              case _ => fail(s"histogram agg '$name' needs a numeric interval")
            }
            ((floor(col(f) / interval) * interval).as(name), None)
          case ("date_histogram", JObject(h)) =>
            val hm = h.toMap
            val f = strOpt(hm, "field").getOrElse(fail(s"date_histogram agg '$name' needs a field"))
            val unit = strOpt(hm, "calendar_interval").getOrElse("day") match {
              case "day"   => "DAY"
              case "month" => "MONTH"
              case "year"  => "YEAR"
              case other   => fail(s"unsupported calendar_interval '$other'")
            }
            (date_trunc(unit, col(f)).as(name), None)
        }.getOrElse(fail(s"bucket agg '$name' has no terms/histogram/date_histogram"))

        val grouped = hits.groupBy(keyCol)
          .agg(count(lit(1)).as("doc_count"), subs: _*)
          .orderBy(col("doc_count").desc, col(name).asc)
        size.map(grouped.limit).getOrElse(grouped)

      case _ =>
        // Metric-only: one global aggregation row.
        val cols = metricAggs.flatMap { case (name, spec) => metricCols(name, spec) }
        if (cols.isEmpty) fail("aggs contained no recognizable aggregations")
        hits.agg(cols.head, cols.tail: _*)
    }
  }

  /** Metric sub-agg → named aggregate columns. `stats` fans out to
    * count/min/max/avg/sum with `<name>_` prefixes; everything else is a
    * single column named after the agg. Averages are exact-sum/count
    * (the engine's determinism rule), cardinality is EXACT
    * count-distinct (the approximate variant is q7's separate surface).
    */
  private def metricCols(name: String, spec: JValue): Seq[Column] = spec match {
    case JObject(List((metric, JObject(body)))) =>
      val f = strOpt(body.toMap, "field")
        .getOrElse(fail(s"metric agg '$name' ($metric) needs a field"))
      val c = col(f)
      metric match {
        case "avg"   => Seq((sum(c).cast("double") / count(c)).as(name))
        case "min"   => Seq(min(c).as(name))
        case "max"   => Seq(max(c).as(name))
        case "sum"   => Seq(sum(c).as(name))
        case "value_count" => Seq(count(c).as(name))
        case "cardinality" => Seq(countDistinct(c).as(name))
        case "stats" => Seq(
          count(c).as(s"${name}_count"),
          min(c).as(s"${name}_min"),
          max(c).as(s"${name}_max"),
          (sum(c).cast("double") / count(c)).as(s"${name}_avg"),
          sum(c).as(s"${name}_sum"))
        case other => fail(s"unsupported metric agg '$other' under '$name'")
      }
    case other => fail(s"metric agg '$name' must be {metric: {field: ...}}: ${render(other)}")
  }

  // -------------------------------------------------------------- helpers

  private def fieldValue(body: JValue, clause: String): (String, JValue) =
    body match {
      case JObject(List((f, JObject(opts)))) if opts.exists(_._1 == "value") =>
        (f, opts.find(_._1 == "value").get._2)
      case JObject(List((f, v))) => (f, v)
      case other => fail(s"$clause requires {field: value}: ${render(other)}")
    }

  private def litOf(v: JValue): Column = lit(scalaOf(v))

  private def scalaOf(v: JValue): Any = v match {
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

  private def strOpt(m: Map[String, JValue], k: String): Option[String] =
    m.get(k).collect { case JString(s) => s }

  private def intOpt(m: Map[String, JValue], k: String): Option[Int] =
    m.get(k).collect { case JInt(i) => i.toInt }

  private def render(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"query-dsl: $msg")
}

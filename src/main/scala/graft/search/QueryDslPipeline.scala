package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The `_search` request pipeline of [[QueryDsl]]: `search` itself plus
  * the hit-table post-processing sections (collapse, rescore,
  * highlight, percolate, more_like_this routing, sort/search_after
  * compilation).
  */
private[search] trait QueryDslPipeline { this: QueryDsl.type =>

  /** Compile a full `_search` request body against `table`. Returns the
    * hit table (with a `score` column when the query scores), or the
    * bucket table when `aggs` is present.
    */
  def search(table: DataFrame, requestJson: String): DataFrame = {
    val req = parse(requestJson) match {
      case o: JObject => o.obj.toMap
      case other      => fail(s"request body must be an object: ${render(other)}")
    }
    // `terminate_after` gets a documented refusal, not the generic
    // unknown-key error: per-shard early termination makes both the
    // hit set and the counts depend on shard layout and collection
    // order — non-deterministic by construction, which the engine's
    // exact-replay contract refuses (use `size`, which is the
    // deterministic cap this engine can honor).
    if (req.contains("terminate_after"))
      fail("terminate_after is unsupported: per-shard early termination " +
        "is non-deterministic by construction (hit sets would depend on " +
        "shard layout) - use size, the deterministic cap")
    req.keySet.diff(Set("query", "sort", "from", "size", "_source", "aggs",
        "aggregations", "search_after", "suggest", "highlight", "knn",
        "collapse", "min_score", "script_fields", "runtime_mappings",
        "rescore", "post_filter", "track_total_hits", "track_scores",
        "explain", "fields", "docvalue_fields", "search_type",
        "stored_fields"))
      .foreach(k => fail(s"unsupported request key '$k'"))

    // `search_type`: validated, behaviorally a no-op BY DESIGN — the
    // choice only exists because OpenSearch shards compute LOCAL term
    // statistics unless dfs_query_then_fetch pre-gathers global ones;
    // this engine's scores are always computed from corpus-global
    // state (one plan over the whole table), i.e. every request
    // already gets dfs semantics. Unknown values still fail loud.
    req.get("search_type").foreach {
      case JString("query_then_fetch") | JString("dfs_query_then_fetch") => ()
      case other => fail(s"search_type must be query_then_fetch or " +
        s"dfs_query_then_fetch: ${render(other)}")
    }

    // `stored_fields`: every column of the table is "stored" here, so
    // the section is the SAME projection _source performs — it
    // canonicalizes to _source and re-enters (the aggregations
    // recursion pattern). Both sections together fail loud (one output
    // table, no separate response sections to split across), as does
    // OpenSearch's metadata-only `_none_`.
    req.get("stored_fields") match {
      case None => ()
      case Some(sf) =>
        if (req.contains("_source"))
          fail("give _source or stored_fields, not both (one hit table)")
        sf match {
          case JString("_none_") => fail("stored_fields _none_ is " +
            "unsupported: the hit table has no metadata-only shape")
          case JArray(_) | JString(_) => ()
          case other => fail(s"stored_fields must be a field array: ${render(other)}")
        }
        return search(table, render(JObject(
          ((req - "stored_fields") + ("_source" -> sf)).toList)))
    }

    // `aggregations`: the long-form spelling OpenSearch accepts as an
    // exact synonym — canonicalized to `aggs` ONCE at the request
    // root, then the request re-enters compilation (the
    // runtime_mappings recursion pattern). ROOT ONLY: inside agg
    // bodies a key named "aggregations" could be an agg NAME, so the
    // nested sub-agg section keeps the one spelling `aggs` (a nested
    // "aggregations" section fails loud as an unknown option).
    if (req.contains("aggregations")) {
      if (req.contains("aggs"))
        fail("give aggs or aggregations, not both")
      return search(table, render(JObject(
        ((req - "aggregations") + ("aggs" -> req("aggregations"))).toList)))
    }

    // `terms` LOOKUP form anywhere in the query-bearing sections
    // (query / post_filter / rescore — clause trees; aggs keep their
    // own `terms` AGG spelling untouched): each lookup resolves ONCE
    // on the driver to a plain values array ([[resolveTermsLookup]] —
    // a pushed-filter point read), then the request re-enters
    // compilation as an ordinary terms clause, so the row-side
    // predicate stays the map-side-pushable `isin` and composes
    // inside bool/function_score/… for free.
    locally {
      var changed = false
      def isLookup(v: JValue): Boolean = v match {
        case JObject(o) =>
          val k = o.map(_._1).toSet
          k.contains("path") || k.contains("index")
        case _ => false
      }
      def walk(v: JValue): JValue = v match {
        case JObject(fields) => JObject(fields.map {
          case ("terms", JObject(parts)) if parts.exists(p => isLookup(p._2)) =>
            changed = true
            ("terms", JObject(parts.map {
              case (pf, pv) if isLookup(pv) =>
                val JObject(o) = pv: @unchecked
                (pf, resolveTermsLookup(pf, o.toMap, table))
              case other => other
            }))
          case (k, v2) => (k, walk(v2))
        })
        case JArray(vs) => JArray(vs.map(walk))
        case other      => other
      }
      val walked = Seq("query", "post_filter", "rescore").foldLeft(req) {
        (r, s) => r.get(s).fold(r)(v => r.updated(s, walk(v)))
      }
      if (changed) return search(table, render(JObject(walked.toList)))
    }

    // geo sidecar AUTO-WIRING (r16, VERDICT r15 #4): a `geo_shape`
    // doc_shape clause WITHOUT `envelope_fields` over a table whose
    // geometry column carries the `GeoEnvelope.materialize` schema
    // metadata gets the four corner names injected and the request
    // re-enters — so the pushable pre-filter fires wherever the table
    // was materialized, not only where the request remembered to spell
    // it. Strictly conservative: the recorded docKind and vertex cap
    // must match what the clause would compile with, every corner
    // column must still exist, and an explicit `envelope_fields`
    // always wins (the documented override). Injection implies the
    // sidecar's documented semantic shift (pre-filter-pruned poison
    // rows no longer raise) — opted into at MATERIALIZE time, where
    // the poison classification (`_geo_valid`) is produced.
    locally {
      var changed = false
      def injected(dm: Map[String, JValue]): Option[JValue] = {
        if (dm.contains("envelope_fields")) return None
        val dsType = dm.get("type") match {
          case Some(JString(t)) => t
          case _ => return None
        }
        val (kind, fieldKey) = dsType match {
          case "polygon" if dm.contains("rings_field") => ("rings", "rings_field")
          case "polygon"            => ("polygon", "ring_field")
          case "multipolygon"       => ("polys", "polys_field")
          case "linestring"         => ("linestring", "line_field")
          case "multilinestring"    => ("multilinestring", "lines_field")
          case "multipoint"         => ("multipoint", "points_field")
          case "geometrycollection" => ("geometrycollection", "shapes_field")
          case _                    => return None
        }
        val gf = dm.get(fieldKey) match {
          case Some(JString(s)) => s
          case _ => return None
        }
        val md = table.schema.find(_.name == gf).map(_.metadata)
          .getOrElse(return None)
        if (!md.contains("graft.geo.docKind") ||
            md.getString("graft.geo.docKind") != kind ||
            !md.contains("graft.geo.cap") ||
            md.getLong("graft.geo.cap") != graft.plans.GeoWalk.DefaultCap.toLong)
          return None
        val corners = md.getStringArray("graft.geo.corners").toSeq
        if (corners.length != 4 || !corners.forall(table.columns.contains))
          return None
        changed = true
        Some(JObject((dm + ("envelope_fields" ->
          JArray(corners.map(JString(_)).toList))).toList))
      }
      def walk(v: JValue): JValue = v match {
        case JObject(fields) => JObject(fields.map {
          case ("geo_shape", JObject(gparts)) =>
            ("geo_shape", JObject(gparts.map {
              case ("doc_shape", JObject(dparts)) =>
                ("doc_shape", injected(dparts.toMap)
                  .getOrElse(JObject(dparts)))
              case other => other
            }))
          case (k, v2) => (k, walk(v2))
        })
        case JArray(vs) => JArray(vs.map(walk))
        case other      => other
      }
      val walked = Seq("query", "post_filter", "rescore").foldLeft(req) {
        (r, s) => r.get(s).fold(r)(v => r.updated(s, walk(v)))
      }
      if (changed) return search(table, render(JObject(walked.toList)))
    }

    // `explain` flag: per-hit score decomposition riding the hit table
    // as part_* columns (the _explain endpoint's contract, inline)
    val explainOn: Boolean = req.get("explain") match {
      case None           => false
      case Some(JBool(b)) => b
      case Some(other)    => fail(s"explain must be a boolean: ${render(other)}")
    }

    // `track_total_hits`: validated, behaviorally a no-op BY DESIGN —
    // the engine has no response-metadata surface to cap (hit counts
    // come exact from `_count`/`_msearch`), so there is no 10k default
    // to lift. Accepting the key keeps real request bodies replayable;
    // a non-bool/int shape still fails loud.
    req.get("track_total_hits").foreach {
      case JBool(_)           => ()
      case JInt(n) if n > 0   => ()
      case other => fail(s"track_total_hits must be a boolean or a " +
        s"positive integer: ${render(other)}")
    }

    // `track_scores`: validated, behaviorally a no-op BY DESIGN — in
    // OpenSearch a field sort skips scoring unless this opts back in;
    // here the score is an ordinary column of the hit table, always
    // computed, always addressable (`_source: ["score"]`, `_score`
    // sort) whatever the sort. Accepting the key keeps real request
    // bodies replayable; a non-bool shape still fails loud.
    req.get("track_scores").foreach {
      case JBool(_) => ()
      case other    => fail(s"track_scores must be a boolean: ${render(other)}")
    }

    // `runtime_mappings`: request-level computed fields through the
    // SAME ScoreScript compiler as script_score/script_fields — each
    // compiles ONCE on the driver to a codegen'd Catalyst column laid
    // onto the TABLE, so every downstream surface (query clauses,
    // aggs, sort, _source, even a knn filter) sees the field like a
    // stored one. Integer `long` type only (the exact script model);
    // `_score` does not exist before scoring — fail loud, never bind
    // it to a silent zero. One recursion with the section stripped
    // keeps the rest of the compiler untouched.
    req.get("runtime_mappings").foreach { rmv =>
      val rm = rmv match {
        case JObject(s) if s.nonEmpty => s
        case JObject(_) => fail("runtime_mappings must define at least one field")
        case other => fail(s"runtime_mappings must be an object: ${render(other)}")
      }
      val mapped = rm.foldLeft(table) { case (df, (fname, fspec)) =>
        if (df.columns.contains(fname))
          fail(s"runtime_mappings '$fname' collides with an existing column")
        val body = fspec match {
          case JObject(b) => b.toMap
          case other => fail(s"runtime_mappings '$fname' must be an object: ${render(other)}")
        }
        body.keySet.diff(Set("type", "script")).foreach(k =>
          fail(s"unsupported runtime_mappings option '$k' in '$fname'"))
        strOpt(body, "type") match {
          case Some("long") => ()
          case Some(other)  => fail(s"runtime_mappings '$fname' type must be " +
            s"'long' (the exact integer script model), got '$other'")
          case None => fail(s"runtime_mappings '$fname' needs a type")
        }
        val (src, params) = body.get("script") match {
          case Some(JObject(s)) =>
            val sm = s.toMap
            sm.keySet.diff(Set("source", "params")).foreach(k =>
              fail(s"unsupported script option '$k' in runtime_mappings '$fname'"))
            val source = strOpt(sm, "source")
              .getOrElse(fail(s"runtime_mappings '$fname' needs a script source"))
            val ps: Map[String, Long] = sm.get("params") match {
              case Some(JObject(po)) => po.map {
                case (k, JInt(v)) => k -> v.toLong
                case (k, other) =>
                  fail(s"script param '$k' must be an integer: ${render(other)}")
              }.toMap
              case None        => Map.empty
              case Some(other) => fail(s"script params must be an object: ${render(other)}")
            }
            (source, ps)
          case _ => fail(s"runtime_mappings '$fname' needs {script: {source}}")
        }
        if (src.contains("_score"))
          fail(s"runtime_mappings '$fname' cannot reference _score " +
            "(runtime fields evaluate before scoring)")
        df.withColumn(fname, ScoreScript.compile(src, params, lit(0L)))
      }
      return search(mapped, render(JObject((req - "runtime_mappings").toList)))
    }

    // `knn` requests return the ranked neighbor table; the ranking IS
    // the contract, so no other request section composes with it.
    req.get("knn").foreach { kn =>
      if (req.size > 1) fail("knn must be the only request section")
      return knnRequest(table, kn)
    }

    // `suggest` requests return the suggestion table (the OpenSearch
    // response's suggest section as rows); combining with a query is
    // out of scope — fail loud rather than silently ignoring one.
    req.get("suggest").foreach { sugg =>
      if (req.size > 1) fail("suggest must be the only request section")
      return suggestRequest(table, sugg)
    }

    // `more_like_this` is corpus-state-dependent (the seed's tf·idf
    // terms come from the table), so it compiles at the REQUEST level
    // into the q118 postings plan rather than to a per-row predicate.
    req.get("query") match {
      case Some(JObject(List(("more_like_this", body)))) =>
        if (req.contains("aggs"))
          fail("more_like_this cannot be combined with aggs")
        // fail-loud, not silently-dropped: the hit table these produce
        // has no text column for the highlighter to anchor on
        if (req.contains("highlight"))
          fail("highlight cannot be combined with more_like_this")
        if (req.contains("collapse"))
          fail("collapse cannot be combined with more_like_this")
        if (req.contains("min_score"))
          fail("min_score cannot be combined with more_like_this")
        if (req.contains("script_fields"))
          fail("script_fields cannot be combined with more_like_this")
        return hitPipeline(moreLikeThisRequest(table, body), req)
      case Some(JObject(List(("span_near", body)))) =>
        if (req.contains("aggs"))
          fail("span_near cannot be combined with aggs")
        if (req.contains("highlight"))
          fail("highlight cannot be combined with span_near")
        if (req.contains("collapse"))
          fail("collapse cannot be combined with span_near")
        if (req.contains("min_score"))
          fail("min_score cannot be combined with span_near")
        if (req.contains("script_fields"))
          fail("script_fields cannot be combined with span_near")
        return hitPipeline(spanNearRequest(table, body), req)
      case Some(JObject(List(("percolate", body)))) =>
        Seq("aggs", "highlight", "collapse", "min_score", "script_fields")
          .filter(req.contains).foreach(k =>
            fail(s"$k cannot be combined with percolate"))
        return hitPipeline(percolateRequest(table, body), req)
      case Some(JObject(List(("intervals", body)))) =>
        Seq("aggs", "highlight", "collapse", "min_score", "script_fields")
          .filter(req.contains).foreach(k =>
            fail(s"$k cannot be combined with intervals"))
        return hitPipeline(intervalsRequest(table, body), req)
      case Some(JObject(List(("span_or", body)))) =>
        Seq("aggs", "highlight", "collapse", "min_score", "script_fields")
          .filter(req.contains).foreach(k =>
            fail(s"$k cannot be combined with span_or"))
        return hitPipeline(spanOrRequest(table, body), req)
      case Some(JObject(List(("span_not", body)))) =>
        Seq("aggs", "highlight", "collapse", "min_score", "script_fields")
          .filter(req.contains).foreach(k =>
            fail(s"$k cannot be combined with span_not"))
        return hitPipeline(spanNotRequest(table, body), req)
      case Some(JObject(List(("span_multi", body)))) =>
        Seq("aggs", "highlight", "collapse", "min_score", "script_fields")
          .filter(req.contains).foreach(k =>
            fail(s"$k cannot be combined with span_multi"))
        return hitPipeline(spanMultiRequest(table, body), req)
      case Some(JObject(List(("hybrid", body)))) =>
        Seq("aggs", "highlight", "collapse", "min_score", "script_fields")
          .filter(req.contains).foreach(k =>
            fail(s"$k cannot be combined with hybrid"))
        return hitPipeline(hybridRequest(table, body), req)
      case Some(JObject(List(("span_containing", body)))) =>
        Seq("aggs", "highlight", "collapse", "min_score", "script_fields")
          .filter(req.contains).foreach(k =>
            fail(s"$k cannot be combined with span_containing"))
        return hitPipeline(spanContainRequest(table, body, within = false), req)
      case Some(JObject(List(("span_within", body)))) =>
        Seq("aggs", "highlight", "collapse", "min_score", "script_fields")
          .filter(req.contains).foreach(k =>
            fail(s"$k cannot be combined with span_within"))
        return hitPipeline(spanContainRequest(table, body, within = true), req)
      // the join-field relations model: corpus-state-dependent (the
      // matching set comes from OTHER rows of the table), so these
      // compile at the REQUEST level into the equi-join the engine
      // already owns, not to a per-row predicate
      case Some(JObject(List(("nested", body @ JObject(parts)))))
        if parts.exists(_._1 == "inner_hits") =>
        Seq("aggs", "highlight", "collapse", "min_score", "script_fields")
          .filter(req.contains).foreach(k =>
            fail(s"$k cannot be combined with nested inner_hits"))
        return hitPipeline(nestedInnerHitsRequest(table, body), req)
      case Some(JObject(List(("has_child", body)))) =>
        Seq("aggs", "highlight", "collapse", "min_score", "script_fields")
          .filter(req.contains).foreach(k =>
            fail(s"$k cannot be combined with has_child"))
        return hitPipeline(hasChildRequest(table, body), req)
      case Some(JObject(List(("has_parent", body)))) =>
        Seq("aggs", "highlight", "collapse", "min_score", "script_fields")
          .filter(req.contains).foreach(k =>
            fail(s"$k cannot be combined with has_parent"))
        return hitPipeline(hasParentRequest(table, body), req)
      case _ => ()
    }

    // `min_score`: drop hits scoring under the floor (the OpenSearch
    // relevance cutoff). The engine's scores are exact LONGs, so the
    // floor is an integer — a float floor would reintroduce the tie
    // ambiguity the integer model exists to kill. Applies to the hit
    // path only (with aggs the foreground set is the query's, fail
    // loud rather than silently re-defining it).
    val minScore: Option[Long] = req.get("min_score").map {
      case JInt(ms) => ms.toLong
      case other    => fail(s"min_score must be an integer: ${render(other)}")
    }
    minScore.foreach { _ =>
      if (req.contains("aggs")) fail("min_score applies to hits, not aggs")
      if (!req.contains("query")) fail("min_score requires a query")
    }

    val compiled = req.get("query").map(compileQuery)
      .getOrElse(CompiledQuery(lit(true), lit(0L)))
    // `_name` bookkeeping: names must be unique request-wide (two
    // clauses sharing one would make matched_queries ambiguous)
    val dupNames = compiled.named.groupBy(_._1)
      .collect { case (n, ps) if ps.size > 1 => n }.toSeq.sorted
    if (dupNames.nonEmpty)
      fail(s"duplicate _name(s): ${dupNames.mkString(", ")}")
    val filtered = table.filter(compiled.pred)

    req.get("aggs") match {
      case Some(aggs) =>
        if (req.contains("highlight")) fail("highlight applies to hits, not aggs")
        if (req.contains("search_after"))
          fail("search_after applies to hits, not aggs")
        if (req.contains("collapse")) fail("collapse applies to hits, not aggs")
        if (req.contains("script_fields"))
          fail("script_fields applies to hits, not aggs")
        if (req.contains("rescore"))
          fail("rescore applies to hits, not aggs")
        // `size: 0` is THE OpenSearch aggs-only request shape —
        // accepted (and meaningless here, since the agg table is the
        // whole answer). Any other hits-arm key would be SILENTLY
        // ignored (the engine returns one table per request, so
        // hits+aggs cannot both come back) — fail loud instead.
        req.get("size") match {
          case None => ()
          case Some(JInt(n)) if n == 0 => ()
          case Some(JInt(n)) => fail(s"aggs requests return the agg table " +
            s"only - size must be 0 or absent, got $n (run the hits " +
            "request separately)")
          case Some(other) => fail(s"size must be an integer: ${render(other)}")
        }
        Seq("from", "sort", "_source", "fields", "docvalue_fields")
          .filter(req.contains).foreach(k =>
          fail(s"$k applies to hits, not aggs (an aggs request returns " +
            "the agg table only)"))
        // OpenSearch's post_filter exists precisely to NOT affect
        // aggs; here the agg table IS the whole answer, so the
        // section would be a silent no-op — fail loud instead
        if (req.contains("post_filter"))
          fail("post_filter applies to hits, not aggs (aggs see the " +
            "query set by design - run the hits request separately)")
        if (explainOn)
          fail("explain applies to hits, not aggs")
        // hits carry the computed score so a top_hits sort on _score
        // (the OpenSearch default ranking) resolves
        compileAggs(table, filtered.withColumn("score", compiled.score),
          compiled.pred, aggs)
      case None =>
        // per-hit matched-clause attribution: a stringified SORTED
        // name list (alphabetical — deterministic, and never a bare
        // array column), "" when no named clause matched. Pure
        // codegen: one when() per name inside array_compact/sort.
        val scored1 = filtered.withColumn("score", compiled.score)
        val scored0 =
          if (compiled.named.isEmpty) scored1
          else scored1.withColumn("matched_queries",
            concat_ws(",", array_sort(array_compact(array(
              compiled.named.map { case (n, p) => when(p, lit(n)) }: _*)))))
        val scored1m = minScore match {
          case None     => scored0
          case Some(ms) => scored0.filter(col("score") >= lit(ms))
        }
        // `explain` flag: the part_* columns land on the hit table
        // itself — one projection over the same filtered scan, the
        // _explain endpoint inline. A rescored score is no longer a
        // sum of query parts, so the combination fails loud.
        val scoredX =
          if (!explainOn) scored1m
          else {
            if (req.contains("rescore"))
              fail("explain cannot be combined with rescore (the " +
                "second-pass score is not a sum of query parts)")
            val qj = req.getOrElse("query", fail("explain requires a query"))
            scoreParts(qj, compiled).foldLeft(scored1m) {
              case (df, (n, c)) => df.withColumn(s"part_$n", c)
            }
          }
        // `rescore`: second-pass re-ranking of the top window (the
        // expensive-query-on-a-cheap-shortlist idiom) — rewrites the
        // score column only; sort/from/size downstream are untouched
        val scoredR = req.get("rescore") match {
          case None    => scoredX
          case Some(r) => withRescore(scoredX, r, compiled.ppm)
        }
        // `script_fields`: computed per-hit output columns through the
        // SAME ScoreScript compiler as script_score/scripted_metric —
        // the Painless-shaped integer expression compiles ONCE on the
        // driver to codegen'd Catalyst arithmetic (zero row-time
        // interpretation, the anti-UDF rule on this surface too).
        // `_score` refers to the request's computed score; the new
        // column is visible to `sort` and `_source` (a sortable
        // derived key, which OpenSearch itself cannot do here).
        val scored = req.get("script_fields") match {
          case None => scoredR
          case Some(JObject(sf)) =>
            if (sf.isEmpty) fail("script_fields must name at least one field")
            sf.foldLeft(scoredR) { case (df, (fname, fspec)) =>
              if (df.columns.contains(fname))
                fail(s"script_fields '$fname' collides with an existing column")
              val (src, params) = fspec match {
                case JObject(List(("script", JObject(s)))) =>
                  val sm = s.toMap
                  sm.keySet.diff(Set("source", "params")).foreach(k =>
                    fail(s"unsupported script option '$k' in script_fields '$fname'"))
                  val source = strOpt(sm, "source")
                    .getOrElse(fail(s"script_fields '$fname' needs a source"))
                  val ps: Map[String, Long] = sm.get("params") match {
                    case Some(JObject(po)) => po.map {
                      case (k, JInt(v)) => k -> v.toLong
                      case (k, other) =>
                        fail(s"script param '$k' must be an integer: ${render(other)}")
                    }.toMap
                    case None        => Map.empty
                    case Some(other) => fail(s"script params must be an object: ${render(other)}")
                  }
                  (source, ps)
                case _ => fail(s"script_fields '$fname' needs {script: {source, params?}}")
              }
              df.withColumn(fname, ScoreScript.compile(src, params, col("score")))
            }
          case Some(other) => fail(s"script_fields must be an object: ${render(other)}")
        }
        val lit0 = req.get("highlight") match {
          case None    => scored
          case Some(h) => withHighlight(scored, req.getOrElse("query",
            fail("highlight requires a query")), h)
        }
        // post_filter applies BEFORE collapse (the OpenSearch phase
        // order): a collapse group whose best representative is
        // post-filtered away must collapse to its best SURVIVING hit,
        // not disappear — so the filter runs here, and the key is
        // stripped before hitPipeline (whose own post_filter handling
        // serves the request-level query paths, which reject collapse)
        val postFiltered = req.get("post_filter") match {
          case None     => lit0
          case Some(pf) =>
            val c = compileQuery(pf)
            if (c.named.nonEmpty)
              fail("_name inside post_filter is unsupported " +
                "(matched_queries reflects the query's named clauses only)")
            lit0.filter(c.pred)
        }
        val collapsed = req.get("collapse") match {
          case None    => postFiltered
          case Some(c) => withCollapse(postFiltered, c, req)
        }
        // explain/post_filter were materialized above — strip them so
        // hitPipeline's handling only fires for the request-level
        // query paths
        hitPipeline(collapsed, req - "explain" - "post_filter")
    }
  }

  /** `collapse` request section: one hit per distinct value of the
    * collapse field — the result-dedup feature (one hit per domain,
    * per user, per near-dup canonical id). The representative per key
    * is the FIRST hit in the request's sort order (which must be
    * explicit and, for determinism, total); `inner_hits: {size: N}`
    * keeps the top N per key instead and exposes their 1-based
    * `collapse_rank`. One window over the hit set bounded by group
    * size — never a self-join, never a global pre-sort: the q94
    * canonical-selection shape applied to the hit list.
    */
  private[search] def withCollapse(hits: DataFrame, c: JValue,
      req: Map[String, JValue]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = c match {
      case JObject(s) => s.toMap
      case other      => fail(s"collapse must be an object: ${render(other)}")
    }
    m.keySet.diff(Set("field", "inner_hits")).foreach(k =>
      fail(s"unsupported collapse option '$k'"))
    val f = strOpt(m, "field").getOrElse(fail("collapse requires a field"))
    val innerSize = m.get("inner_hits") match {
      case None => None
      case Some(JObject(ih)) =>
        val im = ih.toMap
        im.keySet.diff(Set("size")).foreach(k =>
          fail(s"unsupported inner_hits option '$k'"))
        Some(intOpt(im, "size").getOrElse(fail("inner_hits requires a size")))
      case Some(other) => fail(s"inner_hits must be an object: ${render(other)}")
    }
    innerSize.foreach(n => if (n < 1) fail("inner_hits size must be >= 1"))
    if (req.contains("search_after"))
      fail("collapse cannot be combined with search_after")
    val sortSpec = req.get("sort")
      .getOrElse(fail("collapse requires an explicit sort (it picks each " +
        "group's representative)"))
    val w = Window.partitionBy(col(f)).orderBy(sortCols(sortSpec): _*)
    val ranked = hits.withColumn("collapse_rank",
      row_number().over(w).cast("long"))
    innerSize match {
      case None    => ranked.filter(col("collapse_rank") === 1L).drop("collapse_rank")
      case Some(n) => ranked.filter(col("collapse_rank") <= n)
    }
  }

  /** `rescore` request section: re-rank the top `window_size` hits
    * with a second query, combining scores as
    * `query_weight·orig (op) rescore_query_weight·rescore` for window
    * docs matching the rescore query, `query_weight·orig` for window
    * docs that don't, and the UNTOUCHED original score outside the
    * window (the OpenSearch contract). The window is a global top-k
    * on (score desc, id asc) — a TakeOrderedAndProject plan
    * (per-partition heads merged, never a full sort), so the rescore
    * query evaluates on a BOUNDED table regardless of corpus size;
    * hits outside the window anti-join against the broadcast window
    * id set. `id_field` is required: it makes the window boundary a
    * total order (OpenSearch breaks score ties by internal doc order,
    * which no other engine can replay). Integer weights and
    * integer-combining score modes only (`avg` would be fractional
    * under the exact score model); ppm-scaled sides fail loud — a
    * weighted sum across score scales would silently mis-rank.
    */
  private[search] def withRescore(hits: DataFrame, spec: JValue,
      origPpm: Boolean): DataFrame = {
    val m = spec match {
      case JObject(s) => s.toMap
      case other      => fail(s"rescore must be an object: ${render(other)}")
    }
    m.keySet.diff(Set("window_size", "id_field", "query")).foreach(k =>
      fail(s"unsupported rescore option '$k'"))
    val window = intOpt(m, "window_size").getOrElse(10)
    if (window < 1 || window > 100000)
      fail(s"rescore window_size must be 1-100000, got $window")
    val idField = strOpt(m, "id_field")
      .getOrElse(fail("rescore requires id_field (the total tie-break " +
        "that makes the window boundary deterministic)"))
    if (!hits.columns.contains(idField))
      fail(s"rescore id_field '$idField' does not exist")
    val qm = m.get("query") match {
      case Some(JObject(q)) => q.toMap
      case _ => fail("rescore requires query: {rescore_query, ...}")
    }
    qm.keySet.diff(Set("rescore_query", "query_weight",
      "rescore_query_weight", "score_mode")).foreach(k =>
      fail(s"unsupported rescore query option '$k'"))
    val rc = compileQuery(qm.getOrElse("rescore_query",
      fail("rescore needs a rescore_query")))
    if (origPpm || rc.ppm)
      fail("rescore cannot combine ppm-scaled scores (the weighted sum " +
        "would cross scales) - use integer-scored clauses on both sides")
    val qw = intOpt(qm, "query_weight").getOrElse(1)
    val rw = intOpt(qm, "rescore_query_weight").getOrElse(1)
    if (qw < 0 || rw < 0)
      fail("rescore weights must be non-negative integers")
    val top = hits.orderBy(col("score").desc, col(idField).asc).limit(window)
    val qs = lit(qw.toLong) * col("score")
    val rs = lit(rw.toLong) * rc.score
    val combined = strOpt(qm, "score_mode").getOrElse("total") match {
      case "total"    => qs + rs
      case "multiply" => qs * rs
      case "max"      => greatest(qs, rs)
      case "min"      => least(qs, rs)
      case "avg"      => fail("rescore score_mode avg is fractional under " +
        "the exact integer score model - use total with scaled weights")
      case other =>
        fail(s"rescore score_mode must be total|multiply|max|min, got '$other'")
    }
    val rescored = top.withColumn("score",
      when(rc.pred, combined).otherwise(qs))
    val rest = hits.join(
      broadcast(top.select(col(idField).as("__rs_id"))),
      col(idField) === col("__rs_id"), "left_anti")
    rescored.unionByName(rest)
  }

  /** `percolate` request-level query — reverse search (the q98
    * contract): a registry of stored queries is matched against every
    * document, answering "which saved searches does each document
    * trigger". The registry rides INLINE in the request (`queries`:
    * an array of `{id, query}` with each `query` a full DSL clause) —
    * stored-query registries are tiny by nature, so each entry
    * compiles to a predicate evaluated map-side per document: pure
    * codegen, no join at all (cheaper than even a broadcast join),
    * scaling with corpus size alone. Output: one row per (document,
    * matched query) — `id_field`, `qid` — ranking/paging from the
    * surrounding request.
    */
  private[search] def percolateRequest(table: DataFrame, body: JValue): DataFrame =
    body match {
      case JObject(parts) =>
        val m = parts.toMap
        m.keySet.diff(Set("id_field", "queries")).foreach(k =>
          fail(s"unsupported percolate option '$k'"))
        val idField = strOpt(m, "id_field")
          .getOrElse(fail("percolate requires id_field (the document key)"))
        val stored: Seq[(Long, Column)] = m.get("queries") match {
          case Some(JArray(qs)) if qs.nonEmpty => qs.map {
            case JObject(qparts) =>
              val qm = qparts.toMap
              qm.keySet.diff(Set("id", "query")).foreach(k =>
                fail(s"unsupported percolate query option '$k'"))
              val qid = qm.get("id") match {
                case Some(JInt(i)) => i.toLong
                case _ => fail("percolate queries need an integer id")
              }
              val q = qm.getOrElse("query", fail(s"percolate query $qid needs a query"))
              (qid, compileQuery(q).pred)
            case other => fail(s"percolate queries must be objects: ${render(other)}")
          }
          case _ => fail("percolate requires a non-empty queries array")
        }
        val ids = stored.map(_._1)
        if (ids.distinct.size != ids.size) fail("percolate query ids must be unique")
        val hits = array_compact(array(stored.map { case (qid, pred) =>
          when(pred, lit(qid))
        }: _*))
        table.select(col(idField), explode(hits).as("qid"))
      case other => fail(s"percolate requires an object body: ${render(other)}")
    }

  /** `highlight` section: per requested field, a column carrying up to
    * `number_of_fragments` (default 1) `fragment_size`-char fragments,
    * each anchored 20 chars before one raw-substring occurrence of the
    * field's query term, occurrences inside each fragment wrapped in
    * `pre_tags`/`post_tags`, fragments joined with `" ... "` (the
    * OpenSearch response ships them as an array; the engine's
    * no-bare-array rule stringifies). ONE requested field keeps the
    * historical `highlight` column name (the q46/q166 contract,
    * byte-identical); several fields emit `highlight_<field>` each.
    *
    * Deterministic subset: each highlighted field must be targeted by
    * exactly one `term`, single-token `match`, or `match_phrase`
    * clause — at the query's top level or directly inside a `bool`
    * section (multi-term anchor choice is ranking-dependent in
    * OpenSearch and out of scope, fail-loud; so are analyzed clauses —
    * their object bodies are outside the accepted shapes). Rows not
    * containing the literal get a NULL highlight for that field.
    *
    * Anchoring contract: fragments anchor at the RAW SUBSTRING
    * occurrences of the query literal in order (non-overlapping, via
    * split) — for a `match_phrase` the first may be a
    * non-token-boundary occurrence earlier than the boundary match
    * ("metadata window … data window" anchors at "metadata window").
    * Deliberate, documented divergence shared with the oracle, so the
    * contract is cross-engine stable.
    */
  private[search] def withHighlight(hits: DataFrame, query: JValue, h: JValue): DataFrame = {
    val hm = h match {
      case JObject(s) => s.toMap
      case other => fail(s"highlight must be an object: ${render(other)}")
    }
    hm.keySet.diff(Set("fields", "pre_tags", "post_tags")).foreach(k =>
      fail(s"unsupported highlight option '$k'"))
    val fields: Seq[(String, Map[String, JValue])] = hm.get("fields") match {
      case Some(JObject(fs)) if fs.nonEmpty => fs.map {
        case (field, JObject(o)) => (field, o.toMap)
        case (field, other) =>
          fail(s"highlight field '$field' options must be an object: ${render(other)}")
      }
      case _ => fail("highlight requires fields: {field: {options}, ...}")
    }
    if (fields.map(_._1).distinct.size != fields.size)
      fail("highlight repeats a field")
    def tag(key: String, default: String): String = hm.get(key) match {
      case Some(JArray(List(JString(t)))) => t
      case None                           => default
      case Some(other) => fail(s"$key must be a one-string array: ${render(other)}")
    }
    val (pre, post) = (tag("pre_tags", "<em>"), tag("post_tags", "</em>"))
    // the term each clause shape anchors on. String bodies anchor on
    // the raw literal (the historical contract). An OBJECT-bodied
    // `match` carrying an analyzer (r15, VERDICT r14 #5 — the everyday
    // Kibana view) anchors on the ANALYZED single token through the
    // same Analyzer twin the clause compiled with: fragments stay on
    // the RAW text, occurrences are located case-insensitively at
    // token boundaries (the standard analyzer's raw occurrences have
    // exactly the token's length — ASCII case fold is
    // length-preserving, so the existing prefix-sum machinery applies
    // on a `translate`-folded copy). `english` keeps the fail-loud: a
    // stemmed anchor ("run") has no fixed-length raw occurrence
    // ("Running"), so its offsets are not twin-replayable.
    def leafTerm(q: JValue): Option[(String, String, Option[String])] = q match {
      case JObject(List(("term", JObject(List((tf, JString(v))))))) =>
        Some((tf, v, None))
      case JObject(List(("match_phrase", JObject(List((tf, JString(v))))))) =>
        Some((tf, v.trim, None))
      case JObject(List(("match", JObject(List((tf, JString(v))))))) =>
        val toks = v.trim.split("\\s+")
        if (toks.length != 1)
          fail("highlight supports single-token match queries (multi-term " +
            "anchor choice is ranking-dependent)")
        Some((tf, toks.head, None))
      case JObject(List(("match", JObject(List((tf, JObject(body0))))))) =>
        val body = body0.toMap
        // other match options (fuzziness, operator, ...) keep the
        // fail-loud — their anchor semantics are ranking-dependent
        if (body.keySet != Set("query", "analyzer")) None
        else {
          val an = analyzerOpt(body, s"highlight match on '$tf'")
          val q0 = strOpt(body, "query")
            .getOrElse(fail(s"highlight match on '$tf' needs a string query"))
          an match {
            case Analyzer.Whitespace =>
              val toks = q0.trim.split("\\s+")
              if (toks.length != 1)
                fail("highlight supports single-token match queries " +
                  "(multi-term anchor choice is ranking-dependent)")
              Some((tf, toks.head, None))
            case Analyzer.Standard =>
              val toks = an.normText(q0).split(" ").filter(_.nonEmpty)
              if (toks.length != 1)
                fail("highlight supports single-token match queries " +
                  "(multi-term anchor choice is ranking-dependent)")
              Some((tf, toks.head, Some("standard")))
            case Analyzer.English =>
              // the anchor is the query token's STEM (r16, VERDICT r15
              // #2 — demoting the everyday fail-loud): raw occurrences
              // have no fixed length ("Running" for stem "run"), so the
              // english arm walks raw TOKEN boundaries and wraps tokens
              // whose own EnglishFold stem equals it (see the token-walk
              // machinery below). A query folding to nothing (a stop
              // word) has no anchorable stem — fail loud, not NULL rows.
              val toks = an.normText(q0).split(" ").filter(_.nonEmpty)
              if (toks.isEmpty)
                fail(s"highlight match on '$tf': the query '$q0' folds " +
                  "to nothing under the english analyzer (a stop word " +
                  "anchors no fragment)")
              if (toks.length != 1)
                fail("highlight supports single-token match queries " +
                  "(multi-term anchor choice is ranking-dependent)")
              Some((tf, toks.head, Some("english")))
            case other =>
              fail(s"highlight with the '${other.name}' analyzer is " +
                "unsupported")
          }
        }
      case _ => None
    }
    val leaves: Seq[(String, String, Option[String])] = leafTerm(query) match {
      case Some(l) => Seq(l)
      case None => query match {
        case JObject(List(("bool", JObject(sections)))) => sections.flatMap {
          case (k, JArray(cs)) if Set("must", "filter", "should")(k) =>
            cs.flatMap(leafTerm)
          case (k, o: JObject) if Set("must", "filter", "should")(k) =>
            leafTerm(o).toSeq
          case _ => Nil
        }
        case _ => Nil
      }
    }
    fields.foldLeft(hits) { case (df, (f, opts)) =>
      opts.keySet.diff(Set("fragment_size", "number_of_fragments")).foreach(k =>
        fail(s"unsupported highlight field option '$k'"))
      val fragSize = intOpt(opts, "fragment_size").getOrElse(60)
      val nFrags = intOpt(opts, "number_of_fragments").getOrElse(1)
      if (nFrags < 1) fail("highlight number_of_fragments must be >= 1")
      val (term, analyzed) = leaves.filter(_._1 == f) match {
        case Seq((_, t, a)) => (t, a)
        case Seq() =>
          fail("highlight requires a term / single-token match / match_phrase " +
            s"query on the highlighted field '$f', got: ${render(query)}")
        case _ => fail(s"highlight field '$f' is targeted by several clauses " +
          "(the anchor would be ambiguous)")
      }
      if (term.isEmpty) fail(s"highlight on '$f' has an empty query term")
      if (analyzed.contains("english")) {
        // ENGLISH arm (r16, VERDICT r15 #2): anchors are RAW TOKENS
        // whose EnglishFold stem equals the query stem — their raw
        // lengths vary ("Running", "runs" for stem "run"), so instead
        // of the fixed-length prefix-sum the walk reconstructs every
        // token's raw position from the token/separator interleave:
        //   toks = the alnum runs, seps = the complementary split
        //   (size(seps) = #runs + 1; raw = s1 t1 s2 t2 … s(n+1))
        // and one aggregate() accumulates (position, length) for the
        // stem-matching tokens. Fragments stay on the RAW text (the
        // q399 contract): anchored 20 chars before a matched token,
        // `fragment_size` raw chars, and every matched token FULLY
        // inside the window is wrapped keeping its casing — a token
        // cut at the window edge stays unwrapped (pinned divergence
        // from the standard arm's regex, whose end-of-fragment counts
        // as a boundary; a cut stem-match is unverifiable). All
        // codegen'd HOFs around the EnglishFold kernel — no UDF, no
        // extra scan; DuckDB replays the same walk with window-function
        // prefix sums over the unnested tokens.
        //
        // The split results and the walk are MATERIALIZED into working
        // columns first (one Project each): Catalyst does no common-
        // subexpression elimination ACROSS higher-order-function
        // lambda boundaries, so referencing the split expression from
        // every `element_at` site re-runs the regex split PER TOKEN —
        // O(len × tokens) per row, measured as every executor thread
        // parked in java.util.regex at the 100× battery. CollapseProject
        // keeps non-cheap multi-referenced aliases materialized, so
        // each evaluates exactly once per row.
        val raw = col(f)
        Seq("__hl_toks", "__hl_seps", "__hl_m").foreach { c =>
          if (df.columns.contains(c))
            fail(s"highlight on '$f' needs the working column '$c' but " +
              "the table already carries one - rename it")
        }
        val toks = col("__hl_toks")
        val seps = col("__hl_seps")
        // sequence(1, 0) DESCENDS — guard the token-free row
        val idxArr = when(size(toks) === 0, array().cast("array<int>"))
          .otherwise(sequence(lit(1), size(toks)))
        val emptyMs = array().cast("array<struct<p:int,l:int>>")
        val matchedExpr = aggregate(
          idxArr,
          struct(lit(1).as("cur"), emptyMs.as("ms")),
          (acc, i) => {
            val t = element_at(toks, i)
            val start = acc.getField("cur") + length(element_at(seps, i))
            struct(
              (start + length(t)).as("cur"),
              when(graft.plans.EnglishFold(t) === lit(term),
                concat(acc.getField("ms"),
                  array(struct(start.as("p"), length(t).as("l")))))
                .otherwise(acc.getField("ms")).as("ms"))
          },
          acc => acc.getField("ms"))
        val matched = col("__hl_m")
        val anchors = slice(transform(matched, m => m.getField("p")),
          lit(1), lit(nFrags))
        val frags = transform(anchors, p => {
          val fragStart = greatest(p - 20, lit(1))
          val lastChar = least(fragStart + lit(fragSize) - 1, length(raw))
          val inWin = filter(matched, m =>
            m.getField("p") >= fragStart &&
              m.getField("p") + m.getField("l") - 1 <= lastChar)
          aggregate(inWin,
            struct(fragStart.as("cur"), lit("").as("acc")),
            (a, m) => struct(
              (m.getField("p") + m.getField("l")).as("cur"),
              concat(a.getField("acc"),
                raw.substr(a.getField("cur"),
                  m.getField("p") - a.getField("cur")),
                lit(pre),
                raw.substr(m.getField("p"), m.getField("l")),
                lit(post)).as("acc")),
            a => concat(a.getField("acc"),
              raw.substr(a.getField("cur"),
                lastChar - a.getField("cur") + 1)))
        })
        val out = if (fields.size == 1) "highlight" else s"highlight_$f"
        df.withColumn("__hl_toks",
            filter(split(raw, "[^A-Za-z0-9]+", -1), t => t =!= ""))
          .withColumn("__hl_seps", split(raw, "[A-Za-z0-9]+", -1))
          .withColumn("__hl_m", matchedExpr)
          .withColumn(out, when(size(matched) > 0, concat_ws(" ... ", frags)))
          .drop("__hl_toks", "__hl_seps", "__hl_m")
      } else {
      // occurrence start positions (1-based), non-overlapping, in text
      // order: split on the quoted literal, prefix-sum the part lengths
      // — pure codegen'd higher-order functions, no UDF, no extra scan.
      // The analyzed arm splits a TRANSLATE-folded copy (A-Z → a-z:
      // length-preserving by construction, unlike lower() on unicode),
      // so the same prefix-sum yields raw positions; boundary-interior
      // matches ("spark" inside "sparkle") are filtered by the raw
      // neighbor characters.
      val tq = java.util.regex.Pattern.quote(term)
      val haystack = if (analyzed.isDefined)
        translate(col(f), ('A' to 'Z').mkString, ('a' to 'z').mkString)
      else col(f)
      val parts = split(haystack, tq, -1)
      val occAll = aggregate(
        slice(parts, lit(1), size(parts) - 1),
        struct(lit(1).as("cur"), array().cast("array<int>").as("ps")),
        (acc, part) => struct(
          (acc.getField("cur") + length(part) + lit(term.length)).as("cur"),
          concat(acc.getField("ps"),
            array(acc.getField("cur") + length(part))).as("ps")),
        acc => acc.getField("ps"))
      val occ = if (analyzed.isEmpty) occAll else
        filter(occAll, p => {
          val before = col(f).substr(p - 1, lit(1))
          val after = col(f).substr(p + lit(term.length), lit(1))
          (p === 1 || !before.rlike("^[A-Za-z0-9]$")) &&
            (length(after) === 0 || !after.rlike("^[A-Za-z0-9]$"))
        })
      val frags = transform(slice(occ, lit(1), lit(nFrags)), p =>
        if (analyzed.isEmpty)
          regexp_replace(
            col(f).substr(greatest(p - 20, lit(1)), lit(fragSize)),
            tq, s"$pre$term$post")
        else
          // wrap every BOUNDED case-insensitive occurrence inside the
          // raw fragment, keeping its original casing ($0)
          regexp_replace(
            col(f).substr(greatest(p - 20, lit(1)), lit(fragSize)),
            s"(?i)(?<![A-Za-z0-9])$tq(?![A-Za-z0-9])", s"$pre$$0$post"))
      val out = if (fields.size == 1) "highlight" else s"highlight_$f"
      df.withColumn(out, when(size(occ) > 0, concat_ws(" ... ", frags)))
      }
    }
  }

  /** The request tail over a scored hit table: `search_after` keyset
    * paging (resumes strictly after the last page's sort key — O(page)
    * work at any depth, where `from` still sorts the whole prefix, the
    * q123 contract), then sort, from/size, and `_source` projection.
    */
  private[search] def hitPipeline(scored: DataFrame, req: Map[String, JValue]): DataFrame = {
    // reached with `explain` still present only from the request-level
    // query paths (more_like_this, spans, relations), whose scores are
    // plan-level, not per-clause sums — nothing to decompose
    if (req.contains("explain"))
      fail("explain is not supported with request-level queries " +
        "(more_like_this, spans, percolate, intervals, relations)")
    // `post_filter`: the faceting idiom — filter the RETURNED hits
    // without touching relevance. Applied after scoring and the
    // rescore window selection (the OpenSearch phase order), before
    // pagination. Filter context: the compiled score is discarded,
    // never folded into `score`. Catalyst still pushes the predicate
    // toward the scan when no window/rescore computation blocks it.
    val postFiltered = req.get("post_filter") match {
      case None     => scored
      case Some(pf) =>
        val c = compileQuery(pf)
        // matched_queries is computed from the QUERY before this
        // point — a _name here would be silently absent from it
        if (c.named.nonEmpty)
          fail("_name inside post_filter is unsupported (matched_queries " +
            "reflects the query's named clauses only)")
        scored.filter(c.pred)
    }
    val paged0 = req.get("search_after") match {
      case None => postFiltered
      case Some(JArray(vals)) =>
        val sortSpec = req.get("sort").map(parseSort)
          .getOrElse(fail("search_after requires an explicit sort"))
        if (vals.size != sortSpec.size)
          fail("search_after must carry one value per sort key")
        if (req.contains("from"))
          fail("search_after cannot be combined with from")
        postFiltered.filter(keysetAfter(sortSpec, vals.map(scalaOf)))
      case Some(other) => fail(s"search_after must be an array: ${render(other)}")
    }
    val sorted = req.get("sort") match {
      case None    => paged0
      case Some(s) => paged0.orderBy(sortCols(s): _*)
    }
    val paged = (req.get("from"), req.get("size")) match {
      case (Some(JInt(f)), Some(JInt(n))) => sorted.offset(f.toInt).limit(n.toInt)
      case (Some(JInt(f)), None)          => sorted.offset(f.toInt)
      case (None, Some(JInt(n)))          => sorted.limit(n.toInt)
      case (None, None)                   => sorted
      case _ => fail("from/size must be integers")
    }
    // `fields` / `docvalue_fields`: extra output columns ALONGSIDE the
    // _source projection (the OpenSearch response carries both
    // sections; the flat hit table's analog is a column union, request
    // order, deduped). Entries are names or {field} objects; `format`
    // fails loud — the engine returns typed columns, never
    // engine-formatted strings. Unknown columns fail loud. Without a
    // _source projection every column is already in the hit table, so
    // the sections only validate.
    val extraFields: Seq[String] =
      Seq("docvalue_fields", "fields").flatMap(sec => req.get(sec) match {
        case None => Nil
        case Some(JArray(es)) if es.nonEmpty => es.map {
          case JString(f) => f
          case JObject(List(("field", JString(f)))) => f
          case JObject(es2) if es2.toMap.contains("format") =>
            fail(s"$sec does not take 'format' (the engine returns typed " +
              "columns, not formatted strings - format on read)")
          case other => fail(s"$sec entries must be field names or " +
            s"{field} objects: ${render(other)}")
        }
        case Some(other) => fail(s"$sec must be a non-empty array: ${render(other)}")
      })
    extraFields.foreach(f => if (!paged.columns.contains(f))
      fail(s"fields/docvalue_fields names unknown column '$f'"))
    def withExtras(projected: Seq[String]): Seq[String] =
      projected ++ extraFields.filterNot(projected.contains).distinct
    req.get("_source") match {
      case None => paged
      case Some(JArray(fields)) =>
        val srcCols = fields.map {
          case JString(f) => f
          case other      => fail(s"_source entries must be strings: ${render(other)}")
        }
        paged.select(withExtras(srcCols).map(col): _*)
      // the object form: includes projects, excludes then drops —
      // the OpenSearch evaluation order. Exact names only (a glob
      // would silently project nothing on a typo); unknown excluded
      // columns and an all-excluded projection fail loud.
      case Some(JObject(so)) =>
        val m = so.toMap
        m.keySet.diff(Set("includes", "excludes")).foreach(k =>
          fail(s"unsupported _source option '$k'"))
        def strs(k: String): Seq[String] = m.get(k) match {
          case None => Nil
          case Some(JArray(xs)) => xs.map {
            case JString(s2) =>
              if (s2.contains("*"))
                fail(s"_source $k takes exact column names, got glob '$s2'")
              s2
            case other => fail(s"_source $k entries must be strings: ${render(other)}")
          }
          case Some(other) => fail(s"_source $k must be an array: ${render(other)}")
        }
        val inc = strs("includes")
        val exc = strs("excludes")
        val base =
          if (inc.isEmpty) paged else paged.select(inc.map(col): _*)
        exc.foreach(f => if (!base.columns.contains(f))
          fail(s"_source excludes unknown column '$f'"))
        if (exc.nonEmpty && base.columns.forall(exc.contains))
          fail("_source excludes every column")
        // fields/docvalue_fields ride OUTSIDE the _source excludes
        // (the OpenSearch response's fields section is independent) —
        // an excluded column explicitly re-requested there comes back
        val kept = base.columns.filterNot(exc.contains).toSeq
        paged.select(withExtras(kept).map(col): _*)
      case Some(other) => fail(s"_source must be an array or " +
        s"{includes, excludes} object: ${render(other)}")
    }
  }

  /** `more_like_this`: documents similar to a seed doc by its top
    * `max_query_terms` tf·idf terms (the q118 contract). The seed's
    * term list is broadcast against the (doc, term) postings and
    * candidates score by an order-free integer idf-weight sum
    * (weight = n×10⁶ div df) — the corpus is never paired with
    * itself. `like` names the seed as `{idField: value}` (the engine
    * has no reserved `_id`); `fields` must name exactly one text
    * column. Output columns: the id field, `n_shared`, `score` —
    * ranking/paging comes from the surrounding request.
    */
  private[search] def moreLikeThisRequest(table: DataFrame, body: JValue): DataFrame =
    body match {
      case JObject(parts) =>
        val m = parts.toMap
        m.keySet.diff(Set("fields", "like", "max_query_terms", "analyzer"))
          .foreach(k => fail(s"unsupported more_like_this option '$k'"))
        val textCol = m.get("fields") match {
          case Some(JArray(List(JString(f)))) => f
          case _ => fail("more_like_this requires fields: [exactly one field]")
        }
        val (idField, seedVal) = m.get("like") match {
          case Some(JObject(List((f, v)))) => (f, scalaOf(v))
          case _ => fail("more_like_this requires like: {idField: value}")
        }
        val maxQt = intOpt(m, "max_query_terms").getOrElse(10)
        if (maxQt < 1) fail("max_query_terms must be >= 1")
        // analyzer: normalize the text column ONCE up front — the seed
        // terms and the corpus postings then both come from the
        // normalized token stream (one withColumn; the mlt plan
        // downstream is unchanged)
        val an = analyzerOpt(m, "more_like_this")
        val t1 = if (an eq Analyzer.Whitespace) table
                 else table.withColumn(textCol, an.norm(col(textCol)))
        // the ONE implementation, shared with the facade (the
        // q117/q118 one-implementation gating principle); it also
        // enforces the exactly-one-seed-row contract fail-loud
        graft.GraftEngine.moreLikeThisHits(t1, idField, textCol, seedVal, maxQt)
      case other => fail(s"more_like_this requires an object body: ${render(other)}")
    }

  /** Sort spec as (field, asc|desc) pairs — shared by orderBy and the
    * search_after keyset predicate. `_geo_distance` is orderBy-only
    * (a computed key has no keyset-cursor value), so it fails loud
    * here and is handled in [[sortCols]].
    */
  private[search] def parseSort(sort: JValue): Seq[(String, String)] = {
    def one(v: JValue): (String, String) = v match {
      case JString(f) => (f, "asc")
      case JObject(List((f, JString(ord)))) => (f, ord)
      case JObject(List((f, JObject(opts)))) =>
        // `missing`/`mode` reshape the sort KEY — orderBy-only (a
        // keyset cursor over a NULL-floated or computed key has no
        // defined resume semantics); handled in sortCols, rejected
        // here so search_after fails loud instead of paging wrong
        opts.toMap.keySet.diff(Set("order")).foreach(k =>
          fail(s"sort option '$k' on '$f' is orderBy-only " +
            "(no keyset-cursor semantics) - unsupported with search_after"))
        opts.toMap.get("order") match {
          case Some(JString(ord)) => (f, ord)
          case _                  => (f, "asc")
        }
      case other => fail(s"unsupported sort entry: ${render(other)}")
    }
    val spec = sort match {
      case JArray(entries) => entries.map(one)
      case single          => Seq(one(single))
    }
    spec.foreach { case (f, ord) =>
      if (f == "_geo_distance")
        fail("_geo_distance sorts hits only (search_after has no cursor " +
          "value for a computed key)")
      if (ord != "asc" && ord != "desc") fail(s"sort order must be asc|desc, got '$ord'")
    }
    spec
  }

  private[search] def sortCols(sort: JValue): Seq[Column] = {
    def one(v: JValue): Column = v match {
      case JObject(List(("_geo_distance", JObject(opts)))) =>
        geoDistanceSortCol(opts.toMap)
      case JObject(List(("_script", JObject(opts)))) =>
        scriptSortCol(opts.toMap)
      case JObject(List((f, JObject(opts0)))) =>
        // sort options (the OpenSearch per-field object form):
        // `missing` places NULL keys (_first/_last) explicitly;
        // `mode` sorts a multi-valued (array) field by an aggregate
        // of its values — min/max/sum exact integers, median the
        // exact lower median (an actual element, engine-portable);
        // avg fails loud (fractional under the exact integer model).
        // All pure codegen'd array expressions on the sort key.
        val opts = opts0.toMap
        opts.keySet.diff(Set("order", "missing", "mode")).foreach(k =>
          fail(s"unsupported sort option '$k' on '$f'"))
        val ord = opts.get("order") match {
          case Some(JString(o)) => o
          case None             => "asc"
          case Some(other) => fail(s"sort order must be a string: ${render(other)}")
        }
        if (ord != "asc" && ord != "desc")
          fail(s"sort order must be asc|desc, got '$ord'")
        val base0 = if (f == "_score") col("score") else col(f)
        val base = opts.get("mode") match {
          case None => base0
          case Some(JString("min")) => array_min(base0)
          case Some(JString("max")) => array_max(base0)
          case Some(JString("sum")) =>
            aggregate(base0, lit(0L), (a, x) => a + x.cast("long"))
          case Some(JString("median")) =>
            element_at(array_sort(base0),
              ((size(base0) + lit(1)) / lit(2)).cast("int"))
          case Some(JString("avg")) =>
            fail("sort mode 'avg' is fractional under the exact integer " +
              "model - use sum (same order when counts are equal)")
          case Some(JString(other)) =>
            fail(s"sort mode must be min|max|sum|median, got '$other'")
          case Some(other) => fail(s"sort mode must be a string: ${render(other)}")
        }
        (ord, opts.get("missing")) match {
          case ("asc", None)                      => base.asc
          case ("desc", None)                     => base.desc
          case ("asc", Some(JString("_first")))   => base.asc_nulls_first
          case ("asc", Some(JString("_last")))    => base.asc_nulls_last
          case ("desc", Some(JString("_first")))  => base.desc_nulls_first
          case ("desc", Some(JString("_last")))   => base.desc_nulls_last
          case (_, Some(other)) =>
            fail(s"sort missing must be '_first' or '_last' (custom " +
              s"substitute values are unsupported): ${render(other)}")
        }
      case other =>
        val Seq((f, ord)) = parseSort(other)
        sortField(f, ord)
    }
    sort match {
      case JArray(entries) => entries.map(one)
      case single          => Seq(one(single))
    }
  }

  /** `_geo_distance` sort entry: order hits by haversine distance to
    * an origin over named lat/lon columns — the same deterministic
    * 6-dp-rounded recipe as the `geo_distance` query (q125), so the
    * ordering is engine-portable; callers add an id tie-break for
    * totality, like any other sort.
    */
  private[search] def geoDistanceSortCol(m: Map[String, JValue]): Column = {
    m.keySet.diff(Set("lat_field", "lon_field", "origin", "order")).foreach(k =>
      fail(s"unsupported _geo_distance sort option '$k'"))
    val latF = strOpt(m, "lat_field")
      .getOrElse(fail("_geo_distance sort requires lat_field"))
    val lonF = strOpt(m, "lon_field")
      .getOrElse(fail("_geo_distance sort requires lon_field"))
    def num(v: JValue, what: String): Double = v match {
      case JDouble(d)  => d
      case JInt(i)     => i.toDouble
      case JDecimal(d) => d.toDouble
      case other       => fail(s"$what must be numeric: ${render(other)}")
    }
    val (latQ, lonQ) = m.get("origin") match {
      case Some(JObject(o)) =>
        val om = o.toMap
        (om.get("lat").map(num(_, "origin.lat"))
           .getOrElse(fail("origin requires lat")),
         om.get("lon").map(num(_, "origin.lon"))
           .getOrElse(fail("origin requires lon")))
      case _ => fail("_geo_distance sort requires origin: {lat, lon}")
    }
    val dist = haversineKm(latF, lonF, latQ, lonQ)
    strOpt(m, "order").getOrElse("asc") match {
      case "asc"  => dist.asc
      case "desc" => dist.desc
      case other  => fail(s"sort order must be asc|desc, got '$other'")
    }
  }

  /** `_script` sort entry: order hits by a computed expression through
    * the SAME ScoreScript compiler as script_score/script_fields —
    * compiled ONCE on the driver to a codegen'd Catalyst column, zero
    * row-time interpretation. `type` must be `number` (the exact
    * integer script model — OpenSearch's other type, `string`, buys
    * nothing over sorting the concatenated column directly).
    * `_score` references fail loud: sort on `{"_score": ...}` itself
    * and tie-break with fields — binding it here would couple the
    * sort to a score column some request shapes don't carry.
    */
  private[search] def scriptSortCol(m: Map[String, JValue]): Column = {
    m.keySet.diff(Set("type", "script", "order")).foreach(k =>
      fail(s"unsupported _script sort option '$k'"))
    strOpt(m, "type") match {
      case Some("number") => ()
      case Some(other) => fail(s"_script sort type must be 'number' (the " +
        s"exact integer script model), got '$other'")
      case None => fail("_script sort requires type: number")
    }
    val (src, params) = m.get("script") match {
      case Some(JObject(s)) =>
        val sm = s.toMap
        sm.keySet.diff(Set("source", "params")).foreach(k =>
          fail(s"unsupported script option '$k' in _script sort"))
        val source = strOpt(sm, "source")
          .getOrElse(fail("_script sort script needs a source"))
        val ps: Map[String, Long] = sm.get("params") match {
          case Some(JObject(po)) => po.map {
            case (k, JInt(v)) => k -> v.toLong
            case (k, other) =>
              fail(s"script param '$k' must be an integer: ${render(other)}")
          }.toMap
          case None        => Map.empty
          case Some(other) => fail(s"script params must be an object: ${render(other)}")
        }
        (source, ps)
      case _ => fail("_script sort needs {script: {source, params?}}")
    }
    if (ScoreScript.referencesScore(src))
      fail("_script sort cannot reference _score (sort on {\"_score\": ...} " +
        "directly and tie-break with fields)")
    val c = ScoreScript.compile(src, params, lit(0L))
    strOpt(m, "order").getOrElse("asc") match {
      case "asc"  => c.asc
      case "desc" => c.desc
      case other  => fail(s"sort order must be asc|desc, got '$other'")
    }
  }

  /** Lexicographic "strictly after this sort key" predicate:
    * OR over k of (equal on keys before k AND strictly past on key k).
    * Sort keys must be NON-NULL columns: a NULL key makes the keyset
    * comparison NULL and the row silently unreachable, diverging from
    * offset paging (NULL cursor VALUES already fail in scalaOf).
    */
  private[search] def keysetAfter(spec: Seq[(String, String)], vals: Seq[Any]): Column = {
    def baseCol(f: String): Column = if (f == "_score") col("score") else col(f)
    spec.indices.map { k =>
      val eqPrefix = (0 until k).map(j => baseCol(spec(j)._1) === lit(vals(j)))
      val (f, ord) = spec(k)
      val strict =
        if (ord == "asc") baseCol(f) > lit(vals(k)) else baseCol(f) < lit(vals(k))
      (eqPrefix :+ strict).reduce(_ && _)
    }.reduce(_ || _)
  }

  private[search] def sortField(f: String, order: String): Column = {
    val c = if (f == "_score") col("score") else col(f)
    order match {
      case "asc"  => c.asc
      case "desc" => c.desc
      case other  => fail(s"sort order must be asc|desc, got '$other'")
    }
  }

}

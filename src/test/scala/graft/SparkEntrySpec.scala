package graft

/** The driver contract itself: the flagship entry returns rows, every
  * registry entry is uniquely named, and every oracle key names a
  * registered query — the three shapes that fail a round before any
  * operator logic gets a chance to.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry (the driver's smoke check) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and oracle keys all resolve") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(names.forall(_.matches("q[0-9]+[a-z]?_[a-z0-9_]+")),
      "query name broke the qN_snake_case convention")
  }

  test("no query output carries a top-level ARRAY/MAP/STRUCT column") {
    // the driver's diff harness sorts result columns with pandas,
    // which cannot hash ndarray/dict cells — a bare complex column
    // crashes the oracle comparison at driver time (the q131 failure
    // class, r6). Catch the next one here, at sbt test time: every
    // query's OUTPUT schema must be scalar-only (complex columns are
    // fine internally; render them with concat_ws/to_json at the edge).
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val dir = sf()
    val offenders = Registry.all.flatMap { q =>
      val schema = q.run(spark, dir).schema
      val bad = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
      }
      if (bad.isEmpty) None else Some(s"${q.name} -> ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"queries emitting driver-unsortable top-level complex columns: $offenders")
  }

  test("every oracle carries a total ORDER BY unless single-row by construction") {
    // the driver compares row order, so an oracle without a total
    // ORDER BY is a gate-flakiness hazard; the exceptions are queries
    // whose result is ONE row by construction (global aggregates)
    val singleRowByConstruction = Set(
      "q110_search_adjacency_matrix", "q111_search_matrix_stats",
      "q124_search_multi_term", "q158_dsl_percentiles",
      "q178_dsl_matrix_stats", "q185_dsl_count",
      // round-7 one-row global aggregates: extended_stats,
      // top_metrics, missing, sibling *_bucket, global, filter
      "q187_dsl_extended_stats", "q189_dsl_top_metrics",
      "q190_dsl_missing", "q194_dsl_sibling_bucket",
      "q203_dsl_global", "q204_dsl_filter_agg",
      "q216_dsl_sampler", "q217_dsl_boxplot", "q218_dsl_string_stats",
      // round-9 one-row global aggregates
      "q235_dsl_percentile_ranks", "q237_dsl_geo_centroid",
      "q242_dsl_nested_agg",
      // round-10 one-row global aggregates
      "q251_dsl_geo_bounds", "q259_dsl_percentiles_bucket",
      "q261_dsl_t_test", "q262_dsl_diversified_sampler",
      "q263_dsl_children_agg", "q264_dsl_parent_agg",
      "q269_dsl_extended_stats_bucket")
    val missing = SparkEntry.oracleSql.collect {
      case (name, sql)
        if !sql.toUpperCase.contains("ORDER BY") &&
          !singleRowByConstruction(name) => name
    }
    assert(missing.isEmpty,
      s"oracles without a total ORDER BY (row order is compared!): $missing")
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.GraftQuery
import graft.sources.Tables

/** Relational operator surface (SURVEY.md §2.4–§2.7): aggregations
  * A1–A6, joins J1–J8, windows W1–W3, sorts/limits/set-ops O1–O5 — all
  * declarative DataFrame plans so Catalyst handles pushdown, pruning,
  * join selection, partial aggregation and whole-stage codegen.
  *
  * Scale notes are per query; the common rules: dimension tables
  * (region/nation/supplier/part) are broadcast so fact-side scans never
  * shuffle for them; large-large joins shuffle on their equi keys once
  * and reuse that partitioning; window functions partition by
  * high-cardinality keys (customer/user) so state per task stays small.
  */
object Relational {

  /** Exact sum of a double measure: round each input to DECIMAL(18,2)
    * (identical in both engines), sum exactly, return DOUBLE.
    */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  def queries: Seq[GraftQuery] = Seq(
    // ---------------------------------------------------------------- A1
    // Grouped hash aggregate — TPC-H Q1 shape. Partial/final agg split is
    // automatic (HashAggregateExec); only ~6 groups cross the shuffle, so
    // this is map-side-combine dominated and scales linearly in input.
    GraftQuery(
      "q1_agg",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum((col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))))
              .cast("double").as("sum_disc_price"),
            (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
              count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim),
      headline = true),

    // ---------------------------------------------------------------- A2
    // distinct / count-distinct. countDistinct plans as a two-phase
    // (expand + two aggregates) — per-group distinct state stays bounded.
    GraftQuery(
      "q2_agg_distinct",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        o.groupBy(col("o_orderpriority"))
          .agg(
            countDistinct(col("o_custkey")).as("n_custs"),
            countDistinct(col("o_orderstatus")).as("n_statuses"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority,
               COUNT(DISTINCT o_custkey) AS n_custs,
               COUNT(DISTINCT o_orderstatus) AS n_statuses,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- A5
    // ROLLUP region → nation with grouping() to disambiguate subtotal
    // rows from genuine NULLs; deterministic NULLS FIRST total order.
    GraftQuery(
      "q3_agg_rollup",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val n = Tables.load(s, dir, "nation")
        val r = Tables.load(s, dir, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_custs"),
            dsum(col("c_acctbal")).as("sum_bal"),
            grouping(col("r_name")).cast("long").as("g_region"),
            grouping(col("n_name")).cast("long").as("g_nation"))
          .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
      },
      Some("""
        SELECT r_name, n_name, COUNT(*) AS n_custs,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
               CAST(GROUPING(r_name) AS BIGINT) AS g_region,
               CAST(GROUPING(n_name) AS BIGINT) AS g_nation
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
      """.stripMargin.trim)),

    // Explicit GROUPING SETS — the general form rollup/cube are sugar
    // for (here: per (lang,source), per lang, and grand total, but NOT
    // per source — a set cube would force). Also exercises the SQL
    // text entry path: the identical ANSI text runs through spark.sql
    // over registered views and through the DuckDB oracle. One
    // expand+aggregate, same single-shuffle plan as q3/q4.
    GraftQuery(
      "q114_agg_grouping_sets",
      (s, dir) => {
        graft.sources.Tables.registerAll(s, dir)
        s.sql("""
          SELECT lang, source, COUNT(*) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                 CAST(GROUPING(lang) AS BIGINT) AS g_lang,
                 CAST(GROUPING(source) AS BIGINT) AS g_source
          FROM documents
          GROUP BY GROUPING SETS ((lang, source), (lang), ())
          ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST
        """)
      },
      Some("""
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(GROUPING(lang) AS BIGINT) AS g_lang,
               CAST(GROUPING(source) AS BIGINT) AS g_source
        FROM documents
        GROUP BY GROUPING SETS ((lang, source), (lang), ())
        ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- A5
    GraftQuery(
      "q4_agg_cube",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            grouping(col("l_returnflag")).cast("long").as("g_rf"),
            grouping(col("l_linestatus")).cast("long").as("g_ls"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"),
            col("g_rf"), col("g_ls"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, g_rf, g_ls
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- A6
    // Top-k terms (OpenSearch `terms` agg): tiny result crosses the
    // shuffle pre-aggregated; TakeOrderedAndProject caps the sort.
    GraftQuery(
      "q5_agg_topk_terms",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        e.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy(col("n").desc, col("event_type"))
          .limit(10)
      },
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type
        ORDER BY n DESC, event_type LIMIT 10
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- A4
    // Exact interpolated percentiles (both engines: linear interpolation
    // over the sorted multiset — Spark `percentile`, DuckDB quantile_cont).
    GraftQuery(
      "q6_agg_percentile",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.25)").as("p25"),
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_quantity, 0.75)").as("p75"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.5)  AS p50,
               quantile_cont(l_quantity, 0.75) AS p75
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- A3
    // Approximate distinct (HLL++) — the OpenSearch `cardinality` agg.
    // Sketch internals are engine-specific, so no SQL oracle; the
    // ScalaTest spec asserts ≤2% relative error vs the exact count.
    GraftQuery(
      "q7_agg_approx_distinct",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
            countDistinct(col("l_orderkey")).as("exact_orders"))
          .orderBy(col("l_returnflag"))
      },
      None),

    // ---------------------------------------------------------------- A7
    // Custom typed aggregates via Aggregator→udaf: exact decimal sum of
    // squares + bounded-heap k-smallest. Buffers are tiny and
    // commutative, so the partial/final split (map-side combine) applies
    // exactly as for built-ins.
    GraftQuery(
      "q8_agg_custom",
      (s, dir) => {
        import org.apache.spark.sql.Encoders
        val sumsq = udaf(graft.functions.Aggregators.SumOfSquares, Encoders.scalaDouble)
        val small3 = udaf(new graft.functions.Aggregators.SmallestK(3), Encoders.scalaDouble)
        val e = Tables.load(s, dir, "events")
        // the k-smallest array is unpacked to scalar columns: the
        // driver's pandas-based compare can't sort/hash array cells
        e.groupBy(col("event_type"))
          .agg(
            sumsq(col("value")).as("sum_sq"),
            small3(col("value")).as("_s3"))
          .select(
            col("event_type"), col("sum_sq"),
            element_at(col("_s3"), 1).as("small1"),
            element_at(col("_s3"), 2).as("small2"),
            element_at(col("_s3"), 3).as("small3"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH g AS (
          SELECT event_type,
                 CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_sq,
                 list_slice(list(value ORDER BY value), 1, 3) AS s3
          FROM events GROUP BY event_type)
        SELECT event_type, sum_sq, s3[1] AS small1, s3[2] AS small2, s3[3] AS small3
        FROM g ORDER BY event_type
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- A5+
    // Pivot: event_type values become count columns per user. The value
    // list is explicit — at scale an unbounded pivot would need a
    // distinct-collect planning pass; pinning it keeps the plan static
    // and the shuffle a plain (user_id) hash agg. Oracle = portable
    // CASE-sum form (what pivot desugars to).
    GraftQuery(
      "q9_agg_pivot",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        e.groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy(col("user_id"))
          .limit(200)
      },
      Some("""
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'click') AS click,
               COUNT(*) FILTER (event_type = 'error') AS error,
               COUNT(*) FILTER (event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (event_type = 'signup') AS signup,
               COUNT(*) FILTER (event_type = 'view') AS view
        FROM events GROUP BY user_id ORDER BY user_id LIMIT 200
      """.stripMargin.trim)),

    // Unpivot (melt): wide per-nation min/max/avg columns back to
    // (nation, metric, value) rows — map-only row explosion, no shuffle
    // beyond the feeding agg.
    GraftQuery(
      "q9b_agg_unpivot",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val wide = c.groupBy(col("c_nationkey"))
          .agg(
            min(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("min_bal"),
            max(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("max_bal"))
        wide.unpivot(
            Array(col("c_nationkey")),
            Array(col("min_bal"), col("max_bal")),
            "metric", "value")
          .orderBy(col("c_nationkey"), col("metric"))
      },
      Some("""
        WITH w AS (
          SELECT c_nationkey,
                 CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_bal,
                 CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal
          FROM customer GROUP BY c_nationkey)
        SELECT c_nationkey, 'min_bal' AS metric, min_bal AS value FROM w
        UNION ALL
        SELECT c_nationkey, 'max_bal' AS metric, max_bal AS value FROM w
        ORDER BY c_nationkey, metric
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- J1/J2
    // Star join: facts ⋈ broadcast dims. Explicit broadcast() keeps all
    // three dim joins shuffle-free — the only shuffle is the final agg.
    GraftQuery(
      "q10_join_star",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        val n = Tables.load(s, dir, "nation")
        val r = Tables.load(s, dir, "region")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name
      """.stripMargin.trim),
      headline = true),

    // ---------------------------------------------------------------- J3
    // Large-large equi join: lineitem ⋈ orders shuffles both sides on
    // the order key once (sort-merge at scale; AQE may pick broadcast at
    // small SF). Aggregation immediately reuses nothing — output is tiny.
    GraftQuery(
      "q11_join_large",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val o = Tables.load(s, dir, "orders")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_lines"),
            sum((col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))))
              .cast("double").as("revenue"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
      """.stripMargin.trim),
      headline = true),

    // ---------------------------------------------------------------- J5
    GraftQuery(
      "q12_join_left_outer",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spend"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
               COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- J6
    GraftQuery(
      "q13_join_semi",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.join(o.filter(col("o_orderstatus") === "F"), c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        ORDER BY c_custkey
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- J6
    GraftQuery(
      "q14_join_anti",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- J7
    // As-of join: for each purchase event, the user's latest click at or
    // before it. Equi-join on user + range filter + per-purchase
    // row_number: the shuffle is keyed on user_id (high cardinality), so
    // pair blow-up is bounded per key — the scalable as-of shape.
    GraftQuery(
      "q15_join_asof",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .withColumn("tsec", date_trunc("second", col("ts")))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("tsec").as("p_ts"))
        val c = e.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id"), col("tsec").as("c_ts"))
        val w = Window.partitionBy(col("p_id")).orderBy(col("c_ts").desc, col("c_id").desc)
        p.join(c, Seq("user_id"))
          .filter(col("c_ts") <= col("p_ts"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("p_id"), col("user_id"), col("p_ts"), col("c_id").as("asof_click_id"),
            col("c_ts").as("asof_click_ts"))
          .orderBy(col("p_id"))
      },
      Some("""
        WITH e AS (SELECT event_id, user_id, event_type, date_trunc('second', ts) AS tsec FROM events),
        p AS (SELECT event_id AS p_id, user_id, tsec AS p_ts FROM e WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS c_id, user_id, tsec AS c_ts FROM e WHERE event_type = 'click'),
        j AS (
          SELECT p_id, p.user_id, p_ts, c_id, c_ts,
                 ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY c_ts DESC, c_id DESC) AS rn
          FROM p JOIN c ON p.user_id = c.user_id AND c_ts <= p_ts)
        SELECT p_id, user_id, p_ts, c_id AS asof_click_id, c_ts AS asof_click_ts
        FROM j WHERE rn = 1 ORDER BY p_id
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- J7
    // Same as-of semantics through the native sort-merge exec
    // (plans.AsofJoin: LogicalPlan + Strategy + BinaryExecNode): one
    // co-partitioning shuffle per side, single merge pass, no
    // pair materialization and no second window shuffle — the form
    // that survives hot keys at 100×. Same DuckDB oracle as q15.
    GraftQuery(
      "q19_join_asof_native",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .withColumn("tsec", date_trunc("second", col("ts")))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("tsec").as("p_ts"))
        val c = e.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id"), col("tsec").as("c_ts"))
        graft.plans.AsofJoin.asof(p, c, Seq("user_id"), "p_ts", "c_ts",
            rightTieBreak = Seq("c_id"))
          .select(p("p_id"), p("user_id"), p("p_ts"),
            col("c_id").as("asof_click_id"), col("c_ts").as("asof_click_ts"))
          .orderBy(col("p_id"))
      },
      Some("""
        WITH e AS (SELECT event_id, user_id, event_type, date_trunc('second', ts) AS tsec FROM events),
        p AS (SELECT event_id AS p_id, user_id, tsec AS p_ts FROM e WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS c_id, user_id, tsec AS c_ts FROM e WHERE event_type = 'click'),
        j AS (
          SELECT p_id, p.user_id, p_ts, c_id, c_ts,
                 ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY c_ts DESC, c_id DESC) AS rn
          FROM p JOIN c ON p.user_id = c.user_id AND c_ts <= p_ts)
        SELECT p_id, user_id, p_ts, c_id AS asof_click_id, c_ts AS asof_click_ts
        FROM j WHERE rn = 1 ORDER BY p_id
      """.stripMargin.trim),
      headline = true),

    // ---------------------------------------------------------------- J4
    // Theta/range join against a tiny literal band table → broadcast
    // nested-loop with a 5-row band side: scale-safe non-equi join.
    GraftQuery(
      "q16_join_range_band",
      (s, dir) => {
        import s.implicits._
        val p = Tables.load(s, dir, "part")
        val bands = Seq(
          ("b0", 0.0, 500.0), ("b1", 500.0, 1000.0), ("b2", 1000.0, 1500.0),
          ("b3", 1500.0, 2000.0), ("b4", 2000.0, 1e9))
          .toDF("band", "lo", "hi")
        p.join(broadcast(bands),
            p("p_retailprice") >= bands("lo") && p("p_retailprice") < bands("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_parts"), dsum(col("p_retailprice")).as("sum_price"))
          .orderBy(col("band"))
      },
      Some("""
        SELECT band, COUNT(*) AS n_parts,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM part
        JOIN (VALUES ('b0', 0.0, 500.0), ('b1', 500.0, 1000.0), ('b2', 1000.0, 1500.0),
                     ('b3', 1500.0, 2000.0), ('b4', 2000.0, 1000000000.0)) AS bands(band, lo, hi)
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY band ORDER BY band
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- J4b
    // Large-large interval join: events × deterministic promo windows
    // through operators.RangeBandJoin — banding turns the point-in-
    // interval predicate into an equi-join on day buckets (exact: a
    // pair meets only in the point's band), so the plan is a plain key
    // shuffle instead of the broadcast-nested-loop a raw theta join
    // plans. Timestamps compare in integer epoch micros on both
    // engines (Spark floors parquet nanos to micros; DuckDB epoch_us
    // truncates identically).
    GraftQuery(
      "q16b_join_range_banded",
      (s, dir) => {
        import s.implicits._
        val day = 86400000000L // one day in epoch micros
        val base = 1704067200000000L // 2024-01-01T00:00:00Z
        val windows = (0 until 10).map { i =>
          val lo = base + i.toLong * 3L * day
          (s"w$i", lo, lo + (1L + i % 3) * day)
        }.toDF("wid", "lo", "hi")
        val pts = Tables.load(s, dir, "events")
          .select(col("event_id"), col("value"), unix_micros(col("ts")).as("pt"))
        graft.operators.RangeBandJoin
          .join(pts, windows, "pt", "lo", "hi", width = day.toDouble)
          .groupBy(col("wid"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
          .orderBy(col("wid"))
      },
      Some("""
        WITH w(wid, lo, hi) AS (
          SELECT 'w' || CAST(i AS VARCHAR),
                 1704067200000000 + i * 3 * 86400000000,
                 1704067200000000 + i * 3 * 86400000000 + (1 + i % 3) * 86400000000
          FROM (SELECT unnest(range(0, 10)) AS i)),
        p AS (SELECT event_id, value, epoch_us(ts) AS pt FROM events)
        SELECT wid, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM p JOIN w ON pt >= lo AND pt < hi
        GROUP BY wid ORDER BY wid
      """.stripMargin.trim),
      headline = true),

    // ---------------------------------------------------------------- J8
    GraftQuery(
      "q17_join_cross",
      (s, dir) => {
        val r = Tables.load(s, dir, "region")
        val r2 = r.select(col("r_regionkey").as("k2"), col("r_name").as("name2"))
        r.crossJoin(broadcast(r2))
          .filter(col("r_regionkey") < col("k2"))
          .select(col("r_name").as("a_name"), col("name2").as("b_name"))
          .orderBy(col("a_name"), col("b_name"))
      },
      Some("""
        SELECT a.r_name AS a_name, b.r_name AS b_name
        FROM region a CROSS JOIN region b
        WHERE a.r_regionkey < b.r_regionkey
        ORDER BY a_name, b_name
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- J5
    // Full outer join of two aggregated keyspaces (orders-per-customer vs
    // events-per-user). Aggregating before the join shrinks both sides to
    // one row per key — join input is minimal at any scale.
    GraftQuery(
      "q18_join_full_outer",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("n_orders"))
        val e = Tables.load(s, dir, "events")
          .groupBy(col("user_id").as("key")).agg(count(lit(1)).as("n_events"))
        o.join(e, Seq("key"), "full_outer")
          .select(col("key"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("n_events"), lit(0L)).as("n_events"))
          .orderBy(col("key"))
      },
      Some("""
        SELECT COALESCE(o.key, e.key) AS key,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(n_events, 0) AS n_events
        FROM (SELECT o_custkey AS key, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
        FULL OUTER JOIN (SELECT user_id AS key, COUNT(*) AS n_events FROM events GROUP BY 1) e
          ON o.key = e.key
        ORDER BY key
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- W1
    // Ranking window: top-3 orders per customer. Partition key is the
    // high-cardinality customer key → per-task window state is tiny.
    GraftQuery(
      "q20_window_rank",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"),
            col("o_totalprice").cast("decimal(18,2)").cast("double").as("price"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""
        SELECT o_custkey, rn, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
              FROM orders)
        WHERE rn <= 3 ORDER BY o_custkey, rn
      """.stripMargin.trim),
      headline = true),

    // ---------------------------------------------------------------- W2
    // Analytic lag: inter-event gap per user, aggregated to exact-integer
    // second sums so the double average is engine-identical.
    GraftQuery(
      "q21_window_lag",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .withColumn("tsec", unix_timestamp(date_trunc("second", col("ts"))))
        val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"), col("event_id"))
        e.withColumn("gap", col("tsec") - lag(col("tsec"), 1).over(w))
          .filter(col("gap").isNotNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_gaps"),
            (sum(col("gap")).cast("double") / count(lit(1))).as("avg_gap_sec"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH g AS (
          SELECT user_id,
                 epoch(date_trunc('second', ts)) - LAG(epoch(date_trunc('second', ts)), 1)
                   OVER (PARTITION BY user_id ORDER BY epoch(date_trunc('second', ts)), event_id) AS gap
          FROM events)
        SELECT user_id, COUNT(*) AS n_gaps,
               CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS avg_gap_sec
        FROM g WHERE gap IS NOT NULL
        GROUP BY user_id ORDER BY user_id
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- W3
    // Rows-frame running sum (unbounded preceding → current row).
    GraftQuery(
      "q22_window_running",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
              .cast("double").as("running_spend"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders ORDER BY o_custkey, o_orderkey
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- W3
    // Range-frame window over integer day numbers: orders by the same
    // customer in the trailing 30 days.
    GraftQuery(
      "q23_window_range_frame",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .withColumn("day", datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).cast("long"))
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
          .rangeBetween(-30, Window.currentRow)
        o.select(col("o_custkey"), col("o_orderkey"), col("day"),
            count(lit(1)).over(w).as("n_last_30d"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS day,
               COUNT(*) OVER (PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
                              RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_last_30d
        FROM orders ORDER BY o_custkey, o_orderkey
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- W1+
    // Distribution window functions — the remaining ranking family:
    // ntile quartiles, percent_rank, cume_dist per priority class.
    // All three are exact rationals of integer rank/count (doubles
    // divide the same integers in any engine); the orderkey tiebreak
    // removes peer groups so the rationals are unique per row. One
    // shuffle on the partition key; the modulo filter only thins the
    // presentation (windows rank the full partition, as they must).
    GraftQuery(
      "q24_window_distribution",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        o.select(col("o_orderkey"), col("o_orderpriority"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"))
          .filter(col("o_orderkey") % 100 === 0)
          .orderBy(col("o_orderkey"))
      },
      Some("""
        WITH d AS (
          SELECT o_orderkey, o_orderpriority,
                 CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                 percent_rank() OVER w AS pct_rank,
                 cume_dist() OVER w AS cume
          FROM orders
          WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey))
        SELECT * FROM d WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- O2
    // Global top-k: TakeOrderedAndProjectExec — per-partition heaps of k,
    // only k rows per partition reach the driver-side merge.
    GraftQuery(
      "q25_topk_global",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            col("l_extendedprice").cast("decimal(18,2)").cast("double").as("price"))
          .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100)
      },
      Some("""
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM lineitem ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 100
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- O3
    GraftQuery(
      "q26_union",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val f = o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderstatus"))
        val p = o.filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey"), col("o_orderstatus"))
        f.unionByName(p)
          .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n FROM (
          SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
          UNION ALL
          SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O')
        GROUP BY o_orderstatus ORDER BY o_orderstatus
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- O4
    GraftQuery(
      "q27_intersect",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders").select(col("o_custkey").as("key"))
        val e = Tables.load(s, dir, "events").select(col("user_id").as("key"))
        o.intersect(e).orderBy(col("key"))
      },
      Some("""
        SELECT o_custkey AS key FROM orders
        INTERSECT
        SELECT user_id AS key FROM events
        ORDER BY key
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- O4
    GraftQuery(
      "q28_except",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders").select(col("o_custkey").as("key"))
        val e = Tables.load(s, dir, "events").select(col("user_id").as("key"))
        o.except(e).orderBy(col("key"))
      },
      Some("""
        SELECT o_custkey AS key FROM orders
        EXCEPT
        SELECT user_id AS key FROM events
        ORDER BY key
      """.stripMargin.trim)),

    // ---------------------------------------------------------------- O5
    GraftQuery(
      "q29_distinct",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.select(col("l_returnflag"), col("l_linestatus"))
          .dropDuplicates()
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim)),

    // Z-order layout, gated end to end ([[graft.operators.ZOrder]]):
    // lineitem is rewritten once per (JVM, dataset) clustered along the
    // Morton curve of (l_extendedprice, l_quantity), then served with a
    // conjunctive range predicate on BOTH z-columns — the access
    // pattern a single-column sort cannot prune. Correctness is
    // layout-invariant (the oracle reads the raw table), which is
    // exactly the point: clustering must change the scan cost, never
    // the answer. ZOrderSpec + ScaleBench carry the pruning metrics
    // (row groups skipped / rows materialized); decimal-exact sums
    // keep the aggregate hash-stable.
    GraftQuery(
      "q119_zorder_scan",
      (s, dir) => {
        val layout = graft.operators.ZOrder.cachedLayout(
          s, dir, Seq("l_extendedprice", "l_quantity"),
          watch = Seq(s"$dir/lineitem.parquet"))(
          Tables.load(s, dir, "lineitem"))
        s.read.parquet(layout)
          .filter(col("l_extendedprice").between(20000.0, 30000.0) &&
            col("l_quantity").between(10.0, 20.0))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double").as("sum_price"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_extendedprice BETWEEN 20000.0 AND 30000.0
          AND l_quantity BETWEEN 10.0 AND 20.0
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """.stripMargin.trim))
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Scalar-function surface (SURVEY.md §2.8): composite-key string ops
  * (the reference's `#`-delimited SK encoding, table-data.json:8), ISO
  * timestamp math, JSON extraction (the raw DynamoDB envelope is JSON),
  * array parse/ops, regex. All per-row, codegen'd, zero-shuffle until
  * the final aggregate/sort.
  */
object Scalars {

  def queries: Seq[GraftQuery] = Seq(
    // Composite-key build → split → recover (reference SK pattern
    // `dest#startTs#class`; doc id = concat_ws('#', PK, SK),
    // custom_resource.py:350). Round-trips through split/element_at.
    GraftQuery(
      "q30_scalar_string",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        e.withColumn("doc_id",
            concat_ws("#", col("event_type"), col("user_id"), col("event_id")))
          .withColumn("parts", split(col("doc_id"), "#"))
          .filter(col("doc_id").startsWith("click#"))
          .select(
            col("event_id"),
            col("doc_id"),
            element_at(col("parts"), 1).as("k_type"),
            element_at(col("parts"), 2).cast("long").as("k_user"),
            upper(substring(col("event_type"), 1, 2)).as("prefix2"),
            length(col("doc_id")).cast("long").as("id_len"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH d AS (
          SELECT event_id, event_type,
                 concat_ws('#', event_type, user_id, event_id) AS doc_id
          FROM events)
        SELECT event_id, doc_id,
               split_part(doc_id, '#', 1) AS k_type,
               CAST(split_part(doc_id, '#', 2) AS BIGINT) AS k_user,
               upper(substr(event_type, 1, 2)) AS prefix2,
               CAST(length(doc_id) AS BIGINT) AS id_len
        FROM d WHERE doc_id LIKE 'click#%' ORDER BY event_id
      """.stripMargin.trim)),

    // Timestamp truncation / extraction / date arithmetic.
    GraftQuery(
      "q31_scalar_date",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        o.withColumn("month", date_trunc("month", col("o_orderdate")))
          .groupBy(col("month"))
          .agg(
            count(lit(1)).as("n"),
            min(dayofmonth(col("o_orderdate")).cast("long")).as("min_day"),
            max(dayofmonth(col("o_orderdate")).cast("long")).as("max_day"),
            countDistinct(year(col("o_orderdate"))).as("n_years"))
          .orderBy(col("month"))
      },
      Some("""
        SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n,
               CAST(MIN(extract(day FROM o_orderdate)) AS BIGINT) AS min_day,
               CAST(MAX(extract(day FROM o_orderdate)) AS BIGINT) AS max_day,
               COUNT(DISTINCT extract(year FROM o_orderdate)) AS n_years
        FROM orders GROUP BY 1 ORDER BY month
      """.stripMargin.trim)),

    // JSON extraction over the events.props payload (the engine's raw
    // ingest layer is JSON-encoded DynamoDB items — same machinery).
    GraftQuery(
      "q32_scalar_json",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        e.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .withColumn("bucket", (col("k") % 10).cast("long"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy(col("bucket"))
      },
      Some("""
        SELECT CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS bucket,
               COUNT(*) AS n,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY 1 ORDER BY bucket
      """.stripMargin.trim)),

    // Array ops: tokenize, distinct, membership, first/last element.
    // (Parses the stringified-list shape the reference data carries,
    // e.g. SSR "[wheelchair, vegan]", table-data.json:715.)
    GraftQuery(
      "q33_scalar_array",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.withColumn("tok", split(col("text"), " "))
          .select(
            col("doc_id"),
            size(col("tok")).cast("long").as("n_tokens"),
            size(array_distinct(col("tok"))).cast("long").as("n_distinct"),
            array_contains(col("tok"), "spark").as("has_spark"),
            element_at(col("tok"), 1).as("first_tok"),
            element_at(col("tok"), -1).as("last_tok"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
        SELECT doc_id,
               CAST(len(tok) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(tok)) AS BIGINT) AS n_distinct,
               list_contains(tok, 'spark') AS has_spark,
               tok[1] AS first_tok,
               tok[-1] AS last_tok
        FROM t ORDER BY doc_id
      """.stripMargin.trim)),

    // GSI-style inverted access path (table-attributes.json:39-72): the
    // base table is keyed by custkey; the "GSI" re-keys by
    // (orderpriority, orderdate) so the inverse lookup is a partition-
    // prunable scan instead of a full-table filter. In Spark a GSI is a
    // sparse re-partitioned projection; the query pattern is the
    // key-condition form: GSI1PK equality + GSI1SK range.
    GraftQuery(
      "q35_gsi_lookup",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val gsi = o.select(
          col("o_orderpriority").as("GSI1PK"),
          col("o_orderdate").as("GSI1SK"),
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .filter(col("GSI1PK").isNotNull && col("GSI1SK").isNotNull)
        gsi.filter(col("GSI1PK") === "1-URGENT" &&
            col("GSI1SK").between(
              lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
          .select(col("o_orderkey"), col("o_custkey"), col("GSI1SK").as("orderdate"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_orderdate AS orderdate
        FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        ORDER BY o_orderkey
      """.stripMargin.trim)),

    // Regex extract/match (reference's only regex is policy-name
    // matching, custom_resource.py:421; generalized here).
    GraftQuery(
      "q34_scalar_regex",
      (s, dir) => {
        val p = Tables.load(s, dir, "part")
        p.withColumn("brand_num", regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("long"))
          .filter(col("p_name").rlike("^(small|large) "))
          .select(col("p_partkey"), col("p_name"), col("p_brand"), col("brand_num"))
          .orderBy(col("p_partkey"))
      },
      Some("""
        SELECT p_partkey, p_name, p_brand,
               CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num
        FROM part WHERE regexp_matches(p_name, '^(small|large) ')
        ORDER BY p_partkey
      """.stripMargin.trim))
  )
}

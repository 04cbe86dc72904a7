package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when SQL-expressible)
  * the equivalent ANSI SQL the DuckDB oracle runs over the same parquet
  * tables. Keeping both in one value keeps column names/aliases in sync —
  * the driver compare sorts columns by name before hashing.
  *
  * Determinism rules for oracle-checked queries:
  *   - every query ends in a total ORDER BY so row order is stable;
  *   - double measures are cast to DECIMAL at the input, aggregated
  *     exactly, and cast back to DOUBLE at the output (float summation
  *     order differs between engines; decimal sums do not);
  *   - averages are built as exact-sum / count in double, never the
  *     engine's AVG (whose internal rounding differs);
  *   - nanosecond timestamps (events.ts) are only compared after
  *     date_trunc to second or coarser (Spark truncates ns to micros).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

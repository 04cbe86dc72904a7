package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated parquet test tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads go through
  * `spark.read.parquet` so Catalyst gets vectorized scans, predicate
  * pushdown and column pruning for free. At 100 TB these would be
  * multi-file partitioned datasets; nothing here assumes single-file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is physically INT64 TIMESTAMP(NANOS), which Spark 4
    // refuses by default. Read nanos as long, then floor to micros —
    // the same truncation DuckDB applies, so oracle comparisons agree.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    val df =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        // integer `div`, not `/`: nano epochs (~1.7e18) exceed double's
        // 2^53 exact range, so float division would corrupt timestamps
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    // Parquet timestamps written without isAdjustedToUTC arrive as
    // TIMESTAMP_NTZ in Spark 4. The engine's contract (and the DuckDB
    // oracle, whose naive timestamps epoch as-is) treats them as UTC
    // instants; with the session timezone pinned to UTC the cast is a
    // pure re-tag, and it keeps epoch functions (unix_micros & co.)
    // applicable regardless of which physical annotation the generator
    // used this round.
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == TimestampNTZType)
        d.withColumn(f.name, col(f.name).cast(TimestampType))
      else d
    }
  }

  /** Register every table as a temp view so `spark.sql` text queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // integer `div`, not `/`: nano epochs (~1.7e18) exceed double's
      // 2^53 exact range, so float division would corrupt timestamps
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view so `spark.sql` text queries work. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

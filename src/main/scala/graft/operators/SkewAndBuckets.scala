package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and co-location tools for the 100 TB posture (SURVEY.md §7.5):
  *
  *  - [[SaltedJoin]]: explicit key salting for joins whose key
  *    distribution is too skewed even for AQE's skew-join splitting
  *    (AQE splits oversized *partitions*; salting splits a single hot
  *    *key* across `saltFactor` reducers). The small side is replicated
  *    `saltFactor`× — cheap when it is dimension-sized.
  *
  *  - [[Bucketing]]: write both sides of a recurring large-large join
  *    bucketed by the join key so every subsequent join is shuffle-free
  *    (co-located scan → sort-merge with no Exchange).
  */
object SaltedJoin {

  /** Inner equi-join with the left (large, skewed) side salted.
    * Correctness is unchanged for any saltFactor ≥ 1: each left row
    * joins the one replica of its key's right rows that carries its
    * salt.
    */
  def inner(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}

object Bucketing {

  /** Persist `df` as a bucketed, sorted table (requires a session with
    * a warehouse dir; bucket count should match downstream
    * parallelism).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: with matched
    * bucket counts Spark plans a sort-merge join with NO Exchange on
    * either side.
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}

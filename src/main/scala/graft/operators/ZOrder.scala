package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * for scan pruning, the technique behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY`. A single-column sort gives perfect min/max pruning on
  * that column and none on any other; interleaving the bits of
  * several columns' rank-buckets orders rows along a space-filling
  * curve, so every file / parquet row group covers a small HYPERCUBE
  * of the key space and a conjunctive range predicate on ANY subset
  * of the z-columns skips most row groups via footer min/max stats.
  *
  * Shape: per column, 2¹⁶-bucket linear quantization between the
  * column's observed min/max (one tiny agg; rank-perfect balance is
  * not required — pruning only needs monotonicity and locality), then
  * a codegen'd bit-interleave into the z-value, a range repartition on
  * it (the one global shuffle any clustering write pays) and a
  * sort-within-partitions before the write. Read-side needs NOTHING
  * special: plain pushed-down range filters prune row groups through
  * the standard parquet stats path.
  *
  * Two-column interleave supports 16 bits per column (32-bit z); more
  * columns split the 32 bits evenly.
  */
object ZOrder {

  /** Codegen'd bit interleave of the given pre-bucketed int columns
    * (each in [0, 2^bitsPer)): bit j of column i lands at position
    * j·n + i of the z-value.
    */
  private def interleave(buckets: Seq[Column], bitsPer: Int): Column = {
    val n = buckets.length
    val terms = for {
      (b, i) <- buckets.zipWithIndex
      j <- 0 until bitsPer
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The column's monotone numeric image. `cast(date AS double)` is
    * NULL in Spark (it would silently bucket every row to 0 — no
    * clustering at all), so dates go through their day number and
    * timestamps through epoch seconds; plain numerics cast directly.
    */
  private def numericized(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types.{DateType, TimestampType, TimestampNTZType}
    df.schema(c).dataType match {
      case DateType => unix_date(col(c)).cast("double")
      case TimestampType | TimestampNTZType => col(c).cast("double")
      case _ => col(c).cast("double")
    }
  }

  /** The z-value column for `cols`, bucketing each numericized column
    * linearly between the supplied (min, max) bounds.
    */
  private def zValue(numCols: Seq[(Column, (Double, Double))],
      bits: Int): Column = {
    val bitsPer = bits / numCols.length
    val nb = (1L << bitsPer) - 1
    val buckets = numCols.map { case (nc, (mn, mx)) =>
      val span = if (mx > mn) mx - mn else 1.0
      least(greatest(
        floor((nc - lit(mn)) / lit(span) * nb).cast("long"),
        lit(0L)), lit(nb))
    }
    interleave(buckets, bitsPer)
  }

  /** Write `df` at `path` clustered along the z-curve of `cols`
    * (numeric, date, or timestamp). `files` bounds the layout's file
    * count — at 100 TB set it so files land near the row-group/HDFS-
    * block sweet spot; pruning granularity is the row group either
    * way. Fails loud (not NPE, not a silent no-op layout) when a
    * z-column has no non-null values to bound.
    */
  def write(df: DataFrame, cols: Seq[String], path: String,
      files: Int = 16, bits: Int = 32): Unit = {
    require(cols.nonEmpty && bits / cols.length >= 1,
      s"need >= 1 bit per column: ${cols.length} cols, $bits bits")
    val numd = cols.map(c => c -> numericized(df, c)).toMap
    val b = df.agg(
      cols.flatMap(c => Seq(min(numd(c)).as(s"_mn_$c"),
        max(numd(c)).as(s"_mx_$c"))).head,
      cols.flatMap(c => Seq(min(numd(c)).as(s"_mn_$c"),
        max(numd(c)).as(s"_mx_$c"))).tail: _*).head()
    cols.foreach { c =>
      require(!b.isNullAt(b.fieldIndex(s"_mn_$c")),
        s"ZOrder.write: z-column '$c' has no non-null values " +
          "(empty input, or the column is entirely null) — no z-bounds exist")
    }
    val bounds = cols.map(c =>
      numd(c) -> (b.getAs[Double](s"_mn_$c"), b.getAs[Double](s"_mx_$c")))
    df.withColumn("_z", zValue(bounds, bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Build-once-per-(JVM, cacheKey) z-ordered layout (the
    * [[graft.etl.SearchIndex.cachedIndex]] discipline): repeated
    * gate/bench invocations read the same layout instead of paying the
    * clustering shuffle each call; the directory is removed on JVM
    * exit.
    */
  def cachedLayout(spark: org.apache.spark.sql.SparkSession, cacheKey: String,
      cols: Seq[String], files: Int = 16, watch: Seq[String] = Nil)(
      df: => DataFrame): String =
    graft.sources.ArtifactCache.cachedDir(spark,
      cacheKey + cols.mkString("#", ",", ""), watch, "graft_zorder")(
      dir => write(df, cols, dir, files))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Exact interval (range) join via banding — the scale path for
  * point-in-interval joins where NEITHER side broadcasts. Spark plans a
  * raw `pt >= lo && pt < hi` join as a broadcast-nested-loop or
  * cartesian product: fine for a 5-row band table (q16), quadratic
  * death for events × promo-windows at 100 TB.
  *
  * Banding makes it an equi-join: pick a band width W; every point
  * belongs to exactly one band `floor(pt/W)`; every interval replicates
  * to the `floor(lo/W) .. floor(hi/W)` bands it overlaps. A qualifying
  * (point, interval) pair shares exactly ONE band — the point's — so an
  * equi-join on band plus the residual predicate is exact with no
  * dedup. Cost: interval side grows by ≈ span/W rows (choose W near the
  * median interval span — [[suggestWidth]] measures it), and the join
  * itself is a plain key shuffle that sort-merges, AQE-skew-splits and
  * co-partitions like any other.
  *
  * Both numeric columns are banded through the same
  * `floor(cast(double)/W)` expression, so monotonicity (and hence the
  * exactly-one-common-band argument) holds regardless of input type;
  * the residual predicate re-checks the exact original values.
  *
  * Exactness guards (the same ones the optimizer-rule twin,
  * [[graft.plans.RangeBandJoinRewrite]], enforces by refusing
  * fractional types outright):
  *
  *  - '''Non-finite interval bounds are refused''', with an in-job
  *    `raise_error` — no extra validation pass. A NaN or +Infinity
  *    `hi` means `pt < hi` holds for every finite point under Spark's
  *    NaN-greatest ordering, but its floor cannot enumerate bands —
  *    banding would silently drop all of that interval's matches (and
  *    ±Infinity would try to materialize ~2⁶³ band rows). Cap
  *    open-ended intervals at the domain max first. Non-finite POINTS
  *    need no guard: a point lands in at most one band and the
  *    residual predicate re-checks it, so the result stays exact.
  *  - '''Reversed intervals (lo > hi) band to an empty array''' —
  *    original semantics: matches nothing — instead of feeding
  *    `sequence` a descending range that manufactures junk join rows
  *    for the residual filter to discard.
  *
  * Contract: `hi` is exclusive (`[lo, hi)`), intervals must be bounded,
  * and the two inputs must not share column names (same rule as any
  * join).
  */
object RangeBandJoin {

  def join(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String, width: Double): DataFrame = {
    require(width > 0 && !width.isNaN && !width.isInfinite,
      s"band width must be positive and finite, got $width")
    def band(c: Column) =
      floor(c.cast("double") / lit(width)).cast("long")

    // refuse non-finite fractional bounds at scan time (integral and
    // decimal bounds cannot be non-finite — skip the check)
    def finiteOrFail(name: String): Column = {
      val c = col(name)
      intervals.schema(name).dataType match {
        case FloatType | DoubleType =>
          val d = c.cast("double")
          when(isnan(d) || abs(d) === lit(Double.PositiveInfinity),
            raise_error(concat(
              lit(s"RangeBandJoin: non-finite interval bound $name="),
              d.cast("string"),
              lit(" cannot be banded; cap open-ended intervals at the domain max first"))))
            .otherwise(c)
        case _ => c
      }
    }

    val p = points.withColumn("_band", band(col(ptCol)))
    val bLo = band(finiteOrFail(loCol))
    val bHi = band(finiteOrFail(hiCol))
    val iv = intervals.withColumn("_band",
      explode(when(bLo <= bHi, sequence(bLo, bHi))
        .otherwise(array().cast("array<bigint>"))))
    p.join(iv, Seq("_band"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("_band")
  }

  /** [[join]] with the band width inferred from the data: the sampled
    * median interval span (see [[suggestWidth]]).
    */
  def join(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String): DataFrame =
    join(points, intervals, ptCol, loCol, hiCol,
      suggestWidth(intervals, loCol, hiCol))

  /** Measured band-width suggestion: the median interval span `hi - lo`
    * (Greenwald–Khanna approximate quantile, 1% relative error) over a
    * deterministic sample of the interval side. The median is the
    * sweet spot the scaladoc above argues for: replication factor
    * ≈ span/W, so W at the median keeps the typical interval on 1–2
    * bands while a W at the MEAN would let a few huge outlier spans
    * drag every small interval into needless replication.
    * Degenerate/empty inputs (no finite positive span) fall back to
    * 1.0. Also the statistic behind
    * `spark.graft.rangeJoin.bandWidth` — compute once, set the conf,
    * and the opt-in optimizer rule uses it for declarative joins.
    *
    * @param sampleFraction fraction of intervals to sample (seeded,
    *   without replacement); 1.0 scans all — at 100 TB pass ~0.01 so
    *   the one-pass quantile sketch reads a manageable slice.
    */
  def suggestWidth(intervals: DataFrame, loCol: String, hiCol: String,
      sampleFraction: Double = 1.0, seed: Long = 42L): Double = {
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val sampled =
      if (sampleFraction >= 1.0) intervals
      else intervals.sample(withReplacement = false, sampleFraction, seed)
    val spans = sampled
      .select((col(hiCol).cast(DoubleType) - col(loCol).cast(DoubleType)).as("span"))
      .filter(col("span").isNotNull && !isnan(col("span")) &&
        col("span") > 0 && col("span") < lit(Double.PositiveInfinity))
    val q = spans.stat.approxQuantile("span", Array(0.5), 0.01)
    if (q.isEmpty) 1.0 else q(0)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * median interval span); the join itself is a plain key shuffle that
  * sort-merges, AQE-skew-splits and co-partitions like any other.
  *
  * Both numeric columns are banded through the same
  * `floor(cast(double)/W)` expression, so monotonicity (and hence the
  * exactly-one-common-band argument) holds regardless of input type;
  * the residual predicate re-checks the exact original values.
  *
  * Contract: `hi` is exclusive (`[lo, hi)`), intervals must be bounded
  * (an open-ended interval would replicate without limit — cap it at
  * the domain max first), fractional bounds must be finite (a NaN/±Inf
  * bound cannot be banded — the optimizer-rule form,
  * [[graft.plans.RangeBandJoinRewrite]], refuses fractional types
  * entirely for this reason), and the two inputs must not share column
  * names (same rule as any join).
  */
object RangeBandJoin {

  def join(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String, width: Double): DataFrame = {
    require(width > 0, s"band width must be positive, got $width")
    def band(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / lit(width)).cast("long")

    val p = points.withColumn("_band", band(col(ptCol)))
    val iv = intervals.withColumn("_band",
      explode(sequence(band(col(loCol)), band(col(hiCol)))))
    p.join(iv, Seq("_band"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("_band")
  }
}

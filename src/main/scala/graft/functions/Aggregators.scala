package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregates (SURVEY.md §2.5 A7 / §2.11): the
  * `Aggregator[IN, BUF, OUT]` path for metrics Spark lacks as
  * built-ins. Buffers are tiny and mergeable, so Spark runs these with
  * the normal partial/final split — map-side combine included.
  */
object Aggregators {

  /** Exact sum of squares over a double column, carried in BigDecimal
    * so the result is engine-exact (inputs rounded to 2 decimals first,
    * like the engine's `dsum` convention). The building block of
    * variance/energy metrics.
    */
  object SumOfSquares extends Aggregator[Double, JBigDecimal, Double] {
    override def zero: JBigDecimal = JBigDecimal.ZERO
    override def reduce(buf: JBigDecimal, x: Double): JBigDecimal = {
      // valueOf (shortest decimal representation) matches Spark's
      // double→decimal cast; new BigDecimal(x) would round the exact
      // binary expansion and disagree on values like 0.285
      val d = JBigDecimal.valueOf(x).setScale(2, java.math.RoundingMode.HALF_UP)
      buf.add(d.multiply(d))
    }
    override def merge(a: JBigDecimal, b: JBigDecimal): JBigDecimal = a.add(b)
    override def finish(buf: JBigDecimal): Double = buf.doubleValue()
    override def bufferEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Exact k-smallest values per group as a sorted array — a typed
    * bounded-heap aggregate (OpenSearch `top_hits`-shaped). Buffer is
    * ≤ k values, so partials stay tiny through map-side combine;
    * commutative and deterministic, hence oracle-checkable.
    */
  final class SmallestK(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    override def zero: Seq[Double] = Vector.empty
    override def reduce(buf: Seq[Double], x: Double): Seq[Double] =
      (buf :+ x).sorted.take(k)
    override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
      (a ++ b).sorted.take(k)
    override def finish(buf: Seq[Double]): Seq[Double] = buf
    override def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Exact k-smallest `(key, id)` pairs per group, ordered by (key, id)
    * — the fixed-size-per-stratum sampler's aggregate. The window
    * alternative (`row_number` partitioned by stratum) funnels every
    * row of a stratum through one reducer; this buffer keeps ≤ k pairs
    * through map-side combine, so shuffle volume is
    * `partitions × strata × k` regardless of stratum size — the shape
    * that survives a 100 TB stratum. Commutative (ties impossible:
    * ids are distinct) and deterministic, hence oracle-checkable.
    */
  /** The geo_line track heap (r14, VERDICT r13 #2): the first `k`
    * (sort, lat, lon) triples in the bucket's total order — `asc` the
    * natural lexicographic tuple order, `desc` its full reverse
    * (exactly `sort_array(..., asc=false)`'s reversed struct order,
    * ties on the sort value breaking by lat then lon either way).
    * Replaces `sort_array(collect_list(...))` + `slice`: that shape
    * materializes the WHOLE bucket's track before truncating — a hot
    * entity with 10⁸ points at scale builds a multi-GB single row.
    * This buffer never exceeds 2k triples: rows append in O(1) and the
    * buffer compacts (sort + take k) at 2k, so per-row cost is
    * amortized O(log k) and per-bucket state is O(k) through map-side
    * combine, shuffle, and merge. Input rows arrive as (ok, sort, lat,
    * lon) — `ok` false marks gated/NULL rows to skip (a NULL tuple
    * cannot ride a primitive-typed udaf input). The sort value rides
    * as DOUBLE (exact for the |v| ≤ 2⁵³ fixture/date range; the
    * compile path documents the cast). Commutative and deterministic
    * (duplicate triples are interchangeable), hence oracle-checkable —
    * q374 replays byte-identical.
    */
  final class TopKTrack(k: Int, asc: Boolean)
      extends Aggregator[(Boolean, Double, Double, Double),
        Seq[(Double, Double, Double)], (Seq[Double], Seq[Double])] {
    private val ord: Ordering[(Double, Double, Double)] = {
      val nat = implicitly[Ordering[(Double, Double, Double)]]
      if (asc) nat else nat.reverse
    }
    override def zero: Seq[(Double, Double, Double)] = Vector.empty
    override def reduce(buf: Seq[(Double, Double, Double)],
        x: (Boolean, Double, Double, Double)): Seq[(Double, Double, Double)] =
      if (!x._1) buf
      else {
        val grown = buf :+ ((x._2, x._3, x._4))
        if (grown.length >= 2 * k) grown.sorted(ord).take(k) else grown
      }
    override def merge(a: Seq[(Double, Double, Double)],
        b: Seq[(Double, Double, Double)]): Seq[(Double, Double, Double)] =
      (a ++ b).sorted(ord).take(k)
    override def finish(buf: Seq[(Double, Double, Double)]): (Seq[Double], Seq[Double]) = {
      val t = buf.sorted(ord).take(k)
      (t.map(_._2), t.map(_._3))
    }
    override def bufferEncoder: Encoder[Seq[(Double, Double, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Double, Double)]]()
    override def outputEncoder: Encoder[(Seq[Double], Seq[Double])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Seq[Double])]()
  }

  final class SmallestKByKey(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    private val ord = implicitly[Ordering[(Long, Long)]]
    override def zero: Seq[(Long, Long)] = Vector.empty
    override def reduce(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
      if (buf.length == k && ord.lteq(buf.last, x)) buf
      else (buf :+ x).sorted.take(k)
    override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      (a ++ b).sorted.take(k)
    override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }
}

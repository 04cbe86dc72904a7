package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Grid aggs over doc SHAPES (r15, VERDICT r14 #4): quantizer parity
  * with the point arm, index-range cell truth on axis-aligned
  * fixtures, per-cell doc_count semantics, the poison raises, and the
  * 100k cell-enumeration cap.
  */
class GeoGridShapeSpec extends SparkSpec {
  import spark.implicits._

  private def square(cx: Double, cy: Double, rh: Double) =
    s"""array(struct(CAST($cx - $rh AS DOUBLE) AS lat, CAST($cy - $rh AS DOUBLE) AS lon),
              struct(CAST($cx - $rh AS DOUBLE) AS lat, CAST($cy + $rh AS DOUBLE) AS lon),
              struct(CAST($cx + $rh AS DOUBLE) AS lat, CAST($cy + $rh AS DOUBLE) AS lon),
              struct(CAST($cx + $rh AS DOUBLE) AS lat, CAST($cy - $rh AS DOUBLE) AS lon))"""

  // the point-agg quantizer, re-derived for truth construction
  private def quant(v: Double, off: Double, span: Double, bits: Int): Long = {
    val n = (1L << bits).toDouble
    math.min(math.max(math.floor((v + off) / span * n), 0.0), n - 1).toLong
  }

  test("degenerate point shape lands in the point agg's own cell") {
    val t = Seq(Tuple1(1L)).toDF("id")
      .withColumn("pts", expr(
        """array(struct(CAST(12.3407 AS DOUBLE) AS lat, CAST(45.6709 AS DOUBLE) AS lon))"""))
      .withColumn("plat", lit(12.3407)).withColumn("plon", lit(45.6709))
    def key(req: String): String = QueryDsl.search(t, req).collect().head.getString(0)
    val viaShape = key(
      """{"size": 0, "aggs": {"g": {"geohash_grid": {
           "doc_shape": {"type": "multipoint", "points_field": "pts"},
           "precision": 5}}}}""")
    val viaPoint = key(
      """{"size": 0, "aggs": {"g": {"geohash_grid": {
           "lat_field": "plat", "lon_field": "plon", "precision": 5}}}}""")
    assert(viaShape === viaPoint)
    val tileShape = key(
      """{"size": 0, "aggs": {"g": {"geotile_grid": {
           "doc_shape": {"type": "multipoint", "points_field": "pts"},
           "precision": 9}}}}""")
    val tilePoint = key(
      """{"size": 0, "aggs": {"g": {"geotile_grid": {
           "lat_field": "plat", "lon_field": "plon", "precision": 9}}}}""")
    assert(tileShape === tilePoint)
  }

  test("a square buckets into exactly its index-range cells; counts overlay") {
    // two overlapping squares: every cell of A's range counts A, the
    // shared cells count both
    val t = Seq((1L, 10.0007, 20.0009, 2.0), (2L, 10.5003, 20.5001, 2.0))
      .toDF("id", "cx", "cy", "rh")
      .withColumn("ring", expr(
        """array(struct(cx - rh AS lat, cy - rh AS lon),
                 struct(cx - rh AS lat, cy + rh AS lon),
                 struct(cx + rh AS lat, cy + rh AS lon),
                 struct(cx + rh AS lat, cy - rh AS lon))"""))
    val got = QueryDsl.search(t,
      """{"size": 0, "aggs": {"g": {"geohash_grid": {
           "doc_shape": {"type": "polygon", "ring_field": "ring"},
           "precision": 3}}}}""")
      .as[(String, Long)].collect().toMap
    // truth: precision 3 → 15 bits, lon 8 bits / lat 7 bits; a square
    // covers the full index rectangle of its bbox (bbox == shape)
    def cells(cx: Double, cy: Double, rh: Double): Set[(Long, Long)] =
      (for (ix <- quant(cy - rh, 180, 360, 8) to quant(cy + rh, 180, 360, 8);
            iy <- quant(cx - rh, 90, 180, 7) to quant(cx + rh, 90, 180, 7))
        yield (ix, iy)).toSet
    val a = cells(10.0007, 20.0009, 2.0)
    val b = cells(10.5003, 20.5001, 2.0)
    val want = (a ++ b).map(c => (c, (if (a(c)) 1L else 0L) + (if (b(c)) 1L else 0L)))
    assert(got.values.sum === want.toSeq.map(_._2).sum)
    assert(got.size === (a ++ b).size)
    // spot-check the per-cell counts through the engine's own point
    // quantizer: a cell fully inside A∩B must count 2
    val shared = a.intersect(b)
    assert(shared.nonEmpty)
    assert(got.count(_._2 == 2L) === shared.size)
  }

  test("geotile doc shapes: the square's tile rectangle, z/x/y keys") {
    val t = Seq(Tuple1(1L)).toDF("id")
      .withColumn("ring", expr(square(40.0007, -70.0009, 1.5)))
    val got = QueryDsl.search(t,
      """{"size": 0, "aggs": {"g": {"geotile_grid": {
           "doc_shape": {"type": "polygon", "ring_field": "ring"},
           "precision": 8}}}}""")
      .as[(String, Long)].collect().toSeq
    val n = 1L << 8
    def mercY(lat: Double): Long = {
      val latC = math.min(math.max(lat, -85.05112878), 85.05112878)
      val latRad = latC * (math.Pi / 180.0)
      val m = (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0
      math.min(math.max(math.floor(m * n.toDouble), 0.0), (n - 1).toDouble).toLong
    }
    val xs = quant(-70.0009 - 1.5, 180, 360, 8) to quant(-70.0009 + 1.5, 180, 360, 8)
    val ys = mercY(40.0007 + 1.5) to mercY(40.0007 - 1.5)
    val want = (for (x <- xs; y <- ys) yield s"8/$x/$y").toSet
    assert(got.map(_._1).toSet === want)
    assert(got.forall(_._2 == 1L))
  }

  test("dirty drops, poison raises, the cell cap raises") {
    val dirt = Seq(Tuple1(1L)).toDF("id").withColumn("ring", expr(
      "CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)"))
    assert(QueryDsl.search(dirt,
      """{"size": 0, "aggs": {"g": {"geohash_grid": {
           "doc_shape": {"type": "polygon", "ring_field": "ring"},
           "precision": 4}}}}""").count() === 0L)
    val bow = Seq(Tuple1(1L)).toDF("id").withColumn("ring", expr(
      """array(struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
               struct(CAST(4.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
               struct(CAST(0.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
               struct(CAST(4.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon))"""))
    val e1 = intercept[Throwable](QueryDsl.search(bow,
      """{"size": 0, "aggs": {"g": {"geohash_grid": {
           "doc_shape": {"type": "polygon", "ring_field": "ring"},
           "precision": 4}}}}""").collect())
    assert(e1.getMessage.contains("self-intersecting"), e1.getMessage)
    // a hemisphere-sized square at precision 9 wants millions of cells
    val big = Seq(Tuple1(1L)).toDF("id")
      .withColumn("ring", expr(square(0.0007, 0.0009, 80.0)))
    val e2 = intercept[Throwable](QueryDsl.search(big,
      """{"size": 0, "aggs": {"g": {"geohash_grid": {
           "doc_shape": {"type": "polygon", "ring_field": "ring"},
           "precision": 9}}}}""").collect())
    assert(e2.getMessage.contains("enumeration cap"), e2.getMessage)
    // unknown keys and the lat/lon mix fail loud
    val e3 = intercept[IllegalArgumentException](QueryDsl.search(big,
      """{"size": 0, "aggs": {"g": {"geohash_grid": {
           "doc_shape": {"type": "polygon", "ring_field": "ring"},
           "lat_field": "x", "precision": 4}}}}""").collect())
    assert(e3.getMessage.contains("doc_shape replaces"), e3.getMessage)
  }

  test("an L-shaped ring skips the cells of its empty quadrant") {
    // L covering [0,4]x[0,8] minus the open quadrant (4,8]x... — an
    // axis-aligned concave ring: the kernel's rect test must EXCLUDE
    // the bbox cells in the notch (candidate != intersecting)
    val t = Seq(Tuple1(1L)).toDF("id").withColumn("ring", expr(
      """array(struct(CAST(0.2003 AS DOUBLE) AS lat, CAST(0.2001 AS DOUBLE) AS lon),
               struct(CAST(0.2003 AS DOUBLE) AS lat, CAST(15.8009 AS DOUBLE) AS lon),
               struct(CAST(7.8007 AS DOUBLE) AS lat, CAST(15.8009 AS DOUBLE) AS lon),
               struct(CAST(7.8007 AS DOUBLE) AS lat, CAST(12.2001 AS DOUBLE) AS lon),
               struct(CAST(3.8003 AS DOUBLE) AS lat, CAST(12.2001 AS DOUBLE) AS lon),
               struct(CAST(3.8003 AS DOUBLE) AS lat, CAST(0.2001 AS DOUBLE) AS lon))"""))
    // precision 2 → lon 5 bits (11.25°/cell), lat 5 bits (5.625°/cell):
    // bbox covers a 2x2 cell rectangle; the notch's upper-left cell
    // (lat in [5.625, 11.25), lon in [0, 11.25)) misses the L — its
    // upper arm starts at lon 12.2, past the cell's right edge
    val got = QueryDsl.search(t,
      """{"size": 0, "aggs": {"g": {"geohash_grid": {
           "doc_shape": {"type": "polygon", "ring_field": "ring"},
           "precision": 2}}}}""")
      .as[(String, Long)].collect().toSeq
    assert(got.size === 3, got.mkString(","))
  }
}

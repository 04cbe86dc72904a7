package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The r14 geo relations (VERDICT r13 #3/#4/#7): polygon-query
  * relations beyond `within` on polygon-family docs, circle query
  * shapes on every doc kind, and the multilinestring / multipoint doc
  * kinds. Truth is hand-derived on axis-aligned fixtures (Chebyshev /
  * interval algebra) — never the engine's own walk.
  */
class GeoRelateSpec extends SparkSpec {
  import spark.implicits._

  // axis-aligned square rings: |lat-cx| ∨ |lon-cy| = R (Chebyshev balls)
  private def square(cx: Double, cy: Double, r: Double): String =
    s"""[[${cy - r}, ${cx - r}], [${cy + r}, ${cx - r}], [${cy + r}, ${cx + r}],
        [${cy - r}, ${cx + r}], [${cy - r}, ${cx - r}]]"""

  // one doc: square ring centered (0,0), R=5
  private def docSquare = Seq(Tuple1(1L)).toDF("id").withColumn("ring", expr(
    """array(struct(CAST(-5.0 AS DOUBLE) AS lat, CAST(-5.0 AS DOUBLE) AS lon),
             struct(CAST(-5.0 AS DOUBLE) AS lat, CAST(5.0 AS DOUBLE) AS lon),
             struct(CAST(5.0 AS DOUBLE) AS lat, CAST(5.0 AS DOUBLE) AS lon),
             struct(CAST(5.0 AS DOUBLE) AS lat, CAST(-5.0 AS DOUBLE) AS lon))"""))

  // a frame doc: shell R=10, hole R=4, centered (0,0)
  private def docFrame = Seq(Tuple1(1L)).toDF("id").withColumn("rings", expr(
    """array(
         array(struct(CAST(-10.0 AS DOUBLE) AS lat, CAST(-10.0 AS DOUBLE) AS lon),
               struct(CAST(-10.0 AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon),
               struct(CAST(10.0 AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon),
               struct(CAST(10.0 AS DOUBLE) AS lat, CAST(-10.0 AS DOUBLE) AS lon)),
         array(struct(CAST(-4.0 AS DOUBLE) AS lat, CAST(-4.0 AS DOUBLE) AS lon),
               struct(CAST(-4.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
               struct(CAST(4.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
               struct(CAST(4.0 AS DOUBLE) AS lat, CAST(-4.0 AS DOUBLE) AS lon)))"""))

  private def hits(docs: org.apache.spark.sql.DataFrame, dsType: String,
      field: String, shape: String, rel: String): Long =
    QueryDsl.search(docs,
      s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "$dsType", "${field}": "${
        if (dsType == "polygon" && field == "rings_field") "rings" else "ring"}"},
           "shape": $shape, "relation": "$rel"}},
          "size": 10, "_source": ["id"]}""").count()

  private def polyHits(shape: String, rel: String): Boolean =
    QueryDsl.search(docSquare,
      s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "polygon", "ring_field": "ring"},
           "shape": $shape, "relation": "$rel"}},
          "size": 10, "_source": ["id"]}""").count() == 1L

  private def frameHits(shape: String, rel: String): Boolean =
    QueryDsl.search(docFrame,
      s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "polygon", "rings_field": "rings"},
           "shape": $shape, "relation": "$rel"}},
          "size": 10, "_source": ["id"]}""").count() == 1L

  test("polygon query vs polygon doc: the full relation matrix") {
    def q(j: String) = s"""{"type": "polygon", "coordinates": [$j]}"""
    // query inside the doc square
    val inside = q(square(0, 0, 2))
    assert(polyHits(inside, "intersects"))
    assert(polyHits(inside, "contains"))
    assert(!polyHits(inside, "within"))
    assert(!polyHits(inside, "disjoint"))
    // query swallowing the doc square
    val outside = q(square(0, 0, 20))
    assert(polyHits(outside, "intersects"))
    assert(polyHits(outside, "within"))
    assert(!polyHits(outside, "contains"))
    assert(!polyHits(outside, "disjoint"))
    // far-away query
    val far = q(square(40, 0, 2))
    assert(polyHits(far, "disjoint"))
    assert(!polyHits(far, "intersects"))
    assert(!polyHits(far, "within"))
    assert(!polyHits(far, "contains"))
    // partial overlap across the doc corner
    val overlap = q(square(4.5, 4.5, 2))
    assert(polyHits(overlap, "intersects"))
    assert(!polyHits(overlap, "within"))
    assert(!polyHits(overlap, "contains"))
    assert(!polyHits(overlap, "disjoint"))
    // edge-crossing-only overlap: a thin tall query spanning the doc
    // vertically — no doc vertex inside it, no query vertex inside the
    // doc... query verts at lat ±20, lon ∈ [-1, 1]: outside doc; doc
    // verts at |lon| = 5: outside query; edges cross
    val spike = q(square(0, 0, 0).replace("[", "").take(0) +
      s"""[[-1.0, -20.0], [1.0, -20.0], [1.0, 20.0], [-1.0, 20.0], [-1.0, -20.0]]""")
    assert(polyHits(spike, "intersects"))
    assert(!polyHits(spike, "within"))
    assert(!polyHits(spike, "contains"))
  }

  test("concave query polygon relations") {
    // a chevron (concave) whose notch straddles the doc square's top:
    // vertices (lat, lon): (6,-8) (14,-8) (14,8) (6,8) (12,0) — the
    // notch dips to lat 6 above the doc (doc top at lat 5): disjoint
    val chevron = """{"type": "polygon", "coordinates":
      [[[-8.0, 6.0], [-8.0, 14.0], [8.0, 14.0], [8.0, 6.0], [0.0, 12.0],
        [-8.0, 6.0]]]}"""
    assert(polyHits(chevron, "disjoint"))
    // the same chevron shifted down (lat 1..9, notch apex at lat 7):
    // its arms dip over the doc's top corners — at lon 5 the chevron
    // spans lat 3.25..9 vs the doc's -5..5, so the doc corner (5,5)
    // sits inside the chevron and the slanted edges cross the doc
    val chevLow = """{"type": "polygon", "coordinates":
      [[[-8.0, 1.0], [-8.0, 9.0], [8.0, 9.0], [8.0, 1.0], [0.0, 7.0],
        [-8.0, 1.0]]]}"""
    assert(polyHits(chevLow, "intersects"))
    assert(!polyHits(chevLow, "within"))
    assert(!polyHits(chevLow, "contains"))
  }

  test("query polygon with a hole: the hole is not part of the region") {
    // shell R=20 with hole R=8: the doc square (R=5) sits INSIDE the
    // hole — fully outside the region
    val frameQ = s"""{"type": "polygon", "coordinates":
      [${square(0, 0, 20)}, ${square(0, 0, 8)}]}"""
    assert(polyHits(frameQ, "disjoint"))
    assert(!polyHits(frameQ, "within"))
    assert(!polyHits(frameQ, "intersects"))
    // shell R=20 with a SMALL hole R=2 strictly inside the doc: the
    // doc is NOT within the query (the hole pokes into it) — the
    // query-vertex-in-doc guard catches what vertex membership and
    // crossing tests alone would miss
    val holed = s"""{"type": "polygon", "coordinates":
      [${square(0, 0, 20)}, ${square(0, 0, 2)}]}"""
    assert(!polyHits(holed, "within"))
    assert(polyHits(holed, "intersects"))
    assert(!polyHits(holed, "contains"))
  }

  test("polygon query vs rings doc (frame): holes on BOTH sides") {
    // query square R=2 inside the doc frame's HOLE: disjoint
    val inHole = s"""{"type": "polygon", "coordinates": [${square(0, 0, 2)}]}"""
    assert(frameHits(inHole, "disjoint"))
    assert(!frameHits(inHole, "contains"))
    assert(!frameHits(inHole, "intersects"))
    // query square R=6: spans the hole boundary — intersects the
    // annulus but is not contained (the doc hole ring pokes into it)
    val spanning = s"""{"type": "polygon", "coordinates": [${square(0, 0, 6)}]}"""
    assert(frameHits(spanning, "intersects"))
    assert(!frameHits(spanning, "contains"))
    assert(!frameHits(spanning, "within"))
    // a query square strictly inside the annulus band: contained
    val inBand = s"""{"type": "polygon", "coordinates": [${square(0, 7, 1)}]}"""
    assert(frameHits(inBand, "contains"))
    assert(frameHits(inBand, "intersects"))
    // the frame within a swallowing query
    val big = s"""{"type": "polygon", "coordinates": [${square(0, 0, 30)}]}"""
    assert(frameHits(big, "within"))
    // multipolygon query: the doc must contain EVERY island for
    // contains; one island in the hole breaks it
    val twoIslands = s"""{"type": "multipolygon", "coordinates":
      [[${square(0, 7, 1)}], [${square(0, 0, 1)}]]}"""
    assert(!frameHits(twoIslands, "contains"))
    assert(frameHits(twoIslands, "intersects"))
    val bandIslands = s"""{"type": "multipolygon", "coordinates":
      [[${square(0, 7, 1)}], [${square(0, -7, 1)}]]}"""
    assert(frameHits(bandIslands, "contains"))
  }

  test("circle vs polygon docs: intersects/within/contains/disjoint") {
    // equatorial geometry: doc square edges at lon ±5; circle center
    // (lat 0, lon 10) — closest boundary point (0, 5), distance = the
    // pinned haversine of a pure 5°-lon equatorial separation
    def rad(d: Double) = d * math.Pi / 180.0
    val dEdge = 12742.0176 * math.asin(math.sqrt(
      math.cos(0.0) * math.cos(0.0) * math.pow(math.sin(rad(5.0) / 2), 2)))
    def circle(cLat: Double, cLon: Double, rKm: Double) =
      s"""{"type": "circle", "coordinates": [$cLon, $cLat],
           "radius": "${rKm}km"}"""
    assert(polyHits(circle(0, 10, dEdge + 5), "intersects"))
    assert(!polyHits(circle(0, 10, dEdge + 5), "within"))
    assert(!polyHits(circle(0, 10, dEdge + 5), "contains"))
    assert(polyHits(circle(0, 10, dEdge - 5), "disjoint"))
    // center inside, small radius: doc contains the circle
    assert(polyHits(circle(0, 0, 50), "contains"))
    assert(polyHits(circle(0, 0, 50), "intersects"))
    assert(!polyHits(circle(0, 0, 50), "within"))
    // center inside but radius past the nearest edge: no longer contained
    assert(!polyHits(circle(0, 0, dEdge + 200), "contains"))
    // doc within a big circle: all vertices within r — corner (5,5)
    // is the farthest vertex; 1000 km clears it comfortably
    assert(polyHits(circle(0, 0, 1000), "within"))
    // circle entirely inside the FRAME doc's hole: disjoint; poking
    // past the hole edge: intersects (annulus boundary reached)
    val dHole = 12742.0176 * math.asin(math.sqrt(
      math.cos(0.0) * math.cos(0.0) * math.pow(math.sin(rad(4.0) / 2), 2)))
    assert(frameHits(circle(0, 0, dHole - 5), "disjoint"))
    assert(frameHits(circle(0, 0, dHole + 5), "intersects"))
    assert(!frameHits(circle(0, 0, dHole + 5), "contains"))
    // circle in the annulus band, clear of both boundaries: contained
    assert(frameHits(circle(0, 7, 10), "contains"))
  }

  test("circle vs linestring and multipoint docs") {
    def rad(d: Double) = d * math.Pi / 180.0
    def eqKm(dLon: Double) = 12742.0176 * math.asin(math.sqrt(
      math.pow(math.sin(rad(dLon) / 2), 2)))
    // an equatorial segment lon 0..10 at lat 0
    val line = Seq(Tuple1(1L)).toDF("id").withColumn("path", expr(
      """array(struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
               struct(CAST(0.0 AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon))"""))
    def lineHits(shape: String, rel: String): Boolean =
      QueryDsl.search(line, s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "linestring", "line_field": "path"},
           "shape": $shape, "relation": "$rel"}},
          "size": 10, "_source": ["id"]}""").count() == 1L
    def circle(cLat: Double, cLon: Double, rKm: Double) =
      s"""{"type": "circle", "coordinates": [$cLon, $cLat],
           "radius": "${rKm}km"}"""
    // center (0, 15): closest point is the endpoint (0, 10), 5° away
    assert(lineHits(circle(0, 15, eqKm(5) + 5), "intersects"))
    assert(lineHits(circle(0, 15, eqKm(5) - 5), "disjoint"))
    // center (0, 5): ON the line (clamped interior point) — distance 0
    assert(lineHits(circle(0, 5, 1), "intersects"))
    // within: farthest vertex from (0, 5) is 5° away
    assert(lineHits(circle(0, 5, eqKm(5) + 5), "within"))
    assert(!lineHits(circle(0, 5, eqKm(5) - 5), "within"))
    // a line cannot contain a disk
    val e = intercept[IllegalArgumentException](lineHits(circle(0, 5, 1), "contains"))
    assert(e.getMessage.contains("cannot contain a positive-radius circle"))

    val mpts = Seq(Tuple1(1L)).toDF("id").withColumn("pts", expr(
      """array(struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
               struct(CAST(0.0 AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon))"""))
    def mpHits(shape: String, rel: String): Boolean =
      QueryDsl.search(mpts, s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "multipoint", "points_field": "pts"},
           "shape": $shape, "relation": "$rel"}},
          "size": 10, "_source": ["id"]}""").count() == 1L
    assert(mpHits(circle(0, 0, 10), "intersects"))
    assert(!mpHits(circle(0, 0, 10), "within"))      // the (0,10) point is far
    assert(mpHits(circle(0, 5, eqKm(5) + 5), "within"))
    assert(mpHits(circle(0, 20, eqKm(10) - 5), "disjoint"))
  }

  test("multilinestring and multipoint docs vs boxes") {
    // two disjoint equatorial segments: lat 0 lon 0..10, lat 20 lon 0..10
    val ml = Seq(Tuple1(1L)).toDF("id").withColumn("paths", expr(
      """array(
           array(struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
                 struct(CAST(0.0 AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon)),
           array(struct(CAST(20.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
                 struct(CAST(20.0 AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon)))"""))
    def mlHits(shape: String, rel: String): Boolean =
      QueryDsl.search(ml, s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "multilinestring", "lines_field": "paths"},
           "shape": $shape, "relation": "$rel"}},
          "size": 10, "_source": ["id"]}""").count() == 1L
    def env(latT: Double, latB: Double, lonL: Double, lonR: Double) =
      s"""{"type": "envelope", "coordinates": [[$lonL, $latT], [$lonR, $latB]]}"""
    // a box crossing only the SECOND component (the gap matters)
    assert(mlHits(env(21.0, 19.0, 4.0, 6.0), "intersects"))
    // a box in the gap between the tracks: disjoint
    assert(mlHits(env(11.0, 9.0, 4.0, 6.0), "disjoint"))
    // within needs EVERY component inside
    assert(mlHits(env(25.0, -5.0, -1.0, 11.0), "within"))
    assert(!mlHits(env(5.0, -5.0, -1.0, 11.0), "within"))
    // contains: only a zero-area query, a point ON one of the lines
    assert(mlHits("""{"type": "point", "coordinates": [5.0, 20.0]}""", "contains"))
    val e = intercept[IllegalArgumentException](
      mlHits(env(1.0, -1.0, 1.0, 2.0), "contains"))
    assert(e.getMessage.contains("zero-area"), e.getMessage)

    // multipoint membership: any / all / exact-point contains
    val mp = Seq(Tuple1(1L)).toDF("id").withColumn("pts", expr(
      """array(struct(CAST(1.0 AS DOUBLE) AS lat, CAST(1.0 AS DOUBLE) AS lon),
               struct(CAST(9.0 AS DOUBLE) AS lat, CAST(9.0 AS DOUBLE) AS lon))"""))
    def mpHits(shape: String, rel: String): Boolean =
      QueryDsl.search(mp, s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "multipoint", "points_field": "pts"},
           "shape": $shape, "relation": "$rel"}},
          "size": 10, "_source": ["id"]}""").count() == 1L
    assert(mpHits(env(2.0, 0.0, 0.0, 2.0), "intersects"))
    assert(!mpHits(env(2.0, 0.0, 0.0, 2.0), "within"))
    assert(mpHits(env(10.0, 0.0, 0.0, 10.0), "within"))
    assert(mpHits("""{"type": "point", "coordinates": [9.0, 9.0]}""", "contains"))
    assert(!mpHits("""{"type": "point", "coordinates": [5.0, 5.0]}""", "contains"))
    // dirt drops: a NULL coordinate inside one point
    val dirty = Seq(Tuple1(1L)).toDF("id").withColumn("pts", expr(
      """array(struct(CAST(NULL AS DOUBLE) AS lat, CAST(1.0 AS DOUBLE) AS lon))"""))
    assert(QueryDsl.search(dirty, """{"query": {"geo_shape": {
        "doc_shape": {"type": "multipoint", "points_field": "pts"},
        "shape": {"type": "point", "coordinates": [1.0, 1.0]},
        "relation": "intersects"}}, "size": 10, "_source": ["id"]}""")
      .count() === 0L)
  }

  test("geometrycollection docs: mixed components compose per kind") {
    // one row: a square polygon [0..10]^2, a horizontal track at lat 20
    // lon 0..10, and a bare point at (30, 30)
    val coll = Seq(Tuple1(1L)).toDF("id").withColumn("shapes", expr(
      """array(
           struct('polygon' AS kind, array(array(
             struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
             struct(CAST(0.0 AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon),
             struct(CAST(10.0 AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon),
             struct(CAST(10.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon))) AS pts),
           struct('linestring' AS kind, array(array(
             struct(CAST(20.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
             struct(CAST(20.0 AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon))) AS pts),
           struct('point' AS kind, array(array(
             struct(CAST(30.0 AS DOUBLE) AS lat, CAST(30.0 AS DOUBLE) AS lon))) AS pts))"""))
    def hits(shape: String, rel: String, mode: String = "raise"): Boolean =
      QueryDsl.search(coll, s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "geometrycollection",
                         "shapes_field": "shapes", "on_invalid": "$mode"},
           "shape": $shape, "relation": "$rel"}},
          "size": 10, "_source": ["id"]}""").count() == 1L
    def env(latT: Double, latB: Double, lonL: Double, lonR: Double) =
      s"""{"type": "envelope", "coordinates": [[$lonL, $latT], [$lonR, $latB]]}"""
    // a box touching ONLY the line; only the point; only the polygon
    assert(hits(env(21.0, 19.0, 4.0, 6.0), "intersects"))
    assert(hits(env(31.0, 29.0, 29.0, 31.0), "intersects"))
    assert(hits(env(5.0, 3.0, 3.0, 5.0), "intersects"))
    // a box between everything: disjoint
    assert(hits(env(15.0, 13.0, 4.0, 6.0), "disjoint"))
    // within needs EVERY component inside
    assert(hits(env(40.0, -5.0, -5.0, 40.0), "within"))
    assert(!hits(env(25.0, -5.0, -5.0, 40.0), "within")) // point outside
    // contains: the polygon holds interior points; a point ON the line
    // and the exact bare point count for zero-area queries; an area box
    // only the polygon can hold
    assert(hits("""{"type": "point", "coordinates": [5.0, 5.0]}""", "contains"))
    assert(hits("""{"type": "point", "coordinates": [5.0, 20.0]}""", "contains"))
    assert(hits("""{"type": "point", "coordinates": [30.0, 30.0]}""", "contains"))
    assert(!hits("""{"type": "point", "coordinates": [50.0, 50.0]}""", "contains"))
    assert(hits(env(6.0, 4.0, 4.0, 6.0), "contains"))       // inside the square
    assert(!hits(env(20.5, 19.5, 4.0, 6.0), "contains"))    // around the line only
    // circle: contains via the polygon; intersects via the nearest track
    val rKm = 12742.0176 * math.asin(math.sin(1.0 * math.Pi / 180.0 / 2.0))
    assert(hits(s"""{"type": "circle", "coordinates": [5.0, 5.0],
         "radius": "${rKm}km"}""", "contains"))
    assert(hits(s"""{"type": "circle", "coordinates": [5.0, 20.5],
         "radius": "${rKm + 5}km"}""", "intersects"))
    // an unknown component kind raises; dlq mode drops + side-outputs
    val bad = Seq(Tuple1(9L)).toDF("id").withColumn("shapes", expr(
      """array(struct('blob' AS kind, array(array(
           struct(CAST(1.0 AS DOUBLE) AS lat, CAST(1.0 AS DOUBLE) AS lon))) AS pts))"""))
    val e = intercept[Throwable](QueryDsl.search(bad, s"""{"query": {"geo_shape": {
        "doc_shape": {"type": "geometrycollection", "shapes_field": "shapes"},
        "shape": ${env(2.0, 0.0, 0.0, 2.0)}, "relation": "intersects"}},
        "size": 10, "_source": ["id"]}""").collect())
    assert(e.getMessage.contains("component kind"), e.getMessage)
    assert(QueryDsl.search(bad, s"""{"query": {"geo_shape": {
        "doc_shape": {"type": "geometrycollection", "shapes_field": "shapes",
                      "on_invalid": "dlq"},
        "shape": ${env(2.0, 0.0, 0.0, 2.0)}, "relation": "intersects"}},
        "size": 10, "_source": ["id"]}""").count() === 0L)
    val dlq = QueryDsl.geoShapeCollectionDlq(bad, "shapes")
      .select(col("_reason")).as[String].collect().toSeq
    assert(dlq === Seq("unknown_kind"))
    // a self-crossing polygon component is poison; dirt drops
    val bow = Seq(Tuple1(8L)).toDF("id").withColumn("shapes", expr(
      """array(struct('polygon' AS kind, array(array(
           struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
           struct(CAST(4.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
           struct(CAST(0.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
           struct(CAST(4.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon))) AS pts))"""))
    assert(QueryDsl.geoShapeCollectionDlq(bow, "shapes")
      .select(col("_reason")).as[String].collect().toSeq ===
      Seq("self_intersecting"))
    val dirt = Seq(Tuple1(7L)).toDF("id").withColumn("shapes", expr(
      """array(struct('point' AS kind, array(array(
           struct(CAST(NULL AS DOUBLE) AS lat, CAST(1.0 AS DOUBLE) AS lon))) AS pts))"""))
    assert(QueryDsl.search(dirt, s"""{"query": {"geo_shape": {
        "doc_shape": {"type": "geometrycollection", "shapes_field": "shapes"},
        "shape": ${env(2.0, 0.0, 0.0, 2.0)}, "relation": "intersects"}},
        "size": 10, "_source": ["id"]}""").count() === 0L)
    assert(QueryDsl.geoShapeCollectionDlq(dirt, "shapes").count() === 0L)
  }

  test("collection point component with several chains: every vertex counts") {
    // the parse admits a 'point' component carrying SEVERAL single-vertex
    // chains; every vertex must participate in the relation — evaluating
    // only chain 0 would silently ignore (40, 40) below
    val coll = Seq(Tuple1(1L)).toDF("id").withColumn("shapes", expr(
      """array(struct('point' AS kind, array(
           array(struct(CAST(30.0 AS DOUBLE) AS lat, CAST(30.0 AS DOUBLE) AS lon)),
           array(struct(CAST(40.0 AS DOUBLE) AS lat, CAST(40.0 AS DOUBLE) AS lon))) AS pts))"""))
    def hits(shape: String, rel: String): Boolean =
      QueryDsl.search(coll, s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "geometrycollection", "shapes_field": "shapes"},
           "shape": $shape, "relation": "$rel"}},
          "size": 10, "_source": ["id"]}""").count() == 1L
    def env(latT: Double, latB: Double, lonL: Double, lonR: Double) =
      s"""{"type": "envelope", "coordinates": [[$lonL, $latT], [$lonR, $latB]]}"""
    // a box around ONLY the second point intersects (and is not disjoint)
    assert(hits(env(41.0, 39.0, 39.0, 41.0), "intersects"))
    assert(!hits(env(41.0, 39.0, 39.0, 41.0), "disjoint"))
    // within needs EVERY vertex inside: a box holding only (30,30) fails
    assert(!hits(env(31.0, 29.0, 29.0, 31.0), "within"))
    assert(hits(env(41.0, 29.0, 29.0, 41.0), "within"))
    // contains: the exact second point counts for a zero-area query
    assert(hits("""{"type": "point", "coordinates": [40.0, 40.0]}""", "contains"))
    assert(!hits("""{"type": "point", "coordinates": [35.0, 35.0]}""", "contains"))
  }

  test("query-side geometrycollection over point docs: OR of components") {
    val docs = (for (la <- -2 to 30; lo <- -2 to 30)
      yield (la + 0.4003, lo + 0.3001)).toDF("plat", "plon")
    def run(shape: String, rel: String = "intersects") = QueryDsl.search(docs,
      s"""{"query": {"geo_shape": {"lat_field": "plat", "lon_field": "plon",
           "shape": $shape, "relation": "$rel"}},
          "sort": ["plat", "plon"], "size": 2000,
          "_source": ["plat", "plon"]}""")
      .as[(Double, Double)].collect().toSeq
    // components: a square polygon [0..5]^2, a circle at (20, 20), an
    // envelope lat [10,12] lon [0,2]
    def rad(d: Double) = d * math.Pi / 180.0
    val rKm = 12742.0176 * math.asin(math.sin(rad(1.6) / 2))
    val coll = s"""{"type": "geometrycollection", "geometries": [
        {"type": "polygon", "coordinates":
          [[[0.0, 0.0], [5.0, 0.0], [5.0, 5.0], [0.0, 5.0], [0.0, 0.0]]]},
        {"type": "circle", "coordinates": [20.0, 20.0], "radius": "${rKm}km"},
        {"type": "envelope", "coordinates": [[0.0, 12.0], [2.0, 10.0]]}]}"""
    val got = run(coll)
    // the union must equal the OR of the three per-component runs
    val p1 = run("""{"type": "polygon", "coordinates":
        [[[0.0, 0.0], [5.0, 0.0], [5.0, 5.0], [0.0, 5.0], [0.0, 0.0]]]}""")
    val p2 = run(s"""{"type": "circle", "coordinates": [20.0, 20.0],
        "radius": "${rKm}km"}""")
    val p3 = run("""{"type": "envelope", "coordinates": [[0.0, 12.0], [2.0, 10.0]]}""")
    assert(p1.nonEmpty && p2.nonEmpty && p3.nonEmpty)
    assert(got === (p1 ++ p2 ++ p3).distinct.sorted)
    // disjoint is the exact complement
    val dis = run(coll, "disjoint")
    assert(dis.size + got.size === 33 * 33)
    // contains: a point holds the collection only by holding EVERY
    // component — two identical point components: true; adding an
    // area component: false
    val la = 3.4003; val lo = 5.3001
    val twoPts = s"""{"type": "geometrycollection", "geometries": [
        {"type": "point", "coordinates": [$lo, $la]},
        {"type": "point", "coordinates": [$lo, $la]}]}"""
    assert(run(twoPts, "contains") === Seq((la, lo)))
    val mixed = s"""{"type": "geometrycollection", "geometries": [
        {"type": "point", "coordinates": [$lo, $la]},
        {"type": "polygon", "coordinates":
          [[[0.0, 0.0], [5.0, 0.0], [5.0, 5.0], [0.0, 5.0], [0.0, 0.0]]]}]}"""
    assert(run(mixed, "contains") === Seq.empty)
    // nesting and malformed geometries fail loud
    def bad(shape: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](run(shape))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"type": "geometrycollection", "geometries": [
        {"type": "geometrycollection", "geometries": []}]}""", "does not nest")
    bad("""{"type": "geometrycollection", "geometries": []}""",
      "non-empty geometries")
    bad("""{"type": "geometrycollection", "coordinates": [0, 0]}""",
      "unsupported geo_shape shape option")
  }

  test("circle vs envelope docs: corner/clamp algebra, all four relations") {
    def rad(d: Double) = d * math.Pi / 180.0
    def eqKm(dLon: Double) = 12742.0176 * math.asin(math.sqrt(
      math.pow(math.sin(rad(dLon) / 2), 2)))
    // one equatorial box: lat [-2, 2], lon [10, 20]
    val box = Seq((1L, -2.0, 2.0, 10.0, 20.0))
      .toDF("id", "lat0", "lat1", "lon0", "lon1")
    def hits(shape: String, rel: String): Boolean =
      QueryDsl.search(box, s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "envelope",
             "lat_min_field": "lat0", "lat_max_field": "lat1",
             "lon_min_field": "lon0", "lon_max_field": "lon1"},
           "shape": $shape, "relation": "$rel"}},
          "size": 10, "_source": ["id"]}""").count() == 1L
    def circle(cLat: Double, cLon: Double, rKm: Double) =
      s"""{"type": "circle", "coordinates": [$cLon, $cLat],
           "radius": "${rKm}km"}"""
    // center (0, 25): clamp = (0, 20), 5 deg of equatorial lon away
    assert(hits(circle(0, 25, eqKm(5) + 5), "intersects"))
    assert(hits(circle(0, 25, eqKm(5) - 5), "disjoint"))
    // center inside: contains while the radius clears no edge...
    // nearest edge is lat +-2 (~222 km) from (0, 15)
    assert(hits(circle(0, 15, 100), "contains"))
    assert(!hits(circle(0, 15, eqKm(2) + 150), "contains"))
    assert(hits(circle(0, 15, 100), "intersects"))
    // within: the farthest corner from (0, 15) is (+-2, 10/20)
    assert(hits(circle(0, 15, 800), "within"))
    assert(!hits(circle(0, 15, 300), "within"))
    // NULL corner drops the row (tri-state)
    val dirty = Seq((2L, Option.empty[Double], Some(2.0), Some(10.0), Some(20.0)))
      .toDF("id", "lat0", "lat1", "lon0", "lon1")
    def dirtyHits(shape: String, rel: String): Long =
      QueryDsl.search(dirty, s"""{"query": {"geo_shape": {
        "doc_shape": {"type": "envelope",
          "lat_min_field": "lat0", "lat_max_field": "lat1",
          "lon_min_field": "lon0", "lon_max_field": "lon1"},
        "shape": $shape, "relation": "$rel"}},
        "size": 10, "_source": ["id"]}""").count()
    assert(dirtyHits(circle(0, 15, 5000), "intersects") === 0L)
    // ...including the negative relations, where a bare NULL && false
    // would collapse and let the row MATCH via !false
    assert(dirtyHits(circle(0, 15, 5000), "disjoint") === 0L)
    assert(dirtyHits("""{"type": "envelope",
        "coordinates": [[100.0, 50.0], [110.0, 40.0]]}""", "disjoint") === 0L)
  }
}

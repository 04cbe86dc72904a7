package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The r13 doc_shape extensions: multi-ring polygons (holes) via the
  * flattened-edge even-odd walk, and open linestrings. Truth is
  * hand-derived on axis-aligned fixtures (Chebyshev algebra), never
  * the engine's own walk.
  */
class GeoDocShapesSpec extends SparkSpec {
  import spark.implicits._

  // a square FRAME per row: shell side 2R, hole side 2h, centered (cx, cy)
  private def frames = Seq(
    // id, cx, cy, R, h
    (1L, 0.0, 0.0, 10.0, 4.0),
    (2L, 30.0, 0.0, 6.0, 2.0),
    (3L, 0.0, 40.0, 8.0, 7.0)
  ).toDF("id", "cx", "cy", "rr", "h")
    .withColumn("rings", expr(
      """array(
           array(struct(cx - rr AS lat, cy - rr AS lon),
                 struct(cx - rr AS lat, cy + rr AS lon),
                 struct(cx + rr AS lat, cy + rr AS lon),
                 struct(cx + rr AS lat, cy - rr AS lon)),
           array(struct(cx - h AS lat, cy - h AS lon),
                 struct(cx - h AS lat, cy + h AS lon),
                 struct(cx + h AS lat, cy + h AS lon),
                 struct(cx + h AS lat, cy - h AS lon)))"""))

  private def runFrames(shape: String, rel: String) = QueryDsl.search(frames,
    s"""{"query": {"geo_shape": {
         "doc_shape": {"type": "polygon", "rings_field": "rings"},
         "shape": $shape, "relation": "$rel"}},
        "sort": ["id"], "size": 10, "_source": ["id"]}""")
    .as[Long].collect().toSeq

  test("contains point: inside the shell but NOT inside the hole") {
    // (0.5, 5.0003): Chebyshev from center 1 = 5.0003 -> between h=4
    // and R=10 -> frame 1 contains it; frame 2/3 centers far away
    assert(runFrames("""{"type": "point", "coordinates": [5.0003, 0.5]}""",
      "contains") === Seq(1L))
    // (0.5, 2.0003): Chebyshev 2.0003 < h=4 -> inside the hole -> nobody
    assert(runFrames("""{"type": "point", "coordinates": [2.0003, 0.5]}""",
      "contains") === Seq.empty)
  }

  test("intersects box: hole-only overlap is NOT an intersection") {
    // box strictly inside frame 1's hole: [-3,3]x[-3,3] (h = 4)
    assert(runFrames(
      """{"type": "envelope", "coordinates": [[-3.0001, 3.0001], [3.0001, -3.0001]]}""",
      "intersects") === Seq.empty)
    // box straddling frame 1's hole boundary: [3, 5] reaches the frame
    assert(runFrames(
      """{"type": "envelope", "coordinates": [[3.0001, 5.0001], [5.0001, -3.0001]]}""",
      "intersects") === Seq(1L))
    // disjoint is the exact complement
    assert(runFrames(
      """{"type": "envelope", "coordinates": [[-3.0001, 3.0001], [3.0001, -3.0001]]}""",
      "disjoint") === Seq(1L, 2L, 3L))
  }

  test("contains box: a hole poking into the box defeats containment") {
    // box inside frame 1's solid band: lat [5, 8], lon [-8, 8] crosses
    // over the hole? no - [5, 8] x [-8, 8] stays above the hole's top
    // (h = 4) and inside the shell (R = 10) -> contained
    assert(runFrames(
      """{"type": "envelope", "coordinates": [[-8.0003, 8.0001], [8.0003, 5.0001]]}""",
      "contains") === Seq(1L))
    // widen down to lat 0: now the hole pokes in -> not contained
    assert(runFrames(
      """{"type": "envelope", "coordinates": [[-8.0003, 8.0001], [8.0003, 0.0001]]}""",
      "contains") === Seq.empty)
  }

  test("within box: the whole frame inside the query box") {
    assert(runFrames(
      """{"type": "envelope", "coordinates": [[-11.0001, 11.0001], [11.0001, -11.0001]]}""",
      "within") === Seq(1L))
  }

  test("rings: dirty drops, poison raises, dlq mode side-outputs") {
    val t = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)).toDF("id", "kind")
      .withColumn("rings", expr(
        """CASE kind
             WHEN 1 THEN array(array(
               struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
               struct(CAST(0.0 AS DOUBLE) AS lat, CAST(8.0 AS DOUBLE) AS lon),
               struct(CAST(8.0 AS DOUBLE) AS lat, CAST(8.0 AS DOUBLE) AS lon)))
             WHEN 2 THEN array(array(
               struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
               struct(CAST(4.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
               struct(CAST(0.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
               struct(CAST(4.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon)))
             WHEN 3 THEN CAST(NULL AS ARRAY<ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>>)
             ELSE array(array(
               struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
               struct(CAST(1.0 AS DOUBLE) AS lat, CAST(1.0 AS DOUBLE) AS lon)))
           END"""))
    def run(mode: String) = QueryDsl.search(t,
      s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "polygon", "rings_field": "rings",
                         "on_invalid": "$mode"},
           "shape": {"type": "envelope",
                     "coordinates": [[-10.0, 10.0], [10.0, -10.0]]},
           "relation": "intersects"}},
          "sort": ["id"], "size": 10, "_source": ["id"]}""")
    intercept[Throwable](run("raise").collect()) // the kind-2 bowtie
    // dlq mode: the bowtie drops; NULL (3) and 2-vertex (4) drop as dirt
    assert(run("dlq").as[Long].collect().toSeq === Seq(1L))
    val dlq = QueryDsl.geoShapeRingsDlq(t, "rings")
      .select(col("id"), col("_reason")).as[(Long, String)].collect().toSeq
    assert(dlq === Seq((2L, "self_intersecting")))
    // a past-the-cap pair of rings is poison too (the cap counts
    // TOTAL vertices across rings, and fires before the simplicity walk)
    val big = Seq((9L, 0)).toDF("id", "z").withColumn("rings", expr(
      """array(
           transform(sequence(0, 8200), i -> struct(
             CAST(i AS DOUBLE) AS lat, CAST(i * i AS DOUBLE) AS lon)),
           transform(sequence(0, 8200), i -> struct(
             CAST(-i AS DOUBLE) AS lat, CAST(i AS DOUBLE) AS lon)))"""))
    assert(QueryDsl.geoShapeRingsDlq(big, "rings")
      .select(col("_reason")).as[String].collect().toSeq ===
      Seq("too_many_vertices"))
  }

  // L-shaped polylines: vertical (lat) leg then horizontal (lon) leg
  private def lines = Seq(
    // id, x0 (lat), y0 (lon), len
    (1L, 0.0, 0.0, 10.0),
    (2L, 50.0, 50.0, 5.0),
    (3L, -20.0, 30.0, 8.0)
  ).toDF("id", "x0", "y0", "len")
    .withColumn("path", expr(
      """array(struct(x0 AS lat, y0 AS lon),
               struct(x0 + len AS lat, y0 AS lon),
               struct(x0 + len AS lat, y0 + len AS lon))"""))

  private def runLines(shape: String, rel: String) = QueryDsl.search(lines,
    s"""{"query": {"geo_shape": {
         "doc_shape": {"type": "linestring", "line_field": "path"},
         "shape": $shape, "relation": "$rel"}},
        "sort": ["id"], "size": 10, "_source": ["id"]}""")
    .as[Long].collect().toSeq

  test("linestring intersects: a segment passing through with no vertex inside") {
    // box around (5, 0): line 1's vertical leg passes through it
    assert(runLines(
      """{"type": "envelope", "coordinates": [[-1.0001, 6.0001], [1.0001, 4.0001]]}""",
      "intersects") === Seq(1L))
    // box that no line touches
    assert(runLines(
      """{"type": "envelope", "coordinates": [[-5.0001, -2.0001], [-3.0001, -4.0001]]}""",
      "intersects") === Seq.empty)
    assert(runLines(
      """{"type": "envelope", "coordinates": [[-1.0001, 6.0001], [1.0001, 4.0001]]}""",
      "disjoint") === Seq(2L, 3L))
  }

  test("linestring within: every vertex inside the box") {
    assert(runLines(
      """{"type": "envelope", "coordinates": [[-0.0001, 10.0001], [10.0001, -0.0001]]}""",
      "within") === Seq(1L))
  }

  test("linestring contains: exact point-on-segment; area queries fail loud") {
    // (5, 0) lies ON line 1's vertical leg
    assert(runLines("""{"type": "point", "coordinates": [0.0, 5.0]}""",
      "contains") === Seq(1L))
    // (5, 0.5) is off the line
    assert(runLines("""{"type": "point", "coordinates": [0.5, 5.0]}""",
      "contains") === Seq.empty)
    val e = intercept[IllegalArgumentException](runLines(
      """{"type": "envelope", "coordinates": [[-1.0, 6.0], [1.0, 4.0]]}""",
      "contains"))
    assert(e.getMessage.contains("has no interior"), e.getMessage)
  }

  test("query-side polygon with holes: one parity sum across rings") {
    val pts = (for (la <- -10 to 10; lo <- -10 to 10)
      yield (la + 0.5, lo + 0.5)).toDF("lat", "lon")
    def run(coords: String) = QueryDsl.search(pts,
      s"""{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon",
           "shape": {"type": "polygon", "coordinates": $coords},
           "relation": "intersects"}},
          "sort": ["lat", "lon"], "size": 1000, "_source": ["lat", "lon"]}""")
      .as[(Double, Double)].collect().toSet
    // shell [-8,8]^2 with hole [-3,3]^2 (GeoJSON [lon, lat])
    val got = run(
      """[[[-8.0001, -8.0001], [8.0001, -8.0001], [8.0001, 8.0001],
          [-8.0001, 8.0001], [-8.0001, -8.0001]],
         [[-3.0001, -3.0001], [3.0001, -3.0001], [3.0001, 3.0001],
          [-3.0001, 3.0001], [-3.0001, -3.0001]]]""")
    val expected = (for (la <- -10 to 10; lo <- -10 to 10) yield (la + 0.5, lo + 0.5))
      .filter { case (la, lo) =>
        math.abs(la) < 8.0001 && math.abs(lo) < 8.0001 &&
          !(math.abs(la) < 3.0001 && math.abs(lo) < 3.0001)
      }.toSet
    assert(got === expected)
    // two holes XOR independently
    val got2 = run(
      """[[[-8.0001, -8.0001], [8.0001, -8.0001], [8.0001, 8.0001],
          [-8.0001, 8.0001], [-8.0001, -8.0001]],
         [[-6.0001, -6.0001], [-1.0001, -6.0001], [-1.0001, -1.0001],
          [-6.0001, -1.0001], [-6.0001, -6.0001]],
         [[1.0001, 1.0001], [6.0001, 1.0001], [6.0001, 6.0001],
          [1.0001, 6.0001], [1.0001, 1.0001]]]""")
    val expected2 = (for (la <- -10 to 10; lo <- -10 to 10) yield (la + 0.5, lo + 0.5))
      .filter { case (la, lo) =>
        math.abs(la) < 8.0001 && math.abs(lo) < 8.0001 &&
          !(la > -6.0001 && la < -1.0001 && lo > -6.0001 && lo < -1.0001) &&
          !(la > 1.0001 && la < 6.0001 && lo > 1.0001 && lo < 6.0001)
      }.toSet
    assert(got2 === expected2)
    // a self-intersecting hole still fails loud on the driver
    val e = intercept[IllegalArgumentException](run(
      """[[[-8.0001, -8.0001], [8.0001, -8.0001], [8.0001, 8.0001],
          [-8.0001, 8.0001], [-8.0001, -8.0001]],
         [[0.0, 0.0], [4.0, 4.0], [4.0, 0.0], [0.0, 4.0], [0.0, 0.0]]]"""))
    assert(e.getMessage.contains("self-intersecting"), e.getMessage)
    // the total-vertex cap counts across rings (16384 now that the
    // kernel walks vertices as data — VERDICT r13 #1)
    val bigRing = (0 until 16390).map { i =>
      val a = i * 2 * math.Pi / 16390
      val lo = math.rint((10 + 3 * math.cos(a)) * 10000) / 10000
      val la = math.rint(3 * math.sin(a) * 10000) / 10000
      s"[$lo, $la]"
    }
    val closed = (bigRing :+ bigRing.head).mkString("[", ", ", "]")
    val e2 = intercept[IllegalArgumentException](run(
      s"""[$closed,
          [[-8.0001, -8.0001], [8.0001, -8.0001], [8.0001, 8.0001],
           [-8.0001, 8.0001], [-8.0001, -8.0001]]]"""))
    assert(e2.getMessage.contains("16384 total vertices"), e2.getMessage)
  }

  test("multipolygon: OR of per-polygon parities, holes respected per polygon") {
    val pts = (for (la <- -10 to 10; lo <- -10 to 10)
      yield (la + 0.5, lo + 0.5)).toDF("lat", "lon")
    val got = QueryDsl.search(pts,
      """{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon",
           "shape": {"type": "multipolygon", "coordinates": [
             [[[-9.0001, -9.0001], [-1.0001, -9.0001], [-1.0001, -1.0001],
               [-9.0001, -1.0001], [-9.0001, -9.0001]],
              [[-7.0001, -7.0001], [-3.0001, -7.0001], [-3.0001, -3.0001],
               [-7.0001, -3.0001], [-7.0001, -7.0001]]],
             [[[2.0001, 2.0001], [8.0001, 2.0001], [8.0001, 8.0001],
               [2.0001, 8.0001], [2.0001, 2.0001]]]]},
           "relation": "intersects"}},
          "sort": ["lat", "lon"], "size": 1000, "_source": ["lat", "lon"]}""")
      .as[(Double, Double)].collect().toSet
    val expected = (for (la <- -10 to 10; lo <- -10 to 10) yield (la + 0.5, lo + 0.5))
      .filter { case (la, lo) =>
        (la > -9.0001 && la < -1.0001 && lo > -9.0001 && lo < -1.0001 &&
          !(la > -7.0001 && la < -3.0001 && lo > -7.0001 && lo < -3.0001)) ||
        (la > 2.0001 && la < 8.0001 && lo > 2.0001 && lo < 8.0001)
      }.toSet
    assert(got === expected)
    // contains matches nothing (a point cannot contain an area);
    // disjoint is the complement
    val n = QueryDsl.search(pts,
      """{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon",
           "shape": {"type": "multipolygon", "coordinates": [
             [[[2.0001, 2.0001], [8.0001, 2.0001], [8.0001, 8.0001],
               [2.0001, 8.0001], [2.0001, 2.0001]]]]},
           "relation": "contains"}}, "size": 1000}""").count()
    assert(n === 0L)
  }

  test("doc multipolygon: island pair — per-component parity, poison DLQ") {
    // one row: a frame (shell 10, hole 4) at the origin plus a plain
    // 4-half-side square island centered at lon 20
    val t = Seq((1L, 0)).toDF("id", "z").withColumn("polys", expr(
      """array(
           array(
             array(struct(CAST(-10.0 AS DOUBLE) AS lat, CAST(-10.0 AS DOUBLE) AS lon),
                   struct(CAST(-10.0 AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon),
                   struct(CAST(10.0 AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon),
                   struct(CAST(10.0 AS DOUBLE) AS lat, CAST(-10.0 AS DOUBLE) AS lon)),
             array(struct(CAST(-4.0 AS DOUBLE) AS lat, CAST(-4.0 AS DOUBLE) AS lon),
                   struct(CAST(-4.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
                   struct(CAST(4.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
                   struct(CAST(4.0 AS DOUBLE) AS lat, CAST(-4.0 AS DOUBLE) AS lon))),
           array(
             array(struct(CAST(-4.0 AS DOUBLE) AS lat, CAST(16.0 AS DOUBLE) AS lon),
                   struct(CAST(-4.0 AS DOUBLE) AS lat, CAST(24.0 AS DOUBLE) AS lon),
                   struct(CAST(4.0 AS DOUBLE) AS lat, CAST(24.0 AS DOUBLE) AS lon),
                   struct(CAST(4.0 AS DOUBLE) AS lat, CAST(16.0 AS DOUBLE) AS lon))))"""))
    def run(shape: String, rel: String) = QueryDsl.search(t,
      s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "multipolygon", "polys_field": "polys"},
           "shape": $shape, "relation": "$rel"}},
          "size": 10, "_source": ["id"]}""").count()
    // the island serves: a point on it is contained
    assert(run("""{"type": "point", "coordinates": [20.0003, 0.5001]}""",
      "contains") === 1L)
    // a point in the frame's hole is not
    assert(run("""{"type": "point", "coordinates": [0.5001, 0.5001]}""",
      "contains") === 0L)
    // a box over only the island intersects; a box in the hole does not
    assert(run("""{"type": "envelope", "coordinates": [[17.0001, 1.0001], [19.0001, -1.0001]]}""",
      "intersects") === 1L)
    assert(run("""{"type": "envelope", "coordinates": [[-3.0001, 3.0001], [3.0001, -3.0001]]}""",
      "intersects") === 0L)
    // within needs EVERY component inside the box
    assert(run("""{"type": "envelope", "coordinates": [[-11.0001, 11.0001], [25.0001, -11.0001]]}""",
      "within") === 1L)
    assert(run("""{"type": "envelope", "coordinates": [[-11.0001, 11.0001], [11.0001, -11.0001]]}""",
      "within") === 0L)
    // a bowtie ring anywhere raises; dlq mode drops + side-outputs
    val bow = Seq((2L, 0)).toDF("id", "z").withColumn("polys", expr(
      """array(array(
           array(struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
                 struct(CAST(4.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
                 struct(CAST(0.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
                 struct(CAST(4.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon))))"""))
    val e = intercept[Throwable](QueryDsl.search(bow,
      """{"query": {"geo_shape": {
           "doc_shape": {"type": "multipolygon", "polys_field": "polys"},
           "shape": {"type": "point", "coordinates": [1.0, 1.0]},
           "relation": "intersects"}}, "size": 10}""").collect())
    assert(e.getMessage.contains("self-intersecting"), e.getMessage)
    assert(QueryDsl.search(bow,
      """{"query": {"geo_shape": {
           "doc_shape": {"type": "multipolygon", "polys_field": "polys",
                         "on_invalid": "dlq"},
           "shape": {"type": "point", "coordinates": [1.0, 1.0]},
           "relation": "intersects"}}, "size": 10}""").count() === 0L)
    assert(QueryDsl.geoShapePolysDlq(bow, "polys")
      .select(col("_reason")).as[String].collect().toSeq ===
      Seq("self_intersecting"))
  }

  test("geo_line: sort-ordered per-bucket tracks, cap, desc, NULL skip") {
    val t = Seq(
      (1L, "a", 3L, Some(30.0), Some(3.0)),
      (2L, "a", 1L, Some(10.0), Some(1.0)),
      (3L, "a", 2L, Some(20.0), Some(2.0)),
      (4L, "a", 4L, None, Some(4.0)), // NULL lat: skipped
      (5L, "b", 9L, Some(90.0), Some(9.0)),
      (6L, "b", 8L, Some(80.0), Some(8.0))
    ).toDF("id", "grp", "seq", "lat", "lon")
    def run(extra: String) = QueryDsl.search(t,
      s"""{"size": 0, "aggs": {"g": {"terms": {"field": "grp", "size": 10},
           "aggs": {"tr": {"geo_line": {"lat_field": "lat",
             "lon_field": "lon", "sort_field": "seq"$extra}}}}}}""")
      .orderBy("g")
      .as[(String, Long, Seq[Double], Seq[Double])].collect().toSeq
    val got = run("")
    // group a: NULL-lat row skipped; points ordered by seq
    assert(got === Seq(
      ("a", 4L, Seq(10.0, 20.0, 30.0), Seq(1.0, 2.0, 3.0)),
      ("b", 2L, Seq(80.0, 90.0), Seq(8.0, 9.0))))
    // desc reverses, size truncates to the FIRST points in sort order
    val desc = run(""", "sort_order": "desc", "size": 2""")
    assert(desc.head === (("a", 4L, Seq(30.0, 20.0), Seq(3.0, 2.0))))
    def bad(extra: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](run(extra))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad(""", "sort_order": "sideways"""", "sort_order must be")
    bad(""", "size": 0""", "size must be 1-10000")
    bad(""", "geohash": 4""", "unsupported geo_line option")
  }

  test("geo_line: string sort field fails loud; date sort field converts") {
    // a string sort field would cast to NULL and coalesce to 0.0 —
    // every row a tie, the track order silently degrading to (lat, lon)
    val t = Seq(
      (1L, "a", "2024-03-02", Some(30.0), Some(3.0)),
      (2L, "a", "2024-01-01", Some(10.0), Some(1.0)),
      (3L, "a", "2024-02-15", Some(20.0), Some(2.0))
    ).toDF("id", "grp", "day", "lat", "lon")
    val e = intercept[IllegalArgumentException](QueryDsl.search(t,
      """{"size": 0, "aggs": {"g": {"terms": {"field": "grp", "size": 10},
           "aggs": {"tr": {"geo_line": {"lat_field": "lat",
             "lon_field": "lon", "sort_field": "day"}}}}}}""").collect())
    assert(e.getMessage.contains("must be numeric"), e.getMessage)
    // DATE converts explicitly (date→double is not a legal Spark cast)
    val d = t.withColumn("day", to_date(col("day")))
    val got = QueryDsl.search(d,
      """{"size": 0, "aggs": {"g": {"terms": {"field": "grp", "size": 10},
           "aggs": {"tr": {"geo_line": {"lat_field": "lat",
             "lon_field": "lon", "sort_field": "day"}}}}}}""")
      .as[(String, Long, Seq[Double], Seq[Double])].collect().toSeq
    assert(got === Seq(("a", 3L, Seq(10.0, 20.0, 30.0), Seq(1.0, 2.0, 3.0))))
  }

  test("linestring dirt drops; oversize raises") {
    val t = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "kind")
      .withColumn("path", expr(
        """CASE kind
             WHEN 1 THEN array(struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
                               struct(CAST(5.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon))
             WHEN 2 THEN array(struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon))
             ELSE CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
           END"""))
    val got = QueryDsl.search(t,
      """{"query": {"geo_shape": {
           "doc_shape": {"type": "linestring", "line_field": "path"},
           "shape": {"type": "envelope", "coordinates": [[-10.0, 10.0], [10.0, -10.0]]},
           "relation": "intersects"}},
          "sort": ["id"], "size": 10, "_source": ["id"]}""")
      .as[Long].collect().toSeq
    assert(got === Seq(1L)) // single-vertex and NULL rows drop
    val big = Seq((9L, 0)).toDF("id", "z").withColumn("path", expr(
      "transform(sequence(0, 16390), i -> struct(" +
        "CAST(i AS DOUBLE) AS lat, CAST(i * i AS DOUBLE) AS lon))"))
    val e = intercept[Throwable](QueryDsl.search(big,
      """{"query": {"geo_shape": {
           "doc_shape": {"type": "linestring", "line_field": "path"},
           "shape": {"type": "envelope", "coordinates": [[-10.0, 10.0], [10.0, -10.0]]},
           "relation": "intersects"}},
          "size": 10, "_source": ["id"]}""").collect())
    assert(e.getMessage.contains("exceeds 16384 vertices"), e.getMessage)
  }
}

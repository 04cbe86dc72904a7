package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The doc_shape POLYGON contracts: the HOF-lifted crossing walk
  * agrees with the query-side walk on the same ring, box relations
  * match hand-derived truth, dirty rings drop, wrong geometry raises.
  */
class GeoDocPolygonSpec extends SparkSpec {
  import spark.implicits._

  // a concave chevron (same family as q330's query-side fixture),
  // OPEN ring, lat/lon structs
  private val chevron = Seq(
    (0.0, 0.0), (0.0, 40.0), (40.0, 40.0), (15.0, 20.0), (40.0, 0.0))
    // (lat, lon) pairs
  private def ringSql(pts: Seq[(Double, Double)]): String =
    pts.map { case (la, lo) =>
      s"struct(CAST($la AS DOUBLE) AS lat, CAST($lo AS DOUBLE) AS lon)"
    }.mkString("array(", ", ", ")")

  test("doc-side point-in-polygon parity with the query-side crossing walk") {
    // points on a grid; truth = the QUERY-side walk (points table,
    // polygon in the request) — the doc-side walk (one-ring table,
    // point in the request) must agree point for point
    val pts = for (la <- -5 to 45 by 5; lo <- -5 to 45 by 5)
      yield (la.toDouble + 0.5, lo.toDouble + 0.5)
    val ptsDf = pts.toDF("lat", "lon")
    // GeoJSON closed ring, [lon, lat] order
    val ringJson = (chevron :+ chevron.head)
      .map { case (la, lo) => s"[$lo, $la]" }.mkString("[[", ", ", "]]")
    val querySide = QueryDsl.search(ptsDf,
      s"""{"query": {"geo_shape": {"lat_field": "lat", "lon_field": "lon",
           "shape": {"type": "polygon", "coordinates": $ringJson},
           "relation": "intersects"}},
          "sort": ["lat", "lon"], "size": 1000, "_source": ["lat", "lon"]}""")
      .as[(Double, Double)].collect().toSet
    val oneRing = spark.sql(s"SELECT ${ringSql(chevron)} AS ring")
    val docSide = pts.filter { case (la, lo) =>
      QueryDsl.search(oneRing,
        s"""{"query": {"geo_shape": {
             "doc_shape": {"type": "polygon", "ring_field": "ring"},
             "shape": {"type": "point", "coordinates": [$lo, $la]},
             "relation": "intersects"}}, "size": 5}""").count() == 1
    }.toSet
    assert(docSide === querySide)
    assert(querySide.nonEmpty && querySide.size < pts.size) // discriminates
    // contains(point) == intersects(point) for area docs off the
    // boundary: "which zones contain this point", the r13 relation
    val containsSide = pts.filter { case (la, lo) =>
      QueryDsl.search(oneRing,
        s"""{"query": {"geo_shape": {
             "doc_shape": {"type": "polygon", "ring_field": "ring"},
             "shape": {"type": "point", "coordinates": [$lo, $la]},
             "relation": "contains"}}, "size": 5}""").count() == 1
    }.toSet
    assert(containsSide === querySide)
  }

  test("within vs a concave query polygon: vertices-in AND no proper cross") {
    // the chevron again, as the QUERY shape; docs are diamonds.
    // Hand-derived truth — the notch is triangle D(15,20)-C(40,40)-
    // E(40,0): at latitude La >= 15 it spans lon 20 ± 20*(La-15)/25.
    //   1: (20,10) r=2  — deep in the left arm            -> within
    //   2: (25,20) r=2  — inside the notch (vertices out) -> not
    //   3: (10,20) r=4  — below the notch apex            -> within
    //   4: (14,12) r=10 — ALL 4 vertices inside, but edge
    //      N(24,12)->E(14,22) properly crosses notch edge D->E at
    //      s=0.2/t=0.4 — the case all-vertices-in alone gets wrong
    //   5: (20,60) r=2  — fully outside                   -> not
    val t = Seq(
      (1L, 20.0, 10.0, 2.0),
      (2L, 25.0, 20.0, 2.0),
      (3L, 10.0, 20.0, 4.0),
      (4L, 14.0, 12.0, 10.0),
      (5L, 20.0, 60.0, 2.0)
    ).toDF("id", "cla", "clo", "r").withColumn("ring", expr(
      """array(struct(cla + r AS lat, clo AS lon),
               struct(cla AS lat, clo + r AS lon),
               struct(cla - r AS lat, clo AS lon),
               struct(cla AS lat, clo - r AS lon))"""))
    val ringJson = (chevron :+ chevron.head)
      .map { case (la, lo) => s"[$lo, $la]" }.mkString("[[", ", ", "]]")
    val win = QueryDsl.search(t,
      s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "polygon", "ring_field": "ring"},
           "shape": {"type": "polygon", "coordinates": $ringJson},
           "relation": "within"}},
          "sort": ["id"], "size": 10, "_source": ["id"]}""")
      .as[Long].collect().toSeq
    assert(win === Seq(1L, 3L))
  }

  test("concave-within parity with the convex path on convex inputs") {
    // the same square query polygon twice: as given (strictly convex
    // -> half-plane forall) and with a collinear midpoint inserted
    // (defeats the strict-convexity probe -> the general concave
    // machinery) — identical matches on the diamond fixture
    val t = Seq(
      (1L, 0.0, 0.0, 2.0), (2L, 0.0, 9.0, 2.0), (3L, 0.0, 20.0, 2.0),
      (4L, 0.0, 0.0, 50.0), (5L, 12.0, 0.0, 1.0), (6L, -8.0, -8.0, 1.5)
    ).toDF("id", "cla", "clo", "r").withColumn("ring", expr(
      """array(struct(cla + r AS lat, clo AS lon),
               struct(cla AS lat, clo + r AS lon),
               struct(cla - r AS lat, clo AS lon),
               struct(cla AS lat, clo - r AS lon))"""))
    def win(ring: String): Seq[Long] = QueryDsl.search(t,
      s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "polygon", "ring_field": "ring"},
           "shape": {"type": "polygon", "coordinates": [[$ring]]},
           "relation": "within"}},
          "sort": ["id"], "size": 10, "_source": ["id"]}""")
      .as[Long].collect().toSeq
    val convex = win("""[-10.0, -10.0], [10.0, -10.0], [10.0, 10.0],
      [-10.0, 10.0], [-10.0, -10.0]""")
    val viaGeneral = win("""[-10.0, -10.0], [0.0, -10.0], [10.0, -10.0],
      [10.0, 10.0], [-10.0, 10.0], [-10.0, -10.0]""")
    assert(convex === Seq(1L, 6L))
    assert(viaGeneral === convex)
  }

  test("box relations on diamond docs match hand-derived truth") {
    // diamonds: |lat-claC| + |lon-cloC| <= r
    val t = Seq(
      (1L, 0.0, 0.0, 2.0),    // inside the box entirely
      (2L, 0.0, 9.0, 2.0),    // straddles the right edge
      (3L, 0.0, 20.0, 2.0),   // fully outside
      (4L, 0.0, 0.0, 50.0),   // swallows the box
      (5L, 12.0, 0.0, 1.0)    // above the box
    ).toDF("id", "cla", "clo", "r").withColumn("ring", expr(
      """array(struct(cla + r AS lat, clo AS lon),
               struct(cla AS lat, clo + r AS lon),
               struct(cla - r AS lat, clo AS lon),
               struct(cla AS lat, clo - r AS lon))"""))
    def ids(rel: String): Seq[Long] = QueryDsl.search(t,
      s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "polygon", "ring_field": "ring"},
           "shape": {"type": "envelope",
             "coordinates": [[-10.0, 10.0], [10.0, -10.0]]},
           "relation": "$rel"}},
          "sort": ["id"], "size": 10, "_source": ["id"]}""")
      .as[Long].collect().toSeq
    assert(ids("intersects") === Seq(1L, 2L, 4L))
    assert(ids("within") === Seq(1L))      // 2 crosses, 4 swallows
    assert(ids("disjoint") === Seq(3L, 5L))
    assert(ids("contains") === Seq(4L))    // only the swallower covers the box
    // convex-CCW query polygon, within: a big CCW square as a polygon
    val win = QueryDsl.search(t,
      """{"query": {"geo_shape": {
           "doc_shape": {"type": "polygon", "ring_field": "ring"},
           "shape": {"type": "polygon", "coordinates":
             [[[-10.0, -10.0], [10.0, -10.0], [10.0, 10.0],
               [-10.0, 10.0], [-10.0, -10.0]]]},
           "relation": "within"}},
          "sort": ["id"], "size": 10, "_source": ["id"]}""")
      .as[Long].collect().toSeq
    assert(win === Seq(1L))
  }

  test("dirty rings drop; wrong geometry raises; invalid requests fail loud") {
    val t = Seq(
      (1L, Seq((0.0, 0.0), (0.0, 4.0), (4.0, 4.0))),          // fine triangle
      (2L, Seq.empty[(Double, Double)]),                       // empty: drops
      (3L, Seq((0.0, 0.0), (1.0, 1.0)))                        // 2 vertices: drops
    ).map { case (id, ps) =>
      (id, ps.map { case (la, lo) => (la, lo) })
    }.toDF("id", "raw")
      .withColumn("ring", expr(
        "CASE WHEN size(raw) = 0 THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>) " +
          "ELSE transform(raw, p -> struct(CAST(p._1 AS DOUBLE) AS lat, CAST(p._2 AS DOUBLE) AS lon)) END"))
    def run(df: org.apache.spark.sql.DataFrame, rel: String = "intersects") =
      QueryDsl.search(df,
        s"""{"query": {"geo_shape": {
             "doc_shape": {"type": "polygon", "ring_field": "ring"},
             "shape": {"type": "envelope", "coordinates": [[-10.0, 10.0], [10.0, -10.0]]},
             "relation": "$rel"}},
            "sort": ["id"], "size": 10, "_source": ["id"]}""")
    assert(run(t).as[Long].collect().toSeq === Seq(1L)) // 2 and 3 dropped
    // a NULL lat INSIDE one vertex drops the row too — a parity walk
    // over only the non-NULL edges would fabricate a definite answer
    val nv = Seq((1L, 0)).toDF("id", "z").withColumn("ring", expr(
      """array(struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
               struct(CAST(NULL AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon),
               struct(CAST(10.0 AS DOUBLE) AS lat, CAST(10.0 AS DOUBLE) AS lon),
               struct(CAST(10.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon))"""))
    assert(run(nv).count() === 0L)
    assert(run(nv, "disjoint").count() === 0L) // tri-state, not "definitely outside"
    // a self-intersecting bowtie RAISES at runtime (a silent even-odd
    // answer over it would be plausible and wrong)
    val bow = Seq((1L, 0)).toDF("id", "z").withColumn("ring", expr(
      ringSql(Seq((0.0, 0.0), (4.0, 4.0), (0.0, 4.0), (4.0, 0.0)))))
    val e = intercept[Throwable](run(bow).collect())
    assert(e.getMessage.contains("self-intersecting"), e.getMessage)
    // a past-the-cap ring raises (GeoWalk.DefaultCap, shared with the query side)
    val big = Seq((1L, 0)).toDF("id", "z").withColumn("ring", expr(
      "transform(sequence(0, 16390), i -> struct(" +
        "CAST(i AS DOUBLE) AS lat, CAST(i * i AS DOUBLE) AS lon))"))
    val e2 = intercept[Throwable](run(big).collect())
    assert(e2.getMessage.contains("exceeds 16384 vertices"), e2.getMessage)
    // request validation
    def bad(json: String, frag: String): Unit = {
      val ex = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(ex.getMessage.contains(frag), ex.getMessage)
    }
    bad("""{"query": {"geo_shape": {
        "doc_shape": {"type": "polygon", "ring_field": "ring"},
        "shape": {"type": "polygon", "coordinates":
          [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 0.0]]]},
        "relation": "touches"}}}""", "must be intersects, within, contains or disjoint")
    // a SELF-INTERSECTING query ring still fails loud on the driver
    // even now that concave rings serve within (r13)
    bad("""{"query": {"geo_shape": {
        "doc_shape": {"type": "polygon", "ring_field": "ring"},
        "shape": {"type": "polygon", "coordinates":
          [[[0.0, 0.0], [4.0, 4.0], [4.0, 0.0], [0.0, 4.0], [0.0, 0.0]]]},
        "relation": "within"}}}""", "self-intersecting")
    bad("""{"query": {"geo_shape": {
        "doc_shape": {"type": "polygon"},
        "shape": {"type": "envelope", "coordinates": [[-10.0, 10.0], [10.0, -10.0]]}}}}""",
      "requires ring_field")
    bad("""{"query": {"geo_shape": {"lat_field": "x",
        "doc_shape": {"type": "polygon", "ring_field": "ring"},
        "shape": {"type": "envelope", "coordinates": [[-10.0, 10.0], [10.0, -10.0]]}}}}""",
      "replaces lat_field/lon_field")
  }

  test("on_invalid dlq: poison rows drop from the answer and land in the DLQ, counted") {
    // 1 clean triangle (in the box), 2 bowtie (poison), 3 oversize
    // (poison), 4 NULL ring (a DROP, not poison), 5 clean diamond
    val t = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4), (5L, 5)).toDF("id", "kind")
      .withColumn("ring", expr(
        """CASE kind
             WHEN 1 THEN array(struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
                               struct(CAST(0.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
                               struct(CAST(4.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon))
             WHEN 2 THEN array(struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
                               struct(CAST(4.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
                               struct(CAST(0.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
                               struct(CAST(4.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon))
             WHEN 3 THEN transform(sequence(0, 16390), i -> struct(
                               CAST(i AS DOUBLE) AS lat, CAST(i * i AS DOUBLE) AS lon))
             WHEN 4 THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
             ELSE array(struct(CAST(2.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
                        struct(CAST(0.0 AS DOUBLE) AS lat, CAST(2.0 AS DOUBLE) AS lon),
                        struct(CAST(-2.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
                        struct(CAST(0.0 AS DOUBLE) AS lat, CAST(-2.0 AS DOUBLE) AS lon))
           END"""))
    def run(mode: String) = QueryDsl.search(t,
      s"""{"query": {"geo_shape": {
           "doc_shape": {"type": "polygon", "ring_field": "ring",
                         "on_invalid": "$mode"},
           "shape": {"type": "envelope",
                     "coordinates": [[-10.0, 10.0], [10.0, -10.0]]},
           "relation": "intersects"}},
          "sort": ["id"], "size": 10, "_source": ["id"]}""")
    // default raises on the first poison row; dlq mode proceeds and
    // the answer equals the clean subset (ids 1, 5)
    intercept[Throwable](run("raise").collect())
    assert(run("dlq").as[Long].collect().toSeq === Seq(1L, 5L))
    // the side output carries exactly the poison rows with reasons —
    // the counted diagnostic; the NULL-ring drop is NOT dead-lettered
    val dlq = QueryDsl.geoShapeDlq(t, "ring")
      .select(col("id"), col("_reason")).orderBy(col("id"))
      .as[(Long, String)].collect().toSeq
    assert(dlq === Seq((2L, "self_intersecting"), (3L, "too_many_vertices")))
    assert(QueryDsl.geoShapeDlq(t, "ring").count() === 2L)
    // mode validation fails loud
    val ex = intercept[IllegalArgumentException](run("ignore").collect())
    assert(ex.getMessage.contains("on_invalid must be raise or dlq"))
  }
}

package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.GeoWalk

/** The r14 GeoWalk kernel pins: the JVM walks must agree exactly with
  * the Column/unrolled forms they replaced (same IEEE formulas), the
  * sweep-pruned simplicity walk must equal the direct pair walk, and
  * the circle query shape must coincide with geo_distance on point
  * docs (the ONE-haversine doctrine).
  */
class GeoWalkSpec extends SparkSpec {
  import spark.implicits._

  test("JVM haversine == the Column haversine (round semantics included)") {
    val pts = Seq((0.0, 0.0), (12.3456, -45.6789), (89.9, 179.9),
      (-33.8688, 151.2093), (0.0001, 0.0001), (47.6062, -122.3321))
    val df = pts.toDF("plat", "plon")
    val (qLat, qLon) = (48.8566, 2.3522)
    val colKm = df.select(QueryDsl.haversineKm("plat", "plon", qLat, qLon))
      .as[Double].collect().toSeq
    val jvmKm = pts.map { case (la, lo) => GeoWalk.haversineKm(la, lo, qLat, qLon) }
    assert(colKm === jvmKm)
  }

  test("haversine parity holds across a seeded random sample") {
    val rnd = new scala.util.Random(20260816L)
    def coord() = (math.rint((rnd.nextDouble() * 178 - 89) * 1000) / 1000,
      math.rint((rnd.nextDouble() * 358 - 179) * 1000) / 1000)
    val cases = Seq.fill(40)((coord(), coord()))
    cases.foreach { case ((la, lo), (qla, qlo)) =>
      val c = Seq((la, lo)).toDF("plat", "plon")
        .select(QueryDsl.haversineKm("plat", "plon", qla, qlo))
        .as[Double].head()
      assert(c === GeoWalk.haversineKm(la, lo, qla, qlo), s"($la,$lo,$qla,$qlo)")
    }
  }

  test("circle query shape == geo_distance on point docs") {
    val docs = (for (la <- -5 to 5; lo <- -5 to 5)
      yield (la * 1.0003, lo * 1.0007)).toDF("plat", "plon")
    val circle = QueryDsl.search(docs,
      """{"query": {"geo_shape": {"lat_field": "plat", "lon_field": "plon",
           "shape": {"type": "circle", "coordinates": [0.5, 0.5],
                     "radius": "300km"}}},
         "sort": ["plat", "plon"], "size": 200, "_source": ["plat", "plon"]}""")
      .as[(Double, Double)].collect().toSeq
    val dist = QueryDsl.search(docs,
      """{"query": {"geo_distance": {"lat_field": "plat", "lon_field": "plon",
           "distance_km": 300, "origin": {"lat": 0.5, "lon": 0.5}}},
         "sort": ["plat", "plon"], "size": 200, "_source": ["plat", "plon"]}""")
      .as[(Double, Double)].collect().toSeq
    assert(circle.nonEmpty && circle === dist)
    // the m-unit spelling scales to the same km
    val circleM = QueryDsl.search(docs,
      """{"query": {"geo_shape": {"lat_field": "plat", "lon_field": "plon",
           "shape": {"type": "circle", "coordinates": [0.5, 0.5],
                     "radius": "300000m"}}},
         "sort": ["plat", "plon"], "size": 200, "_source": ["plat", "plon"]}""")
      .as[(Double, Double)].collect().toSeq
    assert(circleM === circle)
  }

  test("big-shape kernel route == the unrolled walk on the same ring") {
    // one concave simple ring, run BOTH ways: 5 vertices (unrolled
    // route) vs the same ring padded past 64 vertices with collinear
    // subdivisions of its edges (kernel route) — the region is
    // identical, so membership must match on every grid point
    val base = Seq((0.0, 0.0), (10.0, 0.0), (5.0, 5.0), (10.0, 10.0), (0.0, 10.0))
    def subdivide(pts: Seq[(Double, Double)], per: Int): Seq[(Double, Double)] =
      pts.indices.flatMap { i =>
        val (aLa, aLo) = pts(i)
        val (bLa, bLo) = pts((i + 1) % pts.size)
        (0 until per).map(t =>
          (aLa + (bLa - aLa) * t / per, aLo + (bLo - aLo) * t / per))
      }
    val fine = subdivide(base, 16) // 80 vertices -> kernel route
    def ringJson(pts: Seq[(Double, Double)]): String =
      (pts :+ pts.head).map { case (la, lo) => s"[$lo, $la]" }
        .mkString("[[", ", ", "]]")
    val docs = (for (la <- -2 to 12; lo <- -2 to 12)
      yield (la + 0.4567, lo + 0.3211)).toDF("plat", "plon")
    def ids(ring: String) = QueryDsl.search(docs,
      s"""{"query": {"geo_shape": {"lat_field": "plat", "lon_field": "plon",
           "shape": {"type": "polygon", "coordinates": $ring}}},
          "sort": ["plat", "plon"], "size": 500, "_source": ["plat", "plon"]}""")
      .as[(Double, Double)].collect().toSeq
    val coarse = ids(ringJson(base))
    val kernel = ids(ringJson(fine))
    assert(coarse.nonEmpty && kernel === coarse)
  }

  test("sweep-pruned simplicity == the direct pair walk") {
    val rnd = new scala.util.Random(424242L)
    def randomRing(): Array[Double] = {
      val n = 4 + rnd.nextInt(37)
      Array.fill(2 * n)((rnd.nextInt(21) - 10).toDouble)
    }
    def direct(ring: Array[Double]): Boolean = {
      // the historical unpruned pair walk, re-derived independently
      val n = ring.length / 2
      def v(i: Int) = (ring(2 * (i % n)), ring(2 * (i % n) + 1))
      def sgn(x: Double) = if (x > 0) 1 else if (x < 0) -1 else 0
      def orient(a: (Double, Double), b: (Double, Double), c: (Double, Double)) =
        sgn((b._2 - a._2) * (c._1 - a._1) - (b._1 - a._1) * (c._2 - a._2))
      def onSeg(a: (Double, Double), b: (Double, Double), p: (Double, Double)) =
        p._2 >= math.min(a._2, b._2) && p._2 <= math.max(a._2, b._2) &&
          p._1 >= math.min(a._1, b._1) && p._1 <= math.max(a._1, b._1)
      def segX(p1: (Double, Double), p2: (Double, Double),
          q1: (Double, Double), q2: (Double, Double)): Boolean = {
        val (o1, o2) = (orient(p1, p2, q1), orient(p1, p2, q2))
        val (o3, o4) = (orient(q1, q2, p1), orient(q1, q2, p2))
        (o1 * o2 < 0 && o3 * o4 < 0) ||
          (o1 == 0 && onSeg(p1, p2, q1)) || (o2 == 0 && onSeg(p1, p2, q2)) ||
          (o3 == 0 && onSeg(q1, q2, p1)) || (o4 == 0 && onSeg(q1, q2, p2))
      }
      (0 until n).exists(i => (i + 2 until n).exists { j =>
        val adjacent = j == i + 1 || (i == 0 && j == n - 1)
        !adjacent && segX(v(i), v(i + 1), v(j), v(j + 1))
      })
    }
    (0 until 300).foreach { i =>
      val ring = randomRing()
      assert(GeoWalk.ringSelfIntersects(ring) === direct(ring),
        s"case $i: ${ring.mkString(",")}")
    }
    // and the sweep branch itself (>128 vertices): a fine-subdivided
    // simple star stays simple; swapping two vertices breaks it
    val star = (0 until 200).flatMap { i =>
      val a = i * 2 * math.Pi / 200
      val r = if (i % 2 == 0) 10.0 else 6.0
      Seq(math.rint(r * math.sin(a) * 10000) / 10000,
        math.rint(r * math.cos(a) * 10000) / 10000)
    }.toArray
    assert(!GeoWalk.ringSelfIntersects(star))
    val broken = star.clone()
    // swap vertex 10 and vertex 100 (lat+lon pairs)
    Array(0, 1).foreach { d =>
      val t = broken(20 + d); broken(20 + d) = broken(200 + d); broken(200 + d) = t
    }
    assert(GeoWalk.ringSelfIntersects(broken))
  }

  test("query shapes compare by content (Catalyst canonicalization)") {
    // Array fields default to reference equality — two semantically
    // identical shapes (query clause + DLQ twin) must compare equal or
    // expression canonicalization / subexpression dedup never fires
    import graft.plans.{GeoPolysShape, GeoRegionShape}
    def ring() = Array(Array(0.0, 0.0, 0.0, 4.0, 4.0, 4.0, 4.0, 0.0))
    assert(GeoRegionShape(ring()) === GeoRegionShape(ring()))
    assert(GeoRegionShape(ring()).hashCode === GeoRegionShape(ring()).hashCode)
    assert(GeoRegionShape(ring()) !== GeoRegionShape(
      Array(Array(0.0, 0.0, 0.0, 4.0, 4.0, 4.0, 4.0, 1.0))))
    assert(GeoPolysShape(Array(ring())) === GeoPolysShape(Array(ring())))
    assert(GeoPolysShape(Array(ring())).hashCode ===
      GeoPolysShape(Array(ring())).hashCode)
    // and the expressions carrying them canonicalize identically
    import org.apache.spark.sql.functions.col
    val ds = Seq(Tuple1(1L)).toDF("id").withColumn("ring",
      org.apache.spark.sql.functions.expr(
        """array(struct(CAST(1.0 AS DOUBLE) AS lat, CAST(1.0 AS DOUBLE) AS lon),
                 struct(CAST(1.0 AS DOUBLE) AS lat, CAST(2.0 AS DOUBLE) AS lon),
                 struct(CAST(2.0 AS DOUBLE) AS lat, CAST(2.0 AS DOUBLE) AS lon))"""))
    val plan = ds.select(col("ring")).queryExecution.analyzed
    val attr = plan.output.head
    def mk() = graft.plans.GeoDocRelate(attr, "polygon",
      GeoRegionShape(ring()), "intersects", 16384)
    assert(mk().canonicalized === mk().canonicalized)
  }

  test("doc geometry columns with dots address the literal column") {
    // col(gf) without backticks would resolve "geo.ring" as a nested
    // path; the compile must address the literal top-level column
    val t = Seq(Tuple1(1L)).toDF("id").withColumn("ring", expr(
      """array(struct(CAST(0.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon),
               struct(CAST(0.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
               struct(CAST(4.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon),
               struct(CAST(4.0 AS DOUBLE) AS lat, CAST(0.0 AS DOUBLE) AS lon))"""))
      .withColumnRenamed("ring", "geo.ring")
    assert(QueryDsl.search(t,
      """{"query": {"geo_shape": {
           "doc_shape": {"type": "polygon", "ring_field": "geo.ring"},
           "shape": {"type": "point", "coordinates": [1.0, 1.0]},
           "relation": "intersects"}}, "size": 10, "_source": ["id"]}""")
      .count() === 1L)
    // the DLQ view addresses the same literal column
    assert(QueryDsl.geoShapeDlq(t, "geo.ring").count() === 0L)
  }
}

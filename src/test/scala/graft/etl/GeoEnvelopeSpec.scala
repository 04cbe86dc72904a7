package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.search.QueryDsl

/** The geo bbox + validity sidecar (r15, VERDICT r14 #1): materialize
  * semantics, query parity with the sidecar pre-filter across every
  * relation and query-shape kind, the PushedFilters plan pin, the
  * measured rows-materialized cut, and CDC-merge composition.
  */
class GeoEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(flatten) ++ (p match {
        case q: QueryStageExec => flatten(q.plan)
        case _ => Nil
      }))
    flatten(root).collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numOutputRows").value).sum
  }

  // square rings on a key-scattered lattice, with dirty / poison mixes
  private def ringDocs(n: Int): DataFrame =
    spark.range(1, n + 1).toDF("id")
      .withColumn("cx", expr("CAST((id * 2654435761) % 16000 AS DOUBLE) / 100 - 80"))
      .withColumn("cy", expr("CAST((id * 40503 + 7) % 34000 AS DOUBLE) / 100 - 170"))
      .withColumn("ring", expr(
        """CASE WHEN id % 11 = 0
             THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
           WHEN id % 13 = 0
             THEN array(struct(CAST(1.0 AS DOUBLE) AS lat, CAST(2.0 AS DOUBLE) AS lon),
                        struct(CAST(3.0 AS DOUBLE) AS lat, CAST(4.0 AS DOUBLE) AS lon))
           WHEN id % 17 = 0
             THEN array(struct(cx AS lat, cy AS lon),
                        struct(cx + 2.0 AS lat, cy + 2.0 AS lon),
                        struct(cx AS lat, cy + 2.0 AS lon),
                        struct(cx + 2.0 AS lat, cy AS lon))
           ELSE array(struct(cx AS lat, cy AS lon),
                      struct(cx AS lat, cy + 2.0 AS lon),
                      struct(cx + 2.0 AS lat, cy + 2.0 AS lon),
                      struct(cx + 2.0 AS lat, cy AS lon)) END"""))

  test("materialize: vertex extent, dirty NULLs, poison validity") {
    val m = GeoEnvelope.materialize(ringDocs(200), "ring", "polygon")
    val rows = m.select("id", "lat_min", "lat_max", "lon_min", "lon_max",
      "_geo_valid").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 11 == 0 || id % 13 == 0) {
        // dirty: NULL geometry / too-few vertices → all five NULL
        assert((1 to 5).forall(r.isNullAt), s"id=$id should be all-NULL")
      } else {
        val cx = ((id * 2654435761L) % 16000).toDouble / 100 - 80
        val cy = ((id * 40503 + 7) % 34000).toDouble / 100 - 170
        assert(r.getDouble(1) === cx && r.getDouble(2) === cx + 2.0, s"id=$id lat")
        assert(r.getDouble(3) === cy && r.getDouble(4) === cy + 2.0, s"id=$id lon")
        // the %17 bowtie is POISON: honest extent, _geo_valid false
        assert(r.getBoolean(5) === (id % 17 != 0), s"id=$id validity")
      }
    }
    // oversize is poison too (cap BEFORE the simplicity walk)
    val big = Seq(Tuple1(1L)).toDF("id").withColumn("ring", expr(
      "transform(sequence(0, 16390), i -> struct(" +
        "CAST(i AS DOUBLE) AS lat, CAST(i * i AS DOUBLE) AS lon))"))
    val bigRow = GeoEnvelope.materialize(big, "ring", "polygon")
      .select("_geo_valid").head()
    assert(bigRow.getBoolean(0) === false)
    // collection bad kind: no trustworthy extent — NULL corners + false
    val badKind = Seq(Tuple1(1L)).toDF("id").withColumn("shapes", expr(
      """array(struct('blob' AS kind, array(array(
           struct(CAST(1.0 AS DOUBLE) AS lat, CAST(1.0 AS DOUBLE) AS lon))) AS pts))"""))
    val bk = GeoEnvelope.materialize(badKind, "shapes", "geometrycollection")
      .select("lat_min", "_geo_valid").head()
    assert(bk.isNullAt(0) && bk.getBoolean(1) === false)
    // collision fails loud; a prefix namespaces
    val e = intercept[IllegalArgumentException](
      GeoEnvelope.materialize(m, "ring", "polygon"))
    assert(e.getMessage.contains("already exists"), e.getMessage)
    val pre = GeoEnvelope.materialize(m, "ring", "polygon", prefix = "g2_")
    assert(pre.columns.contains("g2_lat_min") && pre.columns.contains("g2__geo_valid"))
  }

  /** Drop the materialize metadata from the geometry column so a
    * request without `envelope_fields` stays a KERNEL-ONLY baseline
    * (r16: the sidecar auto-wires off that metadata otherwise).
    */
  private def stripGeoMeta(df: DataFrame, field: String): DataFrame =
    df.withColumn(field,
      col(field).as(field, org.apache.spark.sql.types.Metadata.empty))

  test("sidecar pre-filter: byte-identical answers across relations and shapes") {
    // drop the %17 bowties — raise-mode queries refuse poison, and this
    // test compares ANSWERS; poison handling keeps its own pins
    val docs = GeoEnvelope.materialize(
      ringDocs(600).filter("id % 17 != 0"), "ring", "polygon")
    def run(shape: String, rel: String, env: Boolean): Seq[Long] = {
      val ef = if (env)
        """, "envelope_fields": ["lat_min", "lat_max", "lon_min", "lon_max"]"""
      else ""
      QueryDsl.search(if (env) docs else stripGeoMeta(docs, "ring"),
        s"""{"query": {"geo_shape": {
             "doc_shape": {"type": "polygon", "ring_field": "ring"$ef},
             "shape": $shape, "relation": "$rel"}},
            "sort": ["id"], "size": 1000, "_source": ["id"]}""")
        .as[Long].collect().toSeq
    }
    val shapes = Seq(
      """{"type": "envelope", "coordinates": [[-40.0007, 30.0009], [20.0001, -50.0003]]}""",
      """{"type": "point", "coordinates": [-10.4707, 20.2509]}""",
      """{"type": "circle", "coordinates": [-10.0007, 20.0009], "radius": "3000km"}""",
      """{"type": "polygon", "coordinates": [[[-60.0007, -20.0009],
           [40.0001, -20.0009], [40.0001, 60.0003], [-60.0007, 60.0003],
           [-60.0007, -20.0009]]]}""")
    for (shape <- shapes; rel <- Seq("intersects", "within", "contains", "disjoint")) {
      // a 1-D-interior shape can't be 'contained' by a point/zero-area
      // query only for non-ringed docs — polygon docs take all four
      val plain = run(shape, rel, env = false)
      val pre = run(shape, rel, env = true)
      assert(pre === plain, s"shape=$shape rel=$rel")
      // and the pre-filter prunes without dropping a single true match
      if (rel != "disjoint") assert(pre.nonEmpty || plain.isEmpty)
    }
  }

  test("pushable pre-filter: PushedFilters pin + >=3x rows-materialized cut") {
    val dir = java.nio.file.Files.createTempDirectory("geoenv").toString
    spark.conf.set("parquet.block.size", (64 * 1024).toString)
    try {
      GeoEnvelope.materialize(ringDocs(60000).filter("id % 17 != 0"),
          "ring", "polygon")
        .repartitionByRange(16, col("lat_min"))
        .sortWithinPartitions("lat_min")
        .write.mode("overwrite").parquet(dir)
    } finally spark.conf.unset("parquet.block.size")
    val t = spark.read.parquet(dir)
    def q(env: Boolean) = {
      val ef = if (env)
        """, "envelope_fields": ["lat_min", "lat_max", "lon_min", "lon_max"]"""
      else ""
      QueryDsl.search(if (env) t else stripGeoMeta(t, "ring"),
        s"""{"query": {"geo_shape": {
             "doc_shape": {"type": "polygon", "ring_field": "ring"$ef},
             "shape": {"type": "envelope",
               "coordinates": [[10.0007, 4.0009], [16.0001, -4.0003]]},
             "relation": "intersects"}},
            "sort": ["id"], "size": 10000, "_source": ["id"]}""")
    }
    // the corner conjunction reaches the parquet reader
    val plan = q(env = true).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("lat_min") &&
      plan.contains("lon_max"), plan.take(2000))
    // same answer, far fewer rows materialized from the scan
    val exact = q(env = false).as[Long].collect().toSeq
    assert(q(env = true).as[Long].collect().toSeq === exact)
    assert(exact.nonEmpty)
    val pruned = scanRows(q(env = true))
    val full = scanRows(q(env = false))
    assert(pruned * 3 <= full,
      s"sidecar pre-filter should cut rows materialized >=3x " +
        s"(pruned=$pruned vs full=$full, matches=${exact.size})")
  }

  test("auto-wiring: a request WITHOUT envelope_fields prunes off table meta (r16)") {
    val dir = java.nio.file.Files.createTempDirectory("geoenv_auto").toString
    GeoEnvelope.materialize(ringDocs(20000).filter("id % 17 != 0"),
        "ring", "polygon")
      .repartitionByRange(8, col("lat_min"))
      .sortWithinPartitions("lat_min")
      .write.mode("overwrite").parquet(dir)
    // the metadata survives the parquet round-trip
    val t = spark.read.parquet(dir)
    val md = t.schema("ring").metadata
    assert(md.getString("graft.geo.docKind") === "polygon")
    assert(md.getStringArray("graft.geo.corners").toSeq ===
      Seq("lat_min", "lat_max", "lon_min", "lon_max"))
    def req(docShape: String) =
      s"""{"query": {"geo_shape": {
           "doc_shape": $docShape,
           "shape": {"type": "envelope",
             "coordinates": [[10.0007, 4.0009], [16.0001, -4.0003]]},
           "relation": "intersects"}},
          "sort": ["id"], "size": 10000, "_source": ["id"]}"""
    val auto = QueryDsl.search(t, req("""{"type": "polygon", "ring_field": "ring"}"""))
    // PushedFilters pin with NO envelope_fields spelled in the request
    val plan = auto.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("lat_min") &&
      plan.contains("lon_max"), plan.take(2000))
    // same answer as the kernel-only baseline, strictly fewer rows read
    val bare = QueryDsl.search(stripGeoMeta(t, "ring"),
      req("""{"type": "polygon", "ring_field": "ring"}"""))
    val exact = bare.as[Long].collect().toSeq
    assert(auto.as[Long].collect().toSeq === exact && exact.nonEmpty)
    assert(scanRows(auto) < scanRows(bare))
    // conservative guards: a docKind mismatch or a dropped corner
    // column silently keeps the kernel-only plan (never a wrong prune)
    val asLine = QueryDsl.search(t,
      req("""{"type": "linestring", "line_field": "ring"}"""))
    assert(!asLine.queryExecution.executedPlan.toString
      .contains("lon_max"), "docKind mismatch must not inject")
    val dropped = t.drop("lon_max")
    val noCorner = QueryDsl.search(dropped,
      req("""{"type": "polygon", "ring_field": "ring"}"""))
    noCorner.collect() // compiles and runs as the plain kernel walk
    assert(!noCorner.queryExecution.executedPlan.toString
      .contains("PushedFilters: [IsNotNull(lat_min)"),
      "missing corner must not inject")
  }

  test("sidecar columns merge through the normal CDC path") {
    def geoBatch(rows: (String, String, Long, Double)*): DataFrame =
      GeoEnvelope.materialize(
        rows.toDF("_doc_id", "_action", "_seq", "base")
          .withColumn("ring", expr(
            """CASE WHEN _action = 'delete'
                 THEN CAST(NULL AS ARRAY<STRUCT<lat: DOUBLE, lon: DOUBLE>>)
               ELSE array(struct(base AS lat, base AS lon),
                          struct(base AS lat, base + 1.0 AS lon),
                          struct(base + 1.0 AS lat, base + 1.0 AS lon),
                          struct(base + 1.0 AS lat, base AS lon)) END""")),
        "ring", "polygon")
    val st0 = CdcMerge.initialState(geoBatch(
      ("a", "upsert", 1L, 10.0), ("b", "upsert", 1L, 20.0)))
    val st1 = CdcMerge.applyBatch(st0, geoBatch(
      ("a", "upsert", 5L, 30.0), ("c", "upsert", 2L, 40.0)))
    val got = CdcMerge.snapshot(st1)
      .select("_doc_id", "lat_min", "lat_max", "_geo_valid")
      .as[(String, Double, Double, Boolean)].collect().toSeq.sorted
    // the winning row's sidecar rides with it — 'a' reflects base 30
    assert(got === Seq(("a", 30.0, 31.0, true), ("b", 20.0, 21.0, true),
      ("c", 40.0, 41.0, true)))
  }
}

package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RouterSpec extends SparkSpec {

  private lazy val decoded =
    DdbJson.decodeCommon(DdbJson.readExport(spark, Fixtures.writeExport().toString))
      .filter(col("PK").isNotNull)

  test("route splits by predicate with drop-unmatched") {
    val r = Router.route(decoded, Seq(
      "fare" -> (col("type") === "fare"),
      "flight" -> (col("type") === "flight")))
    assert(r.matched("fare").count() === Fixtures.fares.size)
    assert(r.matched("flight").count() === Fixtures.flights.size)
    // assignment + booking dropped, like the reference's missing routes
    assert(r.dropped.count() ===
      (Fixtures.assignments.size + Fixtures.bookings.size))
    assert(r.dropped.select("type").distinct().collect().map(_.getString(0)).toSet ===
      Set("assignment", "booking"))
  }

  test("an event can match multiple routes") {
    val r = Router.route(decoded, Seq(
      "all_lax" -> (col("PK") === "LAX"),
      "fares" -> (col("type") === "fare")), cache = false)
    val laxFares = decoded.filter(col("PK") === "LAX" && col("type") === "fare").count()
    assert(laxFares > 0)
    assert(r.matched("all_lax").filter(col("type") === "fare").count() === laxFares)
    assert(r.matched("fares").filter(col("PK") === "LAX").count() === laxFares)
  }

  test("routeDsl: query-DSL JSON routes == hand-written Column routes") {
    val byCol = Router.route(decoded, Seq(
      "fare" -> (col("type") === "fare"),
      "flight" -> (col("type") === "flight")), cache = false)
    // the same routes shipped as data — the reference clients' wire
    // format (a bool is deliberately used for one route to show
    // composition works in route position)
    val byDsl = Router.routeDsl(decoded, Seq(
      "fare" -> """{"term": {"type": "fare"}}""",
      "flight" -> """{"bool": {"filter": [{"term": {"type": "flight"}}]}}"""),
      cache = false)
    for (name <- Seq("fare", "flight"))
      assert(byDsl.matched(name).orderBy("PK", "SK").collect().toSeq ===
        byCol.matched(name).orderBy("PK", "SK").collect().toSeq, name)
    assert(byDsl.dropped.count() === byCol.dropped.count())
  }

  test("writeFanout: one-pass partitioned write, prunable on read") {
    val out = Files.createTempDirectory("graft-fanout").toString
    Router.writeFanout(decoded, Seq(
      "fare" -> (col("type") === "fare"),
      "flight" -> (col("type") === "flight")), out)
    val back = spark.read.parquet(out)
    assert(back.count() === (Fixtures.fares.size + Fixtures.flights.size))
    assert(back.filter(col("_route") === "fare").count() === Fixtures.fares.size)
    // partition pruning: only the fare directory is listed
    val plan = back.filter(col("_route") === "fare").queryExecution.executedPlan.toString
    assert(!plan.contains("_route=flight") || plan.contains("PartitionFilters"))
  }

  test("writeFanout lands a multi-matching record under every route") {
    val out = Files.createTempDirectory("graft-fanout-multi").toString
    Router.writeFanout(decoded, Seq(
      "all_lax" -> (col("PK") === "LAX"),
      "fares" -> (col("type") === "fare")), out)
    val back = spark.read.parquet(out)
    val laxFares = decoded.filter(col("PK") === "LAX" && col("type") === "fare").count()
    assert(laxFares > 0)
    // the same records appear under BOTH matching routes
    assert(back.filter(col("_route") === "all_lax" && col("type") === "fare").count() === laxFares)
    assert(back.filter(col("_route") === "fares" && col("PK") === "LAX").count() === laxFares)
  }

  test("IngestPipeline end-to-end: entities, dropped, DLQ") {
    val r = IngestPipeline.fromRaw(
      DdbJson.readExport(spark, Fixtures.writeExport().toString))
    assert(r.fare.count() === Fixtures.fares.size)
    assert(r.flight.count() === Fixtures.flights.size)
    assert(r.dropped.count() === Fixtures.assignments.size + Fixtures.bookings.size)
    assert(r.dlq.count() === 1) // the malformed PK-less item
    // materialize and read back
    val out = Files.createTempDirectory("graft-mat").toString
    IngestPipeline.materialize(r, out)
    assert(spark.read.parquet(s"$out/fare").count() === Fixtures.fares.size)
    assert(spark.read.parquet(s"$out/dlq").count() === 1)
  }

  test("GSI1 access path is sparse: rows without GSI keys are omitted") {
    val r = IngestPipeline.fromRaw(
      DdbJson.readExport(spark, Fixtures.writeExport().toString))
    val g = Entities.gsi1(r.fare)
    assert(g.count() === Fixtures.fares.count(_.contains("GSI1PK")))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.etl.Fixtures

/** The reference pipeline's whole life in one test: backfill an
  * export, materialize the per-entity indices, serve the access
  * patterns from the materialized tables, then tail a change stream
  * and watch the queryable state evolve — what "a user of the
  * reference switches to this library" actually runs.
  */
class LifecycleSpec extends SparkSpec {

  private def event(name: String, pk: String, sk: String, seq: Long,
      extra: String = ""): String =
    s"""{"eventName": "$name", "Keys": {"PK": {"S": "$pk"}, "SK": {"S": "$sk"}},
        "NewImage": {"PK": {"S": "$pk"}, "SK": {"S": "$sk"}, "type": {"S": "fare"}$extra},
        "SequenceNumber": $seq, "ApproximateCreationDateTime": ${1700000000 + seq}}"""
      .replaceAll("\n\\s*", " ")

  test("export → materialize → serve → CDC tail → evolved state") {
    val g = GraftEngine(spark)

    // 1. batch backfill from the export
    val r = g.ingestExport(Fixtures.writeExport().toString)
    val out = Files.createTempDirectory("graft-life").toString
    g.materialize(r, out)

    // 2. serve the reference's access patterns from the materialized index
    val fares = spark.read.parquet(s"$out/fare")
    val laxSea = g.keyLookup(fares, "LAX", skPrefix = Some("SEA#"))
    assert(laxSea.count() === 1)
    assert(laxSea.head().getAs[String]("sk_class") === "nonstop")
    // undecodable rows are in the route-keyed DLQ, not lost
    val dlq = spark.read.parquet(s"$out/dlq")
    assert(dlq.count() >= 1)

    // 3. tail a change stream: fare class updated, one fare deleted,
    //    plus a stale redelivery that must lose
    val eventsDir = Files.createTempDirectory("graft-life-ev")
    val target = Files.createTempDirectory("graft-life-state").toString
    val ckpt = Files.createTempDirectory("graft-life-ckpt").toString
    Files.writeString(eventsDir.resolve("b1.json"), Seq(
      event("INSERT", "LAX", "SEA#2023-05-07T23:59:59#nonstop", 1,
        """, "class": {"S": "nonstop"}"""),
      event("INSERT", "LAX", "BOS#2023-05-14T23:59:59#direct", 2,
        """, "class": {"S": "direct"}""")).mkString("\n"))
    val q1 = g.startCdc(eventsDir.toString, target, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(g.cdcSnapshot(target).get.count() === 2)

    Files.writeString(eventsDir.resolve("b2.json"), Seq(
      event("MODIFY", "LAX", "SEA#2023-05-07T23:59:59#nonstop", 4,
        """, "class": {"S": "economy-flex"}"""),
      event("MODIFY", "LAX", "SEA#2023-05-07T23:59:59#nonstop", 3,
        """, "class": {"S": "stale-loser"}"""),
      event("REMOVE", "LAX", "BOS#2023-05-14T23:59:59#direct", 5)).mkString("\n"))
    val q2 = g.startCdc(eventsDir.toString, target, ckpt)
    q2.processAllAvailable(); q2.stop()

    // 4. the queryable state evolved: one live doc with the winning class
    val state = g.cdcSnapshot(target).get
    assert(state.count() === 1)
    val cls = state.select(col("item")("class").getField("S")).head().getString(0)
    assert(cls === "economy-flex")
  }
}

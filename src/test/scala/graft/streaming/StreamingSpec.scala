package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def event(name: String, pk: String, sk: String, seq: Long,
      extra: String = "", typ: String = "fare"): String =
    s"""{"eventName": "$name", "Keys": {"PK": {"S": "$pk"}, "SK": {"S": "$sk"}},
        "NewImage": {"PK": {"S": "$pk"}, "SK": {"S": "$sk"}, "type": {"S": "$typ"}$extra},
        "SequenceNumber": $seq, "ApproximateCreationDateTime": ${1700000000 + seq}}"""
      .replaceAll("\n\\s*", " ")

  test("tumbling window with watermark aggregates by event time") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = EventWindows.tumblingCounts(df, "10 minutes", "5 minutes")
      .writeStream.outputMode("complete").format("memory")
      .queryName("tumbling_out").start()
    in.addData(
      (ts("2024-01-01 00:01:00"), "click", 1.0),
      (ts("2024-01-01 00:04:00"), "click", 2.0),
      (ts("2024-01-01 00:12:00"), "view", 3.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM tumbling_out ORDER BY window_start, event_type")
      .collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("n") === 2L)
    assert(rows(0).getAs[Double]("sum_value") === 3.0)
    assert(rows(1).getAs[String]("event_type") === "view")
    q.stop()
  }

  test("session window groups by inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val df = in.toDF().toDF("ts", "user_id")
    val q = EventWindows.sessionCounts(df, "5 minutes", "1 minute")
      .writeStream.outputMode("complete").format("memory")
      .queryName("session_out").start()
    in.addData(
      (ts("2024-01-01 00:00:00"), 1L),
      (ts("2024-01-01 00:03:00"), 1L), // same session
      (ts("2024-01-01 00:20:00"), 1L)) // new session after gap
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM session_out ORDER BY session_start").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("n") === 2L)
    assert(rows(1).getAs[Long]("n") === 1L)
    q.stop()
  }

  test("mapGroupsWithState keeps last-writer-wins state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventWindows.KeyedUpdate]
    val q = EventWindows.lwwState(in.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("lww_out").start()
    in.addData(
      EventWindows.KeyedUpdate("a", 1, "upsert", "a1"),
      EventWindows.KeyedUpdate("b", 1, "upsert", "b1"))
    q.processAllAvailable()
    in.addData(
      EventWindows.KeyedUpdate("a", 3, "upsert", "a3"),
      EventWindows.KeyedUpdate("a", 2, "upsert", "stale"), // ignored: lower seq
      EventWindows.KeyedUpdate("b", 2, "delete", null))
    q.processAllAvailable()
    val last = spark.sql(
      """SELECT key, payload, deleted FROM lww_out
         WHERE (key, seq) IN (SELECT key, MAX(seq) FROM lww_out GROUP BY key)
         ORDER BY key""").collect()
    assert(last.map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq ===
      Seq(("a", "a3", false), ("b", null, true)))
    q.stop()
  }

  test("file-based CDC stream: decode → foreachBatch merge → snapshot") {
    val eventsDir = Files.createTempDirectory("graft-cdc-events")
    val targetDir = Files.createTempDirectory("graft-cdc-target").toString
    val checkpoint = Files.createTempDirectory("graft-cdc-ckpt").toString

    Files.writeString(eventsDir.resolve("batch1.json"), Seq(
      event("INSERT", "LAX", "SEA#1", 1, """, "class": {"S": "v1"}"""),
      event("INSERT", "LAX", "SEA#2", 2, """, "class": {"S": "v1"}""")).mkString("\n"))

    val q = CdcStream.start(spark, eventsDir.toString, targetDir, checkpoint)
    q.processAllAvailable()
    Files.writeString(eventsDir.resolve("batch2.json"), Seq(
      event("MODIFY", "LAX", "SEA#1", 3, """, "class": {"S": "v2"}"""),
      event("REMOVE", "LAX", "SEA#2", 4)).mkString("\n"))
    q.processAllAvailable()
    q.stop()

    val snap = CdcStream.readSnapshot(spark, targetDir).get
    val rows = snap.orderBy("_doc_id").collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("_doc_id") === "LAX#SEA#1")
    // the MODIFY image won
    assert(DdbJsonAccess.itemClass(snap) === Seq("v2"))

    // restart from the same checkpoint: already-processed files are NOT
    // replayed (ST2 exactly-once per epoch), and the new file REDELIVERS
    // overlapping events (the feed is at-least-once) — stale seq 1/3/4
    // duplicates must neither regress SEA#1 nor resurrect SEA#2
    Files.writeString(eventsDir.resolve("batch3.json"), Seq(
      event("MODIFY", "LAX", "SEA#1", 1, """, "class": {"S": "v0"}"""), // stale redelivery
      event("MODIFY", "LAX", "SEA#1", 3, """, "class": {"S": "v2"}"""), // dup of batch2
      event("REMOVE", "LAX", "SEA#2", 4), // dup of the delete
      event("MODIFY", "LAX", "SEA#1", 5, """, "class": {"S": "v3"}""")).mkString("\n"))
    val q2 = CdcStream.start(spark, eventsDir.toString, targetDir, checkpoint)
    q2.processAllAvailable()
    q2.stop()
    val snap2 = CdcStream.readSnapshot(spark, targetDir).get
    assert(snap2.count() === 1) // SEA#2's REMOVE not resurrected by replay
    assert(DdbJsonAccess.itemClass(snap2) === Seq("v3"))
  }

  test("transformWithState LWW matches the mapGroupsWithState semantics") {
    implicit val sqlCtx = spark.sqlContext
    // the v2 state API requires the RocksDB state store
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[EventWindows.KeyedUpdate]
      val q = EventWindows.lwwStateV2(in.toDS())
        .writeStream.format("memory").queryName("lww_v2")
        .outputMode("update").start()
      in.addData(
        EventWindows.KeyedUpdate("k1", 1, "upsert", "a"),
        EventWindows.KeyedUpdate("k1", 3, "upsert", "c"),
        EventWindows.KeyedUpdate("k2", 1, "upsert", "x"))
      q.processAllAvailable()
      in.addData(
        EventWindows.KeyedUpdate("k1", 2, "upsert", "b"), // stale: loses to 3
        EventWindows.KeyedUpdate("k2", 2, "delete", null))
      q.processAllAvailable()
      q.stop()

      val last = spark.table("lww_v2")
        .groupBy("key").agg(max(struct(col("seq"), col("payload"), col("deleted"))).as("s"))
        .select(col("key"), col("s.payload"), col("s.deleted"))
        .collect().map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2))).toMap
      assert(last("k1") === ("c", false)) // stale seq 2 did not regress it
      assert(last("k2")._2 === true)      // tombstoned
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming dedup emits first arrival only, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val deduped = EventWindows.dedupByFingerprint(
      in.toDF().toDF("ts", "doc_id", "text"), lateness = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    in.addData(
      (ts("2024-01-01 10:00:00"), 1L, "alpha beta"),
      (ts("2024-01-01 10:00:01"), 2L, "alpha  BETA"), // same after normalize
      (ts("2024-01-01 10:00:02"), 3L, "gamma"))
    q.processAllAvailable()
    // duplicate arriving in a LATER micro-batch, inside the watermark
    in.addData(
      (ts("2024-01-01 10:01:00"), 4L, "Alpha Beta "),
      (ts("2024-01-01 10:01:01"), 5L, "delta"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_out").select("doc_id").collect()
      .map(_.getLong(0)).sorted
    // 2 (same batch), 4 (later batch) dropped as duplicates of 1
    assert(got === Array(1L, 3L, 5L))
  }

  test("epoch replay is idempotent: re-merging the same batch changes nothing") {
    val eventsDir = Files.createTempDirectory("graft-replay-events")
    val targetDir = Files.createTempDirectory("graft-replay-target").toString
    Files.writeString(eventsDir.resolve("b1.json"), Seq(
      event("INSERT", "JFK", "DEN#1", 1, """, "class": {"S": "v1"}"""),
      event("MODIFY", "JFK", "DEN#1", 2, """, "class": {"S": "v2"}"""),
      event("INSERT", "JFK", "DEN#2", 3)).mkString("\n"))
    val batch = CdcStream.decode(
      spark.read.schema(graft.etl.DdbJson.changeEventSchema).json(eventsDir.toString))

    CdcStream.mergeBatch(spark, batch, targetDir, 0)
    val once = CdcStream.readSnapshot(spark, targetDir).get
      .orderBy("_doc_id").collect().map(_.toString).toSeq
    // a crash between sink write and checkpoint commit re-runs the epoch
    CdcStream.mergeBatch(spark, batch, targetDir, 0)
    val twice = CdcStream.readSnapshot(spark, targetDir).get
      .orderBy("_doc_id").collect().map(_.toString).toSeq
    assert(twice === once)
    assert(CdcStream.latestVersion(targetDir) === Some(0L))
  }

  test("vacuum drops old snapshot versions, keeps the newest, replay still works") {
    val eventsDir = Files.createTempDirectory("graft-vac-events")
    val targetDir = Files.createTempDirectory("graft-vac-target").toString
    Files.writeString(eventsDir.resolve("b.json"),
      event("INSERT", "SFO", "SEA#1", 1))
    val batch = CdcStream.decode(
      spark.read.schema(graft.etl.DdbJson.changeEventSchema).json(eventsDir.toString))
    (0L to 4L).foreach(ep => CdcStream.mergeBatch(spark, batch, targetDir, ep))

    val removed = CdcStream.vacuum(targetDir, keep = 2)
    assert(removed === Seq(0L, 1L, 2L))
    assert(CdcStream.latestVersion(targetDir) === Some(4L))
    // replay of the newest epoch still finds its base (v=3)
    CdcStream.mergeBatch(spark, batch, targetDir, 4L)
    assert(CdcStream.readSnapshot(spark, targetDir).get.count() === 1)
  }

  test("routed sink parks a failed route's documents in its DLQ and survives") {
    val eventsDir = Files.createTempDirectory("graft-routed-events")
    val outDir = Files.createTempDirectory("graft-routed-out").toString
    val checkpoint = Files.createTempDirectory("graft-routed-ckpt").toString
    Files.writeString(eventsDir.resolve("b1.json"), Seq(
      event("INSERT", "LAX", "SEA#1", 1, typ = "fare"),
      event("INSERT", "LAX", "SEA#2", 2, typ = "fare"),
      event("INSERT", "LAX", "FL#1", 3, typ = "flight")).mkString("\n"))
    // break the fare sink: a plain file where its directory should go
    Files.writeString(java.nio.file.Paths.get(outDir, "fare"), "sink broken")

    val q = CdcStream.startRouted(spark, eventsDir.toString, outDir, checkpoint, Seq(
      "fare" -> (col("type") === "fare"),
      "flight" -> (col("type") === "flight")))
    q.processAllAvailable()
    val alive = q.isActive || q.exception.isEmpty // no sink failure escaped
    q.stop()
    assert(alive)
    // healthy route delivered
    assert(spark.read.parquet(s"$outDir/flight/epoch=0").count() === 1)
    // failed route parked per-route with the error attached
    val dlq = spark.read.parquet(s"$outDir/dlq/fare/epoch=0")
    assert(dlq.count() === 2)
    assert(dlq.select("_error").head().getString(0).nonEmpty)
  }

  test("routed sink fails the epoch (for replay) when the DLQ write fails too") {
    val eventsDir = Files.createTempDirectory("graft-routed2-events")
    val outDir = Files.createTempDirectory("graft-routed2-out").toString
    Files.writeString(eventsDir.resolve("b1.json"),
      event("INSERT", "LAX", "SEA#1", 1, typ = "fare"))
    // break BOTH the fare sink and the whole DLQ tree (environmental failure)
    Files.writeString(java.nio.file.Paths.get(outDir, "fare"), "sink broken")
    Files.writeString(java.nio.file.Paths.get(outDir, "dlq"), "dlq broken too")

    val batch = CdcStream.decode(
      spark.read.schema(graft.etl.DdbJson.changeEventSchema).json(eventsDir.toString))
    val ex = intercept[java.io.IOException] {
      CdcStream.writeRoutedEpoch(batch, Seq("fare" -> (col("type") === "fare")),
        outDir, epoch = 0)
    }
    // one exception carrying both causes — the epoch must NOT commit
    // with the slice silently dropped
    assert(ex.getMessage.contains("sink write failed"))
    assert(ex.getMessage.contains("DLQ"))
    assert(ex.getCause != null)
  }
}

/** Small helper to read a typed attr back out of the merged item map. */
object DdbJsonAccess {
  import org.apache.spark.sql.DataFrame
  def itemClass(df: DataFrame): Seq[String] =
    df.select(col("item").getItem("class").getField("S"))
      .collect().map(_.getString(0)).toSeq
}

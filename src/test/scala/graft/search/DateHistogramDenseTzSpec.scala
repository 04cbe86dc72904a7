package graft.search

import java.time.Instant
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `min_doc_count: 0` dense fill COMPOSED with a named/transition
  * `time_zone` (the Kibana-default dashboard request): the driver
  * iterates bucket boundaries in LOCAL wall time across offset
  * changes, so the local day containing a DST transition is ONE
  * bucket — 23h (spring forward) / 25h (fall back) wide in UTC —
  * a spring-forward phantom hour deduplicates instead of emitting a
  * duplicate key, and mdc0's non-empty buckets agree with mdc1.
  */
class DateHistogramDenseTzSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) =
    java.sql.Timestamp.from(Instant.parse(s))

  private def keysOf(rows: Array[org.apache.spark.sql.Row]): Seq[Instant] =
    rows.map(_.getTimestamp(0).toInstant).toSeq.sortBy(_.toEpochMilli)

  test("daily dense series spans both 2021 DST boundaries with 23h/25h transition buckets") {
    // local-noon instants: the local day of each doc is unambiguous
    val docs = Seq(
      (1L, ts("2021-03-10T17:00:00Z")), // Mar 10 local (EST)
      (2L, ts("2021-03-20T16:00:00Z")), // Mar 20 local (EDT)
      (3L, ts("2021-11-01T16:00:00Z")), // Nov 1 local (EDT)
      (4L, ts("2021-11-10T17:00:00Z")) // Nov 10 local (EST)
    ).toDF("k", "t")
    val out = QueryDsl.search(docs,
      """{"size": 0, "aggs": {"day": {"date_histogram":
           {"field": "t", "calendar_interval": "day",
            "time_zone": "America/New_York", "min_doc_count": 0},
         "aggs": {"mx": {"max": {"field": "k"}}}}}}""")
    val rows = out.collect()
    val keys = keysOf(rows)
    // Mar 10 .. Nov 10 inclusive = 246 local days, one bucket each
    assert(keys.size === 246)
    assert(keys.distinct.size === keys.size)
    // key = UTC instant of local midnight: EST days at 05:00Z, EDT at 04:00Z
    assert(keys.head === Instant.parse("2021-03-10T05:00:00Z"))
    assert(keys.last === Instant.parse("2021-11-10T05:00:00Z"))
    // spring-forward local day (Mar 14) is 23h wide in UTC
    val mar14 = Instant.parse("2021-03-14T05:00:00Z")
    val mar15 = Instant.parse("2021-03-15T04:00:00Z")
    assert(keys.contains(mar14) && keys.contains(mar15))
    assert(java.time.Duration.between(mar14, mar15).toHours === 23L)
    // fall-back local day (Nov 7) is 25h wide
    val nov7 = Instant.parse("2021-11-07T04:00:00Z")
    val nov8 = Instant.parse("2021-11-08T05:00:00Z")
    assert(keys.contains(nov7) && keys.contains(nov8))
    assert(java.time.Duration.between(nov7, nov8).toHours === 25L)
    // every other consecutive gap is exactly 24h
    val gaps = keys.sliding(2).map { case Seq(a, b) =>
      java.time.Duration.between(a, b).toHours }.toSeq
    assert(gaps.count(_ == 23L) === 1)
    assert(gaps.count(_ == 25L) === 1)
    assert(gaps.count(_ == 24L) === gaps.size - 2)
    // empty buckets: doc_count 0 and a NULL sub-agg
    val byKey = rows.map(r => (r.getTimestamp(0).toInstant,
      (r.getLong(1), r.isNullAt(2)))).toMap
    assert(byKey(mar14) === ((0L, true)))
    assert(byKey(Instant.parse("2021-03-10T05:00:00Z")) === ((1L, false)))
    // mdc0 restricted to non-empty buckets == the mdc1 answer
    val mdc1 = QueryDsl.search(docs,
      """{"size": 0, "aggs": {"day": {"date_histogram":
           {"field": "t", "calendar_interval": "day",
            "time_zone": "America/New_York"},
         "aggs": {"mx": {"max": {"field": "k"}}}}}}""")
      .collect().map(_.toSeq).toSet
    assert(rows.filter(_.getLong(1) > 0L).map(_.toSeq).toSet === mdc1)
  }

  test("hourly dense series dedups the spring-forward phantom local hour") {
    val docs = Seq(
      (1L, ts("2021-03-14T05:30:00Z")), // 00:30 EST local
      (2L, ts("2021-03-14T08:30:00Z")) // 04:30 EDT local
    ).toDF("k", "t")
    val rows = QueryDsl.search(docs,
      """{"size": 0, "aggs": {"h": {"date_histogram":
           {"field": "t", "fixed_interval": "1h",
            "time_zone": "America/New_York", "min_doc_count": 0}}}}""")
      .collect()
    val keys = keysOf(rows)
    // local hours 00..04 — 02:00 does not exist, its boundary maps
    // with the pre-transition offset onto 03:00's key and dedups
    assert(keys === Seq("2021-03-14T05:00:00Z", "2021-03-14T06:00:00Z",
      "2021-03-14T07:00:00Z", "2021-03-14T08:00:00Z").map(Instant.parse))
    val byKey = rows.map(r => (r.getTimestamp(0).toInstant, r.getLong(1))).toMap
    assert(byKey(Instant.parse("2021-03-14T05:00:00Z")) === 1L)
    assert(byKey(Instant.parse("2021-03-14T06:00:00Z")) === 0L)
    assert(byKey(Instant.parse("2021-03-14T07:00:00Z")) === 0L)
    assert(byKey(Instant.parse("2021-03-14T08:00:00Z")) === 1L)
  }

  test("extended_bounds beyond the data drive the dense series under a named zone") {
    val docs = Seq((1L, ts("2021-06-15T16:00:00Z"))).toDF("k", "t")
    val rows = QueryDsl.search(docs,
      """{"size": 0, "aggs": {"day": {"date_histogram":
           {"field": "t", "calendar_interval": "day",
            "time_zone": "America/New_York", "min_doc_count": 0,
            "extended_bounds": {"min": "2021-01-01T00:00:00",
                                "max": "2021-12-31T00:00:00"}}}}}""")
      .collect()
    val keys = keysOf(rows)
    // bounds are UTC instants: Jan 1 00:00Z is Dec 31 2020 local,
    // Dec 31 00:00Z is Dec 30 local — 365 local days inclusive
    assert(keys.size === 365)
    assert(keys.head === Instant.parse("2020-12-31T05:00:00Z"))
    assert(keys.last === Instant.parse("2021-12-30T05:00:00Z"))
    assert(rows.map(_.getLong(1)).sum === 1L)
  }

  test("auto_date_histogram sizes by the LOCAL span and buckets with the zone") {
    // 31 UTC days (Mar 1 00:30Z .. Mar 31 23:30Z) but 32 LOCAL days in
    // New York (the first instant is Feb 28 local) — at a 31-bucket
    // target, UTC counting would pick `day` and overflow the cap;
    // local counting must pick `month`
    val docs = Seq(
      (1L, ts("2021-03-01T00:30:00Z")),
      (2L, ts("2021-03-31T23:30:00Z"))).toDF("k", "t")
    val rows = QueryDsl.search(docs,
      """{"size": 0, "aggs": {"d": {"auto_date_histogram":
           {"field": "t", "buckets": 31,
            "time_zone": "America/New_York"}}}}""").collect()
    assert(rows.map(_.getString(2)).distinct.toSeq === Seq("month"))
    // local month starts: Feb (EST) and Mar (EST at its midnight)
    assert(keysOf(rows) === Seq(
      "2021-02-01T05:00:00Z", "2021-03-01T05:00:00Z").map(Instant.parse))
    // without the zone the same span is 31 UTC days: `day` is chosen
    val noTz = QueryDsl.search(docs,
      """{"size": 0, "aggs": {"d": {"auto_date_histogram":
           {"field": "t", "buckets": 31}}}}""").collect()
    assert(noTz.map(_.getString(2)).distinct.toSeq === Seq("day"))
  }

  test("auto_date_histogram day buckets cross the DST boundary under the zone") {
    val docs = Seq(
      (1L, ts("2021-03-13T17:00:00Z")), // Mar 13 local (EST)
      (2L, ts("2021-03-14T16:00:00Z")), // Mar 14 local (EDT)
      (3L, ts("2021-03-15T16:00:00Z")) // Mar 15 local (EDT)
    ).toDF("k", "t")
    val rows = QueryDsl.search(docs,
      """{"size": 0, "aggs": {"d": {"auto_date_histogram":
           {"field": "t", "buckets": 10,
            "time_zone": "America/New_York"}}}}""").collect()
    assert(rows.map(_.getString(2)).distinct.toSeq === Seq("day"))
    // the spring-forward local day keys at pre-switch local midnight
    // (05:00Z); the next day's boundary is post-switch (04:00Z)
    assert(keysOf(rows) === Seq("2021-03-13T05:00:00Z",
      "2021-03-14T05:00:00Z", "2021-03-15T04:00:00Z").map(Instant.parse))
  }

  test("fall-back overlap: docs before the span end bucketing ABOVE it leave no hole") {
    // NY fall-back 2021-11-07T06:00Z. Doc A at 05:50Z is local 01:50
    // EDT -> 15m boundary local 01:45, whose key maps through the
    // LATER entry (the overlap rule): 06:45Z. Doc B (the span max) at
    // 06:05Z is local 01:05 EST -> boundary 01:00 -> key 06:00Z. A
    // span-endpoint-truncated series would stop at B's boundary and
    // the empty 06:15Z/06:30Z buckets between the two non-empty ones
    // would VANISH — the exact gap min_doc_count: 0 exists to prevent.
    val docs = Seq(
      (1L, ts("2021-11-07T05:50:00Z")),
      (2L, ts("2021-11-07T06:05:00Z"))).toDF("k", "t")
    val rows = QueryDsl.search(docs,
      """{"size": 0, "aggs": {"h": {"date_histogram":
           {"field": "t", "fixed_interval": "15m",
            "time_zone": "America/New_York", "min_doc_count": 0}}}}""")
      .collect().map(r => (r.getTimestamp(0).toInstant, r.getLong(1)))
      .sortBy(_._1.toEpochMilli)
    assert(rows === Seq(
      (Instant.parse("2021-11-07T06:00:00Z"), 1L),
      (Instant.parse("2021-11-07T06:15:00Z"), 0L),
      (Instant.parse("2021-11-07T06:30:00Z"), 0L),
      (Instant.parse("2021-11-07T06:45:00Z"), 1L)))
  }

  test("property: the driver series is a superset of per-doc keys, duplicate-free (seeded random tables)") {
    val rnd = new scala.util.Random(20260816L)
    val offsets = Seq(-300L, -240L, -120L, 0L, 60L, 120L, 330L)
    for (trial <- 0 until 8) {
      // 1-4 transitions, ascending, 1-40 days apart, offsets differing
      // by at most 120 min between neighbors (keeps local activations
      // ascending, the engine's validated precondition)
      val base = java.time.Instant.parse("2021-01-01T00:00:00Z")
      var cur = base.plusSeconds(rnd.nextInt(30) * 86400L)
      var lastOff = offsets(rnd.nextInt(offsets.size))
      val entries = scala.collection.mutable.ArrayBuffer(
        (base.toString.dropRight(1), lastOff))
      for (_ <- 0 until (1 + rnd.nextInt(3))) {
        cur = cur.plusSeconds((1 + rnd.nextInt(40)) * 86400L + rnd.nextInt(86400))
        lastOff = lastOff + (rnd.nextInt(5) - 2) * 60L // ±120 min step
        entries += ((cur.toString.dropRight(1), lastOff))
      }
      val tz = entries.map { case (iso, off) => s"""["$iso", $off]""" }
        .mkString("""{"transitions": [""", ", ", "]}")
      // 40 docs scattered over ~200 days PLUS docs planted within ±2h
      // of every transition (the fall-back overlap window is where
      // doc→boundary mapping goes non-monotone — the hole class)
      val docTs = (0 until 40).map { i =>
        base.plusSeconds(rnd.nextInt(200 * 86400).toLong)
      } ++ entries.drop(1).flatMap { case (iso, _) =>
        val t0 = java.time.Instant.parse(iso + "Z")
        Seq(t0.minusSeconds(1L + rnd.nextInt(7200)),
          t0.plusSeconds(rnd.nextInt(7200).toLong))
      }
      val docs = docTs.zipWithIndex
        .map { case (inst, i) => (i.toLong, java.sql.Timestamp.from(inst)) }
        .toDF("k", "t")
      def req(mdc: String, interval: String) =
        s"""{"size": 0, "aggs": {"d": {"date_histogram":
           |  {"field": "t", $interval, "time_zone": $tz$mdc}}}}""".stripMargin
      for (interval <- Seq(""""calendar_interval": "day"""",
          """"fixed_interval": "6h"""")) {
        val dense = QueryDsl.search(docs, req(""", "min_doc_count": 0""", interval))
          .collect().map(r => (r.getTimestamp(0).toInstant, r.getLong(1)))
        val sparse = QueryDsl.search(docs, req("", interval))
          .collect().map(r => (r.getTimestamp(0).toInstant, r.getLong(1)))
        val denseKeys = dense.map(_._1).toSeq
        // no duplicate keys in the series
        assert(denseKeys.distinct.size === denseKeys.size, s"trial $trial dup keys")
        // every per-doc bucket appears, with the same count
        val denseMap = dense.toMap
        sparse.foreach { case (k, n) =>
          assert(denseMap.get(k).contains(n),
            s"trial $trial: sparse bucket $k=$n missing from the dense series ($tz)")
        }
        // empty buckets are exactly the rest
        assert(dense.count(_._2 > 0L) === sparse.length)
      }
    }
  }

  test("calendar month composes with a named zone and dense fill") {
    val docs = Seq(
      (1L, ts("2021-02-03T12:00:00Z")),
      (2L, ts("2021-07-09T12:00:00Z"))).toDF("k", "t")
    val keys = keysOf(QueryDsl.search(docs,
      """{"size": 0, "aggs": {"m": {"date_histogram":
           {"field": "t", "calendar_interval": "month",
            "time_zone": "America/New_York", "min_doc_count": 0}}}}""")
      .collect())
    // Feb..Jul local month starts at the UTC instant of local midnight
    assert(keys === Seq(
      "2021-02-01T05:00:00Z", "2021-03-01T05:00:00Z",
      "2021-04-01T04:00:00Z", "2021-05-01T04:00:00Z",
      "2021-06-01T04:00:00Z", "2021-07-01T04:00:00Z").map(Instant.parse))
  }
}

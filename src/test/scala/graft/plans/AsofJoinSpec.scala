package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("as-of picks the latest right row at or before each left time") {
    val trades = Seq(
      ("A", ts("2024-01-01 10:00:05"), 1L),
      ("A", ts("2024-01-01 10:00:00"), 2L), // before any quote
      ("B", ts("2024-01-01 10:00:10"), 3L),
      ("C", ts("2024-01-01 10:00:10"), 4L)  // key with no quotes at all
    ).toDF("sym", "t_ts", "trade_id")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:01"), 101L),
      ("A", ts("2024-01-01 10:00:05"), 102L), // exactly equal ts qualifies
      ("A", ts("2024-01-01 10:00:07"), 103L), // after the trade: excluded
      ("B", ts("2024-01-01 10:00:03"), 201L)
    ).toDF("sym2", "q_ts", "quote_id")

    val byKey = AsofJoin.asof(
      trades.withColumnRenamed("sym", "k"),
      quotes.withColumnRenamed("sym2", "k"), Seq("k"), "t_ts", "q_ts",
      rightTieBreak = Seq("quote_id"))
      .select(col("trade_id"), col("quote_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKey === Map(1L -> 102L, 3L -> 201L)) // 2: no prior; C: no match
  }

  test("null times never match: SQL rts <= lts semantics") {
    val l = Seq(
      ("k", Some(ts("2024-01-01 00:00:10")), 1L),
      ("k", None, 2L)) // null left time → no match
      .toDF("k", "lts", "lid")
    val r = Seq(
      ("k", None: Option[Timestamp], 7L), // null right time → never a candidate
      ("k", Some(ts("2024-01-01 00:00:05")), 8L))
      .toDF("k2", "rts", "rid")
    val got = AsofJoin.asof(l, r.withColumnRenamed("k2", "k"),
      Seq("k"), "lts", "rts", rightTieBreak = Seq("rid"))
      .select("lid", "rid").collect().map(x => x.getLong(0) -> x.getLong(1))
    assert(got.toSeq === Seq(1L -> 8L))
  }

  test("equal (key, time) ties resolve to the max tie-break value") {
    val l = Seq(("k", ts("2024-01-01 00:00:10"), 1L)).toDF("k", "lts", "lid")
    val r = Seq(
      ("k", ts("2024-01-01 00:00:10"), 7L),
      ("k", ts("2024-01-01 00:00:10"), 9L),
      ("k", ts("2024-01-01 00:00:10"), 8L)).toDF("k2", "rts", "rid")
    val got = AsofJoin.asof(l, r.withColumnRenamed("k2", "k"),
      Seq("k"), "lts", "rts", rightTieBreak = Seq("rid"))
      .select("rid").collect().map(_.getLong(0))
    assert(got === Array(9L))
  }

  test("hot key: native merge agrees with the composed form under skew") {
    // one user owns 5k clicks and 200 purchases — the composed
    // join+filter+window form materializes ~1M pairs for this key; the
    // merge resolves it in one pass over 5.2k sorted rows
    val clicks = spark.range(5000).selectExpr(
      "'hot' AS user_id",
      "timestamp_millis(1700000000000 + id * 1000) AS c_ts",
      "id AS c_id")
    val purchases = spark.range(200).selectExpr(
      "'hot' AS user_id",
      "timestamp_millis(1700000000000 + id * 25000 + 500) AS p_ts",
      "id AS p_id")
    val native = AsofJoin.asof(purchases, clicks, Seq("user_id"),
        "p_ts", "c_ts", rightTieBreak = Seq("c_id"))
      .select(col("p_id"), col("c_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // p_ts = base + 25000·i + 500 → latest click ≤ that is id 25·i
    assert(native.size === 200)
    assert(native(0L) === 0L)
    assert(native(7L) === 175L)
    assert(native(199L) === 4975L)
  }

  test("native exec matches the composed join+window form on events") {
    val e = Tables.load(spark, sf(), "events")
      .withColumn("tsec", date_trunc("second", col("ts")))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("tsec").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("tsec").as("c_ts"))

    val native = AsofJoin.asof(
      p, c.withColumnRenamed("c_user", "user_id"),
      Seq("user_id"), "p_ts", "c_ts", rightTieBreak = Seq("c_id"))
      .select(col("p_id"), col("c_id"), col("c_ts"))

    val w = Window.partitionBy(col("p_id")).orderBy(col("c_ts").desc, col("c_id").desc)
    val composed = p.join(c, p("user_id") === c("c_user"))
      .filter(col("c_ts") <= col("p_ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_id"), col("c_id"), col("c_ts"))

    val a = native.orderBy("p_id").collect().map(_.toString)
    val b = composed.orderBy("p_id").collect().map(_.toString)
    assert(a.length > 0)
    assert(a.toSeq === b.toSeq)
  }
}

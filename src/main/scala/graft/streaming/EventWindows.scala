package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Event-time windowing and custom keyed state (ST3–ST5 of
  * SURVEY.md §2.10) for the streaming side of the engine. Everything
  * here works identically on a streaming or a batch frame (same
  * logical operators); the streaming specs drive them with
  * MemoryStream micro-batches.
  */
object EventWindows {

  /** Tumbling event-time counts with a watermark bounding state: late
    * rows beyond `lateness` are dropped and their windows finalized.
    */
  def tumblingCounts(events: DataFrame, windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows (overlapping). */
  def slidingCounts(events: DataFrame, windowLen: String, slide: String,
      lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows: gap-based grouping per user. */
  def sessionCounts(events: DataFrame, gap: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n"))

  /** In-stream exact deduplication by content fingerprint — the
    * streaming face of the batch exact-dedup operator (Dedup.scala):
    * only the first arrival of each fingerprint is emitted; duplicates
    * in the same or later micro-batches are dropped. The watermark
    * bounds the dedup state (a duplicate arriving later than `lateness`
    * after the original can re-emit — the price of bounded state on an
    * unbounded stream; run the batch exact-dedup pass downstream for a
    * total guarantee).
    */
  def dedupByFingerprint(docs: DataFrame, lateness: String): DataFrame =
    docs
      .withColumn("fp", md5(graft.functions.TextFns.normalizeText(col("text"))))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("fp")

  // ---- custom keyed state: long-lived last-writer-wins (ST3) ----

  final case class KeyedUpdate(key: String, seq: Long, action: String, payload: String)
  final case class KeyedState(key: String, seq: Long, payload: String, deleted: Boolean)

  implicit val updateEnc: Encoder[KeyedUpdate] = Encoders.product[KeyedUpdate]
  implicit val stateEnc: Encoder[KeyedState] = Encoders.product[KeyedState]
  implicit val keyEnc: Encoder[String] = Encoders.STRING

  /** The mapGroupsWithState alternative to foreachBatch merge: keeps the
    * latest (seq, payload) per key in managed state and emits the state
    * after each batch. Duplicate/out-of-order updates are ignored by the
    * seq guard — exactly the DynamoDB-stream per-key ordering contract.
    */
  def lwwState(updates: Dataset[KeyedUpdate]): Dataset[KeyedState] =
    updates.groupByKey(_.key)
      .mapGroupsWithState[KeyedState, KeyedState](GroupStateTimeout.NoTimeout()) {
        (key, batch, state: GroupState[KeyedState]) =>
          val prior = state.getOption
            .getOrElse(KeyedState(key, Long.MinValue, null, deleted = true))
          val next = (Iterator(prior) ++ batch.map(u =>
            KeyedState(key, u.seq, u.payload, u.action == "delete")))
            .maxBy(_.seq)
          state.update(next)
          next
      }

  /** Same LWW semantics on the Spark 4 `transformWithState` API
    * (StatefulProcessor + typed ValueState, RocksDB-backed): the
    * successor to mapGroupsWithState — state schema evolution, TTL,
    * timers, and multiple state variables per key come for free when
    * the pipeline needs them.
    */
  class LwwProcessor extends StatefulProcessor[String, KeyedUpdate, KeyedState] {
    @transient private var state: ValueState[KeyedState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyedState](
        "lww", Encoders.product[KeyedState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedUpdate],
        timers: TimerValues): Iterator[KeyedState] = {
      val prior =
        if (state.exists()) state.get()
        else KeyedState(key, Long.MinValue, null, deleted = true)
      val next = (Iterator(prior) ++ rows.map(u =>
        KeyedState(key, u.seq, u.payload, u.action == "delete"))).maxBy(_.seq)
      state.update(next)
      Iterator.single(next)
    }
  }

  def lwwStateV2(updates: Dataset[KeyedUpdate]): Dataset[KeyedState] =
    updates.groupByKey(_.key)
      .transformWithState(new LwwProcessor, TimeMode.None(), OutputMode.Update())
}

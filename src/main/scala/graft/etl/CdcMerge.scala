package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed CDC apply — S7/ST2/ST3 of SURVEY.md: the engine-side
  * equivalent of the OpenSearch sink's
  * `document_id = getMetadata("primary_key")` +
  * `action = getMetadata("opensearch_action")` contract
  * (custom_resource.py:350-351): idempotent last-writer-wins upserts
  * and deletes keyed by doc id.
  *
  * Batch contract: rows carry `_doc_id`, `_action` ("upsert"|"delete"),
  * and a per-key-monotonic `_seq` (DynamoDB streams guarantee per-key
  * order via shard sequence numbers; we additionally tolerate
  * cross-batch disorder). State rows carry `_doc_id`, `_seq`,
  * `_deleted` + payload: deletes are retained as tombstones so a stale
  * upsert delivered after a newer delete cannot resurrect the document.
  *
  * Scale: the target is only ever touched by (a) an anti-join on batch
  * keys and (b) a semi-join on batch keys — both shuffle-free when the
  * target is bucketed by `_doc_id`. The window dedupe runs over
  * touched keys only (CDC batch-sized, not target-sized), so epoch cost
  * is O(batch + touched-partitions-of-target), never O(target).
  */
object CdcMerge {

  /** Last event per key by `_seq` desc: resolves duplicates and
    * out-of-order delivery inside one batch.
    */
  def latestPerKey(batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("_doc_id")).orderBy(col("_seq").desc)
    batch.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** A batch in state shape: winners computed, actions → tombstones. */
  private def toState(batch: DataFrame): DataFrame =
    latestPerKey(batch)
      .withColumn("_deleted", col("_action") === "delete")
      .drop("_action")

  /** Empty-target bootstrap. */
  def initialState(batch: DataFrame): DataFrame = toState(batch)

  /** Apply a CDC batch to the persistent state:
    * untouched target rows ∪ per-key winner of (prior state vs batch).
    */
  def applyBatch(target: DataFrame, batch: DataFrame): DataFrame = {
    val b = toState(batch)
    val keys = b.select(col("_doc_id"))
    val untouched = target.join(keys, Seq("_doc_id"), "left_anti")
    val prior = target.join(keys, Seq("_doc_id"), "left_semi")
    // tiebreak on _deleted for determinism when the same seq is
    // redelivered across batches (identical event, either row is right)
    val w = Window.partitionBy(col("_doc_id"))
      .orderBy(col("_seq").desc, col("_deleted").desc)
    // NOTE: the per-key window over this union REQUIRES an exchange —
    // Spark 4.1's union-partitioning propagation would skip it (and
    // mis-claim the partition count downstream); the engine disables
    // spark.sql.unionOutputPartitioning session-wide (GraftSession),
    // and BulkBodySpec pins the chained-applyBatch regression.
    val winners = prior.unionByName(b, allowMissingColumns = true)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    untouched.unionByName(winners, allowMissingColumns = true)
  }

  /** The queryable materialization: tombstones filtered out. */
  def snapshot(state: DataFrame): DataFrame =
    state.filter(!col("_deleted")).drop("_seq", "_deleted")
}

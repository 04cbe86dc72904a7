package graft.etl

import org.apache.spark.sql.{DataFrame, Row}

/** S4 of SURVEY.md §2.1: fixed-size chunked bulk writes — the engine
  * shape of the reference's `batch_write_item` loop in chunks of 25
  * (custom_resource.py:142-152). `foreachPartition` keeps the chunking
  * executor-side (no driver collect); the sink callback receives
  * ≤ chunkSize rows per call, exactly like a DynamoDB batch request.
  *
  * The callback must be idempotent or the sink transactional: Spark
  * retries failed tasks, so a partition's chunks can be re-sent.
  */
object BatchedWriter {

  def writeInChunks(df: DataFrame, chunkSize: Int = 25)(
      sink: Seq[Row] => Unit): Unit =
    df.foreachPartition { rows: Iterator[Row] =>
      rows.grouped(chunkSize).foreach(chunk => sink(chunk))
    }
}

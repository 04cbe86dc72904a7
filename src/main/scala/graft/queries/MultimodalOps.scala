package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Multimodal plumbing, oracle-checkable slice: payloads as binary
  * columns, metadata/feature derivation, and frame-sampling fan-out —
  * the columnar face of `graft.multimodal.Multimodal` (whose typed
  * mapPartitions path with the stubbed decoder is spec-checked; the
  * fake feature arithmetic here matches its stub so both layers agree).
  */
object MultimodalOps {

  def queries: Seq[GraftQuery] = Seq(
    // Binary payload features + every-4th-frame sampling, per "video".
    GraftQuery(
      "q80_multimodal_frames",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.withColumn("payload", col("text").cast("binary"))
          .withColumn("len", length(col("payload")).cast("long"))
          .withColumn("width", lit(16L) + col("len") % 640)
          .withColumn("height", lit(16L) + col("len") % 480)
          .withColumn("n_frames", lit(1L) + col("len") % 32)
          .withColumn("frame", explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))))
          .groupBy(col("doc_id"), col("len"), col("width"), col("height"), col("n_frames"))
          .agg(count(lit(1)).as("n_sampled"), sum(col("frame")).as("sum_frame_idx"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH f AS (
          -- octet_length: the Spark side measures the BINARY payload
          -- (UTF-8 bytes); char-counting length() only agrees on ASCII
          SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS len,
                 16 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 640 AS width,
                 16 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 480 AS height,
                 1 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 32 AS n_frames
          FROM documents),
        x AS (SELECT doc_id, len, width, height, n_frames, unnest(range(0, n_frames, 4)) AS frame FROM f)
        SELECT doc_id, len, width, height, n_frames,
               COUNT(*) AS n_sampled, CAST(SUM(frame) AS BIGINT) AS sum_frame_idx
        FROM x GROUP BY doc_id, len, width, height, n_frames ORDER BY doc_id
      """.stripMargin.trim))
  )
}

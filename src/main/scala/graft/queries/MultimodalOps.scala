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

  /** The ONE q338/q339 video fixture: an 8x6 C420 stream of
    * 2 + id % 4 frames whose luma bytes follow
    * (id*31 + f*7 + i*13) % 251 (chroma constant 128) — both oracles
    * replay exactly this arithmetic, so the pattern exists once.
    */
  private def y4mFixtureRow(id: Long): graft.multimodal.Multimodal.MediaRow = {
    import graft.multimodal.{Multimodal, VideoCodec}
    val nf = (2 + id % 4).toInt
    val frames = (0 until nf).map { f =>
      val b = new Array[Byte](48 + 24) // 8x6 luma + 2x(4x3) chroma
      var i = 0
      while (i < 48) {
        b(i) = ((id * 31L + f * 7L + i * 13L) % 251L).toByte
        i += 1
      }
      while (i < 72) { b(i) = 128.toByte; i += 1 }
      b
    }
    Multimodal.MediaRow(id, VideoCodec.encodeY4m420(8, 6, 25, 1, frames),
      Multimodal.MediaMeta("video", -1, -1))
  }

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
      """.stripMargin.trim)),

    // REAL audio decode end-to-end: a deterministic integer waveform
    // per doc_id is synthesized ON THE EXECUTORS, encoded to actual
    // RIFF/WAVE PCM-16 bytes (AudioCodec.encodeWavPcm16), carried as
    // an opaque binary column, and decoded back by the REAL WAV
    // decoder (header walk, chunk skipping, little-endian sample
    // extraction) inside one map-only mapPartitions pass. The oracle
    // never sees the bytes: it recomputes the exact-integer stats
    // (sum |s|, sign changes, duration) from the waveform's
    // arithmetic definition — so a header-parse or byte-order bug can
    // NOT cancel out. Map-only, fuses into the scan, linear at any
    // corpus size.
    GraftQuery(
      "q337_multimodal_wav",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.{AudioCodec, Multimodal}
        val ids = Tables.load(s, dir, "documents")
          .select(col("doc_id")).as[Long]
        val media = ids.map { id =>
          val n = (200 + id % 300).toInt
          val samples = Array.tabulate[Short](n)(i =>
            (((id * 7349L + i * 2654435761L) % 4001L) - 2000L).toShort)
          Multimodal.MediaRow(id, AudioCodec.encodeWavPcm16(8000, 1, samples),
            Multimodal.MediaMeta("audio", -1, -1))
        }(Multimodal.rowEnc)
        Multimodal.extractAudioFeatures(media)
          .filter(_.decoded)
          .toDF()
          .select(col("id").as("doc_id"),
            col("sampleRate").as("sample_rate"), col("channels"),
            col("nSamples").as("n_samples"),
            col("durationMs").as("duration_ms"),
            col("sumAbs").as("sum_abs"),
            col("zeroCrossings").as("zero_crossings"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH d AS (SELECT doc_id, 200 + doc_id % 300 AS n FROM documents),
        s AS (SELECT doc_id, n, i,
                ((doc_id * 7349 + i * 2654435761) % 4001) - 2000 AS v
              FROM d, UNNEST(range(0, n)) AS u(i)),
        z AS (SELECT doc_id, n, i, v,
                LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
              FROM s),
        g AS (SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_samples,
                CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
                CAST(SUM(CASE WHEN pv IS NOT NULL AND ((v < 0) != (pv < 0))
                  THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
              FROM z GROUP BY doc_id)
        SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
               CAST(1 AS INT) AS channels, n_samples,
               n_samples * 1000 // 8000 AS duration_ms,
               sum_abs, zero_crossings
        FROM g ORDER BY doc_id
      """.stripMargin.trim),
      headline = true),

    // REAL video decode end-to-end — the q337 recipe for the third
    // modality: per doc a deterministic 8x6 C420 luma pattern over
    // 2-5 frames is built on the executors, encoded to an actual
    // YUV4MPEG2 stream (header + FRAME markers + planar bytes), and
    // decoded back by the real Y4M decoder. The oracle recomputes the
    // luma sum and frame count from the pattern's arithmetic
    // definition, never the bytes. Map-only, linear.
    GraftQuery(
      "q338_multimodal_y4m",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.{Multimodal, VideoCodec}
        val ids = Tables.load(s, dir, "documents")
          .select(col("doc_id")).as[Long]
        val media = ids.map(y4mFixtureRow)(Multimodal.rowEnc)
        Multimodal.extractVideoFeatures(media)
          .filter(_.decoded)
          .toDF()
          .select(col("id").as("doc_id"), col("width"), col("height"),
            col("nFrames").as("n_frames"),
            col("durationMs").as("duration_ms"),
            col("lumaSum").as("luma_sum"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS nf FROM documents),
        y AS (SELECT doc_id, nf, ((doc_id * 31 + f * 7 + i * 13) % 251) AS v
              FROM d, UNNEST(range(0, nf)) AS uf(f),
                   UNNEST(range(0, 48)) AS ui(i)),
        g AS (SELECT doc_id, CAST(MAX(nf) AS BIGINT) AS n_frames,
                     CAST(SUM(v) AS BIGINT) AS luma_sum
              FROM y GROUP BY doc_id)
        SELECT doc_id, CAST(8 AS INT) AS width, CAST(6 AS INT) AS height,
               n_frames, n_frames * 40 AS duration_ms, luma_sum
        FROM g ORDER BY doc_id
      """.stripMargin.trim)),

    // REAL frame sampling: every 2nd frame of each Y4M stream decodes
    // to its own (frame_idx, luma_sum) row — the decode-per-sampled-
    // frame fan-out of video preprocessing, over actual frame bytes
    // (skipped frames are only marker-walked, never byte-scanned).
    // Same executor-side synthesis as q338; the oracle recomputes the
    // sampled frames' luma sums from the pattern's arithmetic
    // definition.
    GraftQuery(
      "q339_multimodal_frame_sample",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.{Multimodal, VideoCodec}
        val ids = Tables.load(s, dir, "documents")
          .select(col("doc_id")).as[Long]
        val media = ids.map(y4mFixtureRow)(Multimodal.rowEnc)
        media.flatMap { r =>
          VideoCodec.sampleFrameLuma(r.payload, step = 2)
            .getOrElse(Seq.empty)
            .map { case (idx, luma) => (r.id, idx, luma) }
        }.toDF("doc_id", "frame_idx", "luma_sum")
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""
        WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS nf FROM documents),
        f AS (SELECT doc_id, f FROM d, UNNEST(range(0, nf, 2)) AS uf(f)),
        y AS (SELECT doc_id, f, ((doc_id * 31 + f * 7 + i * 13) % 251) AS v
              FROM f, UNNEST(range(0, 48)) AS ui(i))
        SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
               CAST(SUM(v) AS BIGINT) AS luma_sum
        FROM y GROUP BY doc_id, f ORDER BY doc_id, frame_idx
      """.stripMargin.trim))
  )
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride along as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs batched per partition so per-batch setup (a real
  * decoder would load a codec/model once per partition) amortizes —
  * the Scala analog of the `mapInPandas` batch-UDF pattern.
  *
  * The decode step is REAL for the public formats [[ImageCodec]]
  * understands (netpbm PPM and uncompressed 24-bit BMP — header +
  * pixel-stat decode with no codec library): such payloads report
  * their true header dimensions and a checksum over the decoded
  * pixels. Payloads that are not images (this harness mostly feeds
  * document text as bytes) fall back to deterministic byte statistics
  * — a 100-TB media table always contains undecodable blobs, and the
  * scan must classify them, never crash.
  */
object Multimodal {

  final case class MediaMeta(kind: String, declaredWidth: Int, declaredHeight: Int)
  final case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      id: Long, byteLen: Long, width: Int, height: Int,
      nFrames: Int, checksum: Long)
  final case class Frame(id: Long, frameIdx: Int, frameChecksum: Long)

  implicit val rowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit val frameEnc: Encoder[Frame] = Encoders.product[Frame]

  /** Decode one payload to (width, height, nFrames, checksum). Image
    * payloads ([[ImageCodec]] formats, sniffed by magic bytes) decode
    * for real: header dimensions win over declared metadata, one
    * frame, checksum over the normalized pixels — so the same image
    * as PPM or BMP yields the same features. Anything else takes the
    * byte-statistics fallback below.
    */
  private[multimodal] def decode(payload: Array[Byte], meta: MediaMeta): (Int, Int, Int, Long) =
    ImageCodec.decodeImage(payload) match {
      case Some(img) => (img.width, img.height, 1, img.pixelChecksum)
      case None => byteStatsFallback(payload, meta)
    }

  /** Non-image fallback — a deterministic pure function of the payload
    * bytes, so undecodable blobs still carry stable, joinable features
    * (and tests are reproducible under any partitioning).
    */
  private[multimodal] def byteStatsFallback(payload: Array[Byte], meta: MediaMeta): (Int, Int, Int, Long) = {
    val len = payload.length
    var sum = 0L
    var i = 0
    while (i < len) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
    val width = if (meta.declaredWidth > 0) meta.declaredWidth else 16 + (len % 640)
    val height = if (meta.declaredHeight > 0) meta.declaredHeight else 16 + (len % 480)
    val frames = if (meta.kind == "video") 1 + len % 32 else 1
    (width, height, frames, sum)
  }

  /** Batched feature extraction: one decoder "session" per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      // per-partition decoder setup would happen here (load codec once)
      rows.map { r =>
        val (w, h, frames, sum) = decode(r.payload, r.meta)
        MediaFeatures(r.id, r.payload.length.toLong, w, h, frames, sum)
      }
    }

  /** One columnar batch of media rows — parallel arrays, the memory
    * shape an Arrow record batch presents to a vectorized decoder
    * (mapInArrow / Arrow-FFI JNI codecs consume exactly this: column
    * vectors, not row objects).
    */
  final case class MediaBatch(
      ids: Array[Long], payloads: Array[Array[Byte]], metas: Array[MediaMeta])

  /** Vectorized decode: batch-in, batch-out over the same real
    * [[decode]], so batched output is byte-identical to the row path
    * (spec-enforced parity). An accelerator integration (SIMD decode,
    * GPU transfer, model inference) would replace only this loop with
    * a whole-batch codec call — the signature, columnar arrays in and
    * one features array out, is the contract such a call needs.
    */
  private[multimodal] def decodeBatch(batch: MediaBatch): Array[MediaFeatures] = {
    val n = batch.ids.length
    val out = new Array[MediaFeatures](n)
    var i = 0
    while (i < n) {
      val (w, h, frames, sum) = decode(batch.payloads(i), batch.metas(i))
      out(i) = MediaFeatures(batch.ids(i), batch.payloads(i).length.toLong,
        w, h, frames, sum)
      i += 1
    }
    out
  }

  /** Arrow-style batched feature extraction: each partition's rows are
    * staged into fixed-size columnar [[MediaBatch]]es and decoded
    * batch-at-a-time — the `mapInArrow`/`mapInPandas` execution shape,
    * where per-batch fixed costs (codec dispatch, accelerator
    * round-trips) amortize over `batchSize` rows instead of paying per
    * row. Output is identical to [[extractFeatures]]; only the call
    * boundary differs.
    */
  def extractFeaturesBatched(media: Dataset[MediaRow],
      batchSize: Int = 256): Dataset[MediaFeatures] = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { chunk =>
        val n = chunk.size
        val ids = new Array[Long](n)
        val payloads = new Array[Array[Byte]](n)
        val metas = new Array[MediaMeta](n)
        var i = 0
        chunk.foreach { r =>
          ids(i) = r.id; payloads(i) = r.payload; metas(i) = r.meta; i += 1
        }
        decodeBatch(MediaBatch(ids, payloads, metas)).iterator
      }
    }
  }

  /** Exact-integer audio features from a decoded PCM WAV payload
    * ([[AudioCodec]]); undecodable payloads carry decoded = false with
    * zeroed stats instead of being dropped — a 100-TB media scan must
    * account for every row, and the caller filters on the flag.
    */
  final case class AudioFeatures(
      id: Long, byteLen: Long, decoded: Boolean, sampleRate: Int,
      channels: Int, nSamples: Long, durationMs: Long, sumAbs: Long,
      zeroCrossings: Long, sampleChecksum: Long)

  implicit val audioEnc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]

  /** Batched audio feature extraction — the same one-decoder-session-
    * per-partition shape as [[extractFeatures]], over the REAL
    * [[AudioCodec]] WAV decode. Map-only: fuses into the scan, no
    * shuffle, linear at any corpus size.
    */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] =
    media.mapPartitions { rows =>
      rows.map { r =>
        AudioCodec.decodeWav(r.payload) match {
          case Some(a) => AudioFeatures(r.id, r.payload.length.toLong, true,
            a.sampleRate, a.channels, a.nSamples, a.durationMs, a.sumAbs,
            a.zeroCrossings, a.sampleChecksum)
          case None => AudioFeatures(r.id, r.payload.length.toLong, false,
            -1, -1, 0L, 0L, 0L, 0L, 0L)
        }
      }
    }

  /** Exact-integer video features from a decoded Y4M payload
    * ([[VideoCodec]]); same row-accounting contract as
    * [[AudioFeatures]] — undecodable rows carry decoded = false.
    */
  final case class VideoFeatures(
      id: Long, byteLen: Long, decoded: Boolean, width: Int, height: Int,
      fpsNum: Int, fpsDen: Int, nFrames: Long, durationMs: Long,
      lumaSum: Long, byteChecksum: Long)

  implicit val videoEnc: Encoder[VideoFeatures] = Encoders.product[VideoFeatures]

  /** Batched video feature extraction over the REAL [[VideoCodec]]
    * Y4M decode — one decoder session per partition, map-only, fuses
    * into the scan.
    */
  def extractVideoFeatures(media: Dataset[MediaRow]): Dataset[VideoFeatures] =
    media.mapPartitions { rows =>
      rows.map { r =>
        VideoCodec.decodeY4m(r.payload) match {
          case Some(v) => VideoFeatures(r.id, r.payload.length.toLong, true,
            v.width, v.height, v.fpsNum, v.fpsDen, v.nFrames, v.durationMs,
            v.lumaSum, v.byteChecksum)
          case None => VideoFeatures(r.id, r.payload.length.toLong, false,
            -1, -1, -1, -1, 0L, 0L, 0L, 0L)
        }
      }
    }

  /** Frame sampling: every `step`-th frame index, exploded to rows —
    * the fan-out shape of video preprocessing (decode happens per
    * sampled frame downstream, not per video).
    */
  def sampleFrames(features: Dataset[MediaFeatures], step: Int): Dataset[Frame] =
    features.flatMap { f =>
      Range(0, f.nFrames, step).map(i => Frame(f.id, i, f.checksum * 31 + i))
    }

  /** Wrap any table into media rows (payload = a chosen string column's
    * UTF-8 bytes) — the harness path; a real pipeline reads binary
    * files or parquet binary columns directly.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).cast("binary").as("payload"),
        struct(lit(kind).as("kind"), lit(-1).as("declaredWidth"),
          lit(-1).as("declaredHeight")).as("meta"))
      .as[MediaRow]
  }
}

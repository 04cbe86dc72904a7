package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride along as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs batched per partition so per-batch setup (a real
  * decoder would load a codec/model once per partition) amortizes —
  * the Scala analog of the `mapInPandas` batch-UDF pattern.
  *
  * The decode step itself is a STUB: no image/audio libraries exist in
  * this container, so `decodeStub` derives deterministic fake features
  * from the payload bytes. Everything around it — schema, encoders,
  * partition-wise batching, frame-sampling explode, feature joins — is
  * real Spark plumbing and is what the tests exercise.
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

  /** STUB decoder — stands in for e.g. libjpeg/ffmpeg. Deterministic
    * pure function of the payload so tests are stable. A real
    * implementation replaces only this function; its per-partition
    * call shape (setup once, then iterate) is already correct.
    */
  private[multimodal] def decodeStub(payload: Array[Byte], meta: MediaMeta): (Int, Int, Int, Long) = {
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
        val (w, h, frames, sum) = decodeStub(r.payload, r.meta)
        MediaFeatures(r.id, r.payload.length.toLong, w, h, frames, sum)
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

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

  /** One columnar batch of media rows — parallel arrays, the memory
    * shape an Arrow record batch presents to a vectorized decoder
    * (mapInArrow / Arrow-FFI JNI codecs consume exactly this: column
    * vectors, not row objects).
    */
  final case class MediaBatch(
      ids: Array[Long], payloads: Array[Array[Byte]], metas: Array[MediaMeta])

  /** STUB vectorized decoder: batch-in, batch-out. A real integration
    * replaces only this function with a codec call over the whole
    * batch (SIMD decode, GPU transfer, model inference); the signature
    * — columnar arrays in, one features array out — is the contract
    * that integration needs, and it produces byte-identical output to
    * the row-wise [[decodeStub]] (spec-enforced parity).
    */
  private[multimodal] def decodeBatchStub(batch: MediaBatch): Array[MediaFeatures] = {
    val n = batch.ids.length
    val out = new Array[MediaFeatures](n)
    var i = 0
    while (i < n) {
      val (w, h, frames, sum) = decodeStub(batch.payloads(i), batch.metas(i))
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
        decodeBatchStub(MediaBatch(ids, payloads, metas)).iterator
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

package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.multimodal.Multimodal

/** Streaming media-feature maintenance: a file-source stream of
  * MediaRow-shaped parquet (id, payload binary, meta struct — media
  * landing continuously, the multimodal analog of the CDC feed) runs
  * the REAL per-partition decoders ([[Multimodal.extractAudioFeatures]]
  * over [[graft.multimodal.AudioCodec]]) per micro-batch and appends
  * the exact-integer feature rows to a parquet sink.
  *
  * The transform is the SAME typed mapPartitions operator the batch
  * path (q337) runs — decode is a pure function of the payload, so
  * restart/replay produce byte-identical feature rows and the file
  * source's checkpoint gives effective exactly-once per input file
  * (the CdcStream ST2 contract). Undecodable payloads keep their
  * decoded = false accounting in-stream: a media feed always contains
  * corrupt blobs, and the stream must record them, never crash.
  */
object StreamingMedia {

  /** Tail a directory of MediaRow parquet files. */
  def readMedia(spark: SparkSession, inDir: String) =
    spark.readStream
      .schema(Multimodal.rowEnc.schema)
      .parquet(inDir)
      .as[Multimodal.MediaRow](Multimodal.rowEnc)

  /** The shared append-only parquet sink — ONE definition so the audio
    * and video arms can never diverge on sink configuration.
    */
  private def startSink[T](features: org.apache.spark.sql.Dataset[T],
      outDir: String, checkpoint: String): StreamingQuery =
    features.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .option("path", outDir)
      .outputMode("append")
      .start()

  /** Start the audio-feature maintenance stream: inDir (landing media)
    * → decode → append-only features parquet at outDir.
    */
  def startAudioFeatures(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String): StreamingQuery =
    startSink(Multimodal.extractAudioFeatures(readMedia(spark, inDir)),
      outDir, checkpoint)

  /** The video twin: same stream shape over the real Y4M decoder. */
  def startVideoFeatures(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String): StreamingQuery =
    startSink(Multimodal.extractVideoFeatures(readMedia(spark, inDir)),
      outDir, checkpoint)
}

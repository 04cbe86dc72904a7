package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.multimodal.{AudioCodec, Multimodal}

/** The streaming media-feature pipeline: per-epoch WAV payloads land
  * as parquet files, the stream decodes them with the REAL AudioCodec
  * per micro-batch, and the appended features must be byte-identical
  * to the batch operator over the same rows — including across a
  * restart (checkpointed file source = effective exactly-once per
  * file) and for corrupt payloads (decoded = false rows, no crash).
  */
class StreamingMediaSpec extends SparkSpec {
  import spark.implicits._

  private def wavRow(id: Long): Multimodal.MediaRow = {
    val n = (50 + id % 20).toInt
    val samples = Array.tabulate[Short](n)(i =>
      (((id * 97L + i * 31L) % 2001L) - 1000L).toShort)
    Multimodal.MediaRow(id, AudioCodec.encodeWavPcm16(8000, 1, samples),
      Multimodal.MediaMeta("audio", -1, -1))
  }

  private def writeEpoch(inDir: String, rows: Seq[Multimodal.MediaRow]): Unit =
    spark.createDataset(rows)(Multimodal.rowEnc)
      .repartition(1).write.mode("append").parquet(inDir)

  test("streamed features == batch features, across restart, corrupt rows accounted") {
    val inDir = Files.createTempDirectory("smedia_in").toString
    val outDir = Files.createTempDirectory("smedia_out").toString
    val ckpt = Files.createTempDirectory("smedia_ckpt").toString

    val epoch1 = (1L to 20L).map(wavRow)
    // one corrupt payload rides along: must surface as decoded = false
    val corrupt = Multimodal.MediaRow(99L, Array[Byte](1, 2, 3),
      Multimodal.MediaMeta("audio", -1, -1))
    val epoch2 = (21L to 40L).map(wavRow) :+ corrupt

    writeEpoch(inDir, epoch1)
    val q1 = StreamingMedia.startAudioFeatures(spark, inDir, outDir, ckpt)
    q1.processAllAvailable()
    writeEpoch(inDir, epoch2)
    q1.processAllAvailable()
    q1.stop()

    // restart on the same checkpoint with one more epoch: already-seen
    // files must NOT reprocess (no duplicate ids)
    val epoch3 = (41L to 50L).map(wavRow)
    writeEpoch(inDir, epoch3)
    val q2 = StreamingMedia.startAudioFeatures(spark, inDir, outDir, ckpt)
    q2.processAllAvailable()
    q2.stop()

    val streamed = spark.read.parquet(outDir)
      .as[Multimodal.AudioFeatures](Multimodal.audioEnc)
      .collect().sortBy(_.id).toSeq
    val batch = Multimodal.extractAudioFeatures(
        spark.createDataset(epoch1 ++ epoch2 ++ epoch3)(Multimodal.rowEnc))
      .collect().sortBy(_.id).toSeq
    assert(streamed === batch)
    assert(streamed.map(_.id) === streamed.map(_.id).distinct) // no replays
    val bad = streamed.filter(!_.decoded)
    assert(bad.map(_.id) === Seq(99L) && bad.head.byteLen === 3L)
    assert(streamed.count(_.decoded) === 50)
  }

  test("video twin: streamed Y4M features == batch features") {
    val inDir = Files.createTempDirectory("svid_in").toString
    val outDir = Files.createTempDirectory("svid_out").toString
    val ckpt = Files.createTempDirectory("svid_ckpt").toString
    def y4mRow(id: Long): Multimodal.MediaRow = {
      val frames = (0 until (1 + id % 3).toInt).map { f =>
        val b = new Array[Byte](6) // 2x2 C420
        (0 until 6).foreach(i => b(i) = ((id * 17 + f * 5 + i) % 200).toByte)
        b
      }
      Multimodal.MediaRow(id,
        graft.multimodal.VideoCodec.encodeY4m420(2, 2, 25, 1, frames),
        Multimodal.MediaMeta("video", -1, -1))
    }
    val rows = (1L to 15L).map(y4mRow)
    writeEpoch(inDir, rows)
    val q = StreamingMedia.startVideoFeatures(spark, inDir, outDir, ckpt)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .as[Multimodal.VideoFeatures](Multimodal.videoEnc)
      .collect().sortBy(_.id).toSeq
    val batch = Multimodal.extractVideoFeatures(
        spark.createDataset(rows)(Multimodal.rowEnc))
      .collect().sortBy(_.id).toSeq
    assert(streamed === batch)
    assert(streamed.forall(_.decoded) && streamed.size === 15)
  }
}

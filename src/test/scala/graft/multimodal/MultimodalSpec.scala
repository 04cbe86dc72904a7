package graft.multimodal

import graft.SparkSpec
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.fromText(
    Tables.load(spark, sf(), "documents").limit(50), "doc_id", "text", "video")

  test("binary payload round-trips with typed metadata") {
    val r = media.head()
    assert(r.payload.nonEmpty)
    assert(r.meta.kind === "video")
  }

  test("feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.id)
    assert(f1.toSeq === f2.toSeq) // partitioning cannot change features
    assert(f1.forall(f => f.byteLen > 0 && f.width >= 16 && f.nFrames >= 1))
  }

  test("batched (arrow-shape) extraction is row-path parity, any batch size") {
    val row = Multimodal.extractFeatures(media).collect().sortBy(_.id).toSeq
    for (bs <- Seq(1, 7, 256)) {
      val batched = Multimodal.extractFeaturesBatched(media, bs)
        .collect().sortBy(_.id).toSeq
      assert(batched === row, s"batchSize=$bs diverged from the row path")
    }
    // batch staging must also be partitioning-invariant
    val rep = Multimodal.extractFeaturesBatched(media.repartition(7), 16)
      .collect().sortBy(_.id).toSeq
    assert(rep === row)
  }

  test("frame sampling fans out every 4th frame") {
    val feats = Multimodal.extractFeatures(media)
    val frames = Multimodal.sampleFrames(feats, 4).collect()
    val byId = frames.groupBy(_.id)
    feats.collect().foreach { f =>
      val expected = (f.nFrames + 3) / 4 // ceil(nFrames/4)
      assert(byId(f.id).length === expected)
      assert(byId(f.id).map(_.frameIdx).sorted.toSeq === Range(0, f.nFrames, 4).toSeq)
    }
  }
}

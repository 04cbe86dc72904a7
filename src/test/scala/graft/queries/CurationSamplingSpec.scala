package graft.queries

import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Aggregators

/** Contracts of the round-4 curation/sampling additions that the
  * DuckDB oracle can't express:
  *
  *   - the bounded-heap sampler must agree with the (non-scalable)
  *     global-sort definition regardless of partitioning — that's the
  *     map-side-combine correctness of SmallestKByKey;
  *   - the Bloom contamination screen must be a SUPERSET of the exact
  *     shingle semi-join (bloom filters have false positives, never
  *     false negatives);
  *   - int8-quantized ANN is lossy by design, so its contract is
  *     recall against exact float search, not equality.
  */
class CurationSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("q89 chunking: chunk count, token coverage and window bound per document") {
    val dir = sf("sf0.001")
    val chunks = graft.Registry.byName("q89_text_chunk").run(spark, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), F.sum("n_tokens").as("covered"),
        F.max("n_tokens").as("widest"), F.max("chunk_idx").as("last_idx"))
    val toks = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val joined = chunks.join(toks, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nChunks, covered, widest, lastIdx, nTok) =
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("covered"),
          r.getAs[Long]("widest"), r.getAs[Long]("last_idx"), r.getAs[Long]("n_tok"))
      // starts at 0,48,96,… strictly below n_tok → ceil(n/48) chunks, indices dense
      assert(nChunks === (nTok + 47) / 48, s"doc ${r.getAs[Long]("doc_id")}")
      assert(lastIdx === nChunks - 1)
      // stride (48) < window (64): every token is in ≥1 chunk, overlap ≤ 16/window
      assert(covered >= nTok && covered <= nTok + 16L * (nChunks - 1))
      assert(widest <= 64)
    }
  }

  test("SmallestKByKey equals global sort-take-k under any partitioning") {
    val rows = (1L to 1000L).map(i => (i * 2654435761L % 997L, i))
    val expected = rows.sorted.take(7)
    val topk = F.udaf(new Aggregators.SmallestKByKey(7),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    for (parts <- Seq(1, 4, 13)) {
      val got = rows.toDF("hk", "id").repartition(parts)
        .agg(topk(col("hk"), col("id")).as("picks"))
        .select(explode(col("picks")).as("p"))
        .select(col("p._1"), col("p._2"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === expected, s"parts=$parts")
    }
  }

  test("bloom contamination is a superset of the exact semi-join (q78)") {
    val dir = sf("sf0.001")
    val bloomDocs = graft.Registry.byName("q87_bloom_contamination")
      .run(spark, dir).select("doc_id").as[Long].collect().toSet
    val exactDocs = graft.Registry.byName("q78_dedup_contamination")
      .run(spark, dir).select("doc_id").as[Long].collect().toSet
    assert(exactDocs.subsetOf(bloomDocs),
      s"bloom must never miss a truly contaminated doc; missing=${exactDocs -- bloomDocs}")
    // the 2-probe/65536-bit sizing should keep FP inflation modest
    assert(bloomDocs.size <= exactDocs.size * 2,
      s"FP blow-up: exact=${exactDocs.size} bloom=${bloomDocs.size}")
  }

  test("int8 quantized ANN keeps high recall vs exact float ANN") {
    val dir = sf("sf0.001")
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val exact = graft.operators.AnnTopK.bruteForce(
        e, "vec_id", "embedding", col("vec_id") % 50 === 0, 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val quant = graft.operators.QuantizedAnn.topK(
        e, "vec_id", "embedding", col("vec_id") % 50 === 0, 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall@5 = $recall")
  }

  test("quantizeI8 rounds half away from zero and spans the full code range") {
    val codes = graft.operators.QuantizedAnn.quantizeI8(
      Array(1.0f, -1.0f, 0.5f, -0.5f, 0.0f))
    assert(codes.toSeq === Seq[Byte](127, -127, 64, -64, 0))
    assert(graft.operators.QuantizedAnn.quantizeI8(Array(0.0f, 0.0f)).toSeq ===
      Seq[Byte](0, 0))
  }
}

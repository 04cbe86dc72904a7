package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("probe finds near-dups of indexed corpus docs, ignores novel ones") {
    val corpusText =
      "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq(
      (1L, corpusText),
      (2L, "completely unrelated corpus document about database engines"),
      (3L, "another unrelated one mentioning shuffles joins and aggregates"))
      .toDF("doc_id", "text")
    val idxPath = Files.createTempDirectory("graft-lsh-idx").toString
    MinHashLsh.writeBandIndex(corpus, "doc_id", "text", idxPath)

    val batch = Seq(
      (100L, corpusText),                           // exact dup of doc 1
      (101L, "a genuinely new document with fresh content entirely"))
      .toDF("doc_id", "text")
    val hits = MinHashLsh.probeNew(batch, corpus, idxPath,
        "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.toSeq === Seq((100L, 1L, 1.0)))
  }

  test("probe hot-bucket cap filters oversized index buckets at the scan") {
    // near-identical (byte-distinct) corpus docs flood their buckets
    val base = (1 to 200).map(i => s"p${i % 19}v$i").mkString(" ")
    val corpus = (1 to 8).map(i => (i.toLong, s"$base unique$i")).toDF("doc_id", "text")
    val idxPath = Files.createTempDirectory("graft-lsh-hot").toString
    MinHashLsh.writeBandIndex(corpus, "doc_id", "text", idxPath)

    val batch = Seq((100L, s"$base unique1")).toDF("doc_id", "text")
    val uncapped = MinHashLsh.probeNew(batch, corpus, idxPath,
        "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.nonEmpty)
    val capped = MinHashLsh.probeNew(batch, corpus, idxPath,
        "doc_id", "text", threshold = 0.8, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped), "cap may only drop hits, never invent them")
  }

  test("probe results equal the batch-mode pairs restricted to cross pairs") {
    val docs = graft.sources.Tables.load(spark, sf(), "documents")
      .limit(200)
    val corpus = docs.filter($"doc_id" % 4 =!= 0)
    val batch = docs.filter($"doc_id" % 4 === 0)
    val idxPath = Files.createTempDirectory("graft-lsh-idx2").toString
    MinHashLsh.writeBandIndex(corpus, "doc_id", "text", idxPath)

    val incremental = MinHashLsh.probeNew(batch, corpus, idxPath,
        "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // oracle: full batch-mode dedup over the union, keeping only
    // (batch x corpus) pairs
    val all = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = all.flatMap { case (a, b) =>
      (a % 4, b % 4) match {
        case (0, x) if x != 0 => Some((a, b))
        case (x, 0) if x != 0 => Some((b, a))
        case _ => None
      }
    }.toSet
    assert(incremental === expected)
    assert(expected.nonEmpty) // the corpus has cross-split near-dups
  }
}

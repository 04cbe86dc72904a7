package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Skew-guard behavior of the LSH dedup path: exact-duplicate collapse
  * before banding (the degenerate-bucket killer), the hot-bucket cap,
  * and the stop-shingle document-frequency cap in the exact-Jaccard
  * join. The 2k-identical-docs case is the one a raw implementation
  * cannot finish: C(2000,2) ≈ 2M candidate pairs each verified by a
  * ~5000-element sorted-merge would be ~10¹⁰ comparisons in one
  * bucket's tasks; with collapse it is one banded representative and a
  * declarative member re-expansion.
  */
class DedupGuardSpec extends SparkSpec {
  import spark.implicits._

  test("2000 identical long documents complete without quadratic verification") {
    val n = 2000
    val text = (1 to 5000).map(i => s"tok${i % 211}x$i").mkString(" ")
    // lit() keeps ONE copy of the 50 KB text in the plan; a local Seq
    // would serialize n copies into every task closure
    val docs = spark.range(1, n + 1)
      .select(col("id").as("doc_id"), lit(text).as("text"))
    val pairs = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.8)
    assert(pairs.count() === n.toLong * (n - 1) / 2)
    assert(pairs.filter(col("jaccard") =!= 1.0).isEmpty)
  }

  test("exact-dup collapse preserves the pair output on a mixed corpus") {
    val base = (1 to 60).map(i => s"w${i % 13}q$i").mkString(" ")
    val near = base.replace("w1q14", "CHANGED") // one token off → high jaccard
    val docs = Seq(
      (1L, base), (2L, base), // exact duplicates
      (3L, near), // near-dup of the group
      (4L, "entirely unrelated content with no shared trigrams at all"))
      .toDF("doc_id", "text")
    val got = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got((1L, 2L)) === 1.0)
    // both members of the exact group pair with the near-dup at the
    // identical jaccard (same shingle set)
    assert(got((1L, 3L)) === got((2L, 3L)))
    assert(got((1L, 3L)) >= 0.8 && got((1L, 3L)) < 1.0)
  }

  test("hot buckets beyond maxBucket are dropped (recall cap) and observable") {
    // near-identical but byte-distinct docs: collapse can't merge them,
    // so they flood band buckets
    val base = (1 to 200).map(i => s"b${i % 17}z$i").mkString(" ")
    val docs = (1 to 8).map(i => (i.toLong, s"$base unique$i")).toDF("doc_id", "text")
    val hot = MinHashLsh.hotBuckets(docs, "doc_id", "text", maxBucket = 2)
    assert(hot.count() > 0, "expected oversized buckets on templated docs")
    val all = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all.size === 8 * 7 / 2, "default cap should find all near-dup pairs")
    val capped = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.8, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(all), "cap may only drop pairs, never invent them")
    // exact duplicates are immune to the cap: they never enter banding
    val dupDocs = (1 to 6).map(i => (i.toLong, base)).toDF("doc_id", "text")
    val dupPairs = MinHashLsh.nearDupPairs(dupDocs, "doc_id", "text", 0.8, maxBucket = 1)
    assert(dupPairs.count() === 15L)
  }

  test("stop-shingle df cap drops ultra-frequent shingles (recall only)") {
    val boiler = (1 to 40).map(i => s"c${i % 11}y$i").mkString(" ")
    val docs = (1 to 5).map(i => (i.toLong, boiler)).toDF("doc_id", "text")
    val exact = MinHashLsh.exactJaccardPairs(docs, "doc_id", "text", 0.8)
    assert(exact.count() === 10L)
    // every shingle has df=5 > 3 → all dropped → intersections vanish
    val capped = MinHashLsh.exactJaccardPairs(docs, "doc_id", "text", 0.8, maxDf = 3L)
    assert(capped.isEmpty)
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFns

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  test("kernel fingerprint is bit-identical to the declarative form") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox jumps"),
      (3L, "completely different words here altogether"),
      (4L, ""), // empty text → single empty token
      (5L, "repeat repeat repeat repeat")).toDF("doc_id", "text")

    val declarative = docs.select(col("doc_id"),
        TextFns.simhash60(TextFns.tokens(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernel = SimHash.fingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel === declarative)
  }

  test("portablePostings kernel matches the declarative shingle+md5 form") {
    val docs = Seq(
      (1L, "s0", "a b c d e"),
      (2L, "s1", "x y"), // short doc → whole-text shingle
      (3L, "s0", "a b c a b c")).toDF("doc_id", "source", "text")
    val declarative = docs
      .select(col("doc_id"), col("source").as("tag"),
        explode(array_distinct(
          TextFns.shingles3(TextFns.tokens(col("text"))))).as("g"))
      .select(col("doc_id"), col("tag"), TextFns.md5hash60(col("g")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val kernel = MinHashLsh.portablePostings(docs, "doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(kernel === declarative)
  }

  test("near-dup pairs: close fingerprints found, distant ones excluded") {
    // doc 2 = doc 1 with one token swapped under a 20× dominating
    // repeat, so every bit's vote sign is set by the repeated token —
    // fingerprints are equal (dist 0), inside the pigeonhole bound
    val base = Array.fill(20)("alpha").mkString(" ")
    val docs = Seq(
      (1L, s"$base beta"),
      (2L, s"$base gamma"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val pairs = SimHash.nearDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }
}

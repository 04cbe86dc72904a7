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

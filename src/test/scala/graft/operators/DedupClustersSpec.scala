package graft.operators

import graft.SparkSpec

class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("label propagation converges on chains and keeps clusters apart") {
    // component A: a 5-node chain (worst diameter shape for H2M);
    // component B: a triangle; no cross edges
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a_id", "b_id")
    val got = DedupClusters.assignments(pairs, "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val chain = (10L to 14L).map(id => (id, 10L, 5L)).toSet
    val tri = (20L to 22L).map(id => (id, 20L, 3L)).toSet
    assert(got === chain ++ tri)
  }

  test("non-convergence at maxIter throws instead of returning wrong reps") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a_id", "b_id")
    val e = intercept[IllegalStateException] {
      DedupClusters.components(pairs, "a_id", "b_id", maxIter = 1)
    }
    assert(e.getMessage.contains("maxIter"))
  }

  test("pointer jumping converges a 40-node chain within the default cap") {
    // one-hop propagation would need ~40 rounds; the jump needs ~log2(40)
    val pairs = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("a_id", "b_id")
    val got = DedupClusters.components(pairs, "a_id", "b_id", maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 40)
    assert(got.values.toSet === Set(0L))
  }
}

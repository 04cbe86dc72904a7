package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def quantized(dir: String): Array[(Long, Array[Long])] =
    Tables.load(spark, sf(dir), "embeddings")
      .select(col("vec_id").cast("long"),
        graft.functions.VectorFns.quantize(col("embedding")))
      .as[(Long, Array[Long])]
      .collect()
      .sortBy(_._1)

  test("assignments match a brute-force in-bucket greedy pass") {
    val T = 0.3
    val vecs = quantized("sf0.001")
    val cid = vecs.map { case (id, v) => id -> SignIvf.cidOf(v, 4) }.toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val expected = vecs.map { case (id, v) =>
      val lower = vecs.filter { case (o, ov) =>
        o < id && cid(o) == cid(id) && cos(ov, v) >= T
      }
      val rep = if (lower.isEmpty) id else lower.map(_._1).min
      (id, cid(id).toLong, if (lower.isEmpty) 1L else 0L, rep)
    }.toSeq

    val got = SemanticDedup.assignments(
        Tables.load(spark, sf("sf0.001"), "embeddings"),
        "vec_id", "embedding", T)
      .orderBy(col("vec_id"))
      .as[(Long, Long, Long, Long)]
      .collect().toSeq

    assert(got === expected)
  }

  test("marking invariants: rep below id, kept iff self-rep, some removal") {
    val out = SemanticDedup.assignments(
        Tables.load(spark, sf("sf0.001"), "embeddings"),
        "vec_id", "embedding", 0.3)
      .as[(Long, Long, Long, Long)]
      .collect()
    assert(out.forall { case (id, _, kept, rep) =>
      if (kept == 1L) rep == id else rep < id
    })
    assert(out.exists(_._3 == 0L), "threshold 0.3 should remove something")
    assert(out.map(_._1).distinct.length == out.length)
  }
}

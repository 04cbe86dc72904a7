package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** SignPq — the analytic (oracle-checkable) IVF-PQ: code layout, and
  * end-to-end ADC serving parity against a driver-side replay of the
  * same analytic model. The trained path keeps its own IvfPqSpec.
  */
class SignPqSpec extends SparkSpec {
  import spark.implicits._

  test("codesOf packs per-subspace sign bits, one byte per subspace") {
    val v = Array(1L, -2L, 3L, 0L, -1L, -1L, 5L, 6L) // sub=4, m=2
    val code = SignPq.codesOf(v, m = 2)
    assert(code.length === 2)
    assert((code(0) & 0xff) === (1 | 4)) // dims 0,2 positive (0 is not > 0 at idx 3)
    assert((code(1) & 0xff) === (4 | 8)) // dims 6,7 positive
    intercept[IllegalArgumentException] { SignPq.codesOf(v, m = 3) }
  }

  test("topK equals a driver-side replay of the analytic model (sf0.001)") {
    val e = Tables.load(spark, sf("sf0.001"), "embeddings")
    val got = SignPq.topK(e, "vec_id", "embedding", col("vec_id") % 50 === 0,
        signDims = 4, nprobe = 4, k = 5, m = 8)
      .as[(Long, Long, Long, Long)].collect().toSeq

    val vecs = e.select(col("vec_id").cast("long"),
        graft.functions.VectorFns.quantize(col("embedding")))
      .as[(Long, Array[Long])].collect().sortBy(_._1)
    val cid = vecs.map { case (id, v) => id -> SignIvf.cidOf(v, 4) }.toMap
    val existing = vecs.map(t => cid(t._1)).distinct.sorted
    val expected = vecs.filter(_._1 % 50 == 0).flatMap { case (qid, qv) =>
      val gs = SignIvf.groupSums(qv, 4)
      def align(c: Int): Long =
        (0 until 4).map(d => if ((c & (1 << d)) != 0) gs(d) else -gs(d)).sum
      val probes = existing.sortBy(c => (-align(c), c)).take(4).toSet
      val scored = vecs.filter(t => t._1 != qid && probes(cid(t._1)))
        .map { case (oid, ov) =>
          val adc = qv.indices.map(d => if (ov(d) > 0L) qv(d) else -qv(d)).sum
          (oid, adc)
        }
        .sortBy { case (oid, adc) => (-adc, oid) }
        .take(5)
      scored.zipWithIndex.map { case ((oid, adc), r) =>
        (qid, (r + 1).toLong, oid, adc)
      }
    }.toSeq
    assert(got === expected)
  }
}

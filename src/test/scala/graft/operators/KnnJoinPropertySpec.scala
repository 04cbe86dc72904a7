package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Randomized cross-check: KnnJoin.withinGroups against a plain-Scala
  * brute-force reference on random vectors/groups — same quantization
  * and integer-dot arithmetic, so results must match bit-for-bit
  * including the sim doubles.
  */
class KnnJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def quant(v: Array[Float]): Array[Long] =
    v.map { x =>
      val t = x.toDouble * 1e7
      if (t >= 0) math.floor(t + 0.5).toLong else math.ceil(t - 0.5).toLong
    }

  test("matches a brute-force reference on random data (3 seeds)") {
    for (seed <- Seq(7, 23, 99)) {
      val rnd = new Random(seed)
      val n = 60 + rnd.nextInt(40)
      val dims = 4 + rnd.nextInt(8)
      val groups = 1 + rnd.nextInt(4)
      val k = 1 + rnd.nextInt(5)
      val blocks = 2 + rnd.nextInt(6)
      val rows = (0 until n).map { i =>
        (i.toLong, rnd.nextInt(groups).toLong,
          Array.fill(dims)((rnd.nextFloat() - 0.5f) * 2f))
      }

      // driver-side reference: all within-group pairs, exact top-k
      val q = rows.map { case (id, g, v) => (id, g, quant(v)) }
      val expected = q.flatMap { case (id, g, va) =>
        val na = math.sqrt(va.map(x => x * x).sum.toDouble)
        q.filter { case (oid, og, _) => og == g && oid != id }
          .map { case (oid, _, vb) =>
            val nb = math.sqrt(vb.map(x => x * x).sum.toDouble)
            val dot = va.zip(vb).map { case (x, y) => x * y }.sum
            (id, oid, dot.toDouble / (na * nb))
          }
          .sortBy { case (_, oid, sim) => (-sim, oid) }
          .take(k)
          .zipWithIndex
          .map { case ((i2, oid, sim), r) => (i2, r + 1L, oid, sim) }
      }.sortBy(t => (t._1, t._2))

      val got = KnnJoin.withinGroups(
          rows.toDF("vec_id", "label", "embedding"),
          "vec_id", "embedding", "label", k, blocks)
        .orderBy("id", "rank")
        .collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim")))
        .toSeq

      assert(got === expected, s"seed=$seed n=$n dims=$dims groups=$groups k=$k blocks=$blocks")
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** PCA whitening: transformed corpus has ≈ zero mean and ≈ identity
  * covariance on the kept components, the fit is reproducible, and
  * partitioning changes only float-dust.
  */
class WhiteningSpec extends SparkSpec {
  import spark.implicits._

  test("whitened embeddings have zero mean and identity covariance") {
    val e = Tables.load(spark, sf("sf0.001"), "embeddings")
    val k = 8
    val model = Whitening.fit(e, "embedding", k)
    assert(model.proj.length === k)
    assert(model.proj.forall(_.length === model.mean.length))

    val y = Whitening.transform(e, "vec_id", "embedding", model)
      .select(col("white")).as[Array[Double]].collect()
    val n = y.length
    for (i <- 0 until k) {
      val mean = y.map(_(i)).sum / n
      assert(math.abs(mean) < 1e-9, s"component $i mean $mean")
      for (j <- i until k) {
        val cov = y.map(v => (v(i) - mean) * v(j)).sum / n
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(cov - want) < 1e-6, s"cov($i,$j) = $cov")
      }
    }
  }

  test("fit is reproducible and partitioning-robust") {
    val e = Tables.load(spark, sf("sf0.001"), "embeddings")
    val a = Whitening.fit(e, "embedding", 4)
    val b = Whitening.fit(e, "embedding", 4)
    assert(a.mean.toSeq === b.mean.toSeq, "same layout → bit-identical mean")
    assert(a.proj.map(_.toSeq).toSeq === b.proj.map(_.toSeq).toSeq)

    val c = Whitening.fit(e.repartition(7), "embedding", 4)
    a.mean.zip(c.mean).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-8) }
    a.proj.flatMap(_.toSeq).zip(c.proj.flatMap(_.toSeq)).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6, s"$x vs $y") }
  }

  test("analytic whitening equalizes second moments across directions and is partitioning-exact") {
    val e = Tables.load(spark, sf("sf0.001"), "embeddings")
    val y = Whitening.analyticWhiten(e, "vec_id", "embedding")
      .select(col("y")).as[Array[Long]].collect()
    val d = y.head.length
    assert(d === 64)
    // each direction's corpus second moment lands on the 1e12 target
    // (Y_j = Z_j/√(Σ Z² + 1) · 1e6 ⇒ Σ Y² ≈ 1e12), up to quantization
    val moments = (0 until d).map(j => y.map(v => v(j).toDouble * v(j)).sum)
    moments.zipWithIndex.foreach { case (m, j) =>
      assert(math.abs(m / 1e12 - 1.0) < 1e-3,
        s"direction $j second moment $m not equalized") }
    // exact integer pipeline: any partitioning gives bit-equal output
    val z = Whitening.analyticWhiten(e.repartition(7), "vec_id", "embedding")
      .select(col("vec_id"), col("y")).as[(Long, Array[Long])]
      .collect().sortBy(_._1).map(_._2.toSeq)
    val base = Whitening.analyticWhiten(e, "vec_id", "embedding")
      .select(col("vec_id"), col("y")).as[(Long, Array[Long])]
      .collect().sortBy(_._1).map(_._2.toSeq)
    assert(z.toSeq === base.toSeq)
  }
}

package graft.operators

import org.apache.commons.math3.linear.{Array2DRowRealMatrix, EigenDecomposition}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA whitening for embedding columns — the standard preprocessing
  * step before cosine retrieval / clustering / semantic dedup when
  * embeddings come out of a model with anisotropic geometry (dominant
  * directions crowd every cosine toward 1, hiding real neighbors).
  * Fit estimates mean + covariance, decomposes, and keeps the top `k`
  * components scaled to unit variance: `y = Λ^(-1/2ᵏ) Uᵏᵀ (x − μ)`.
  *
  * Distribution shape (the [[IvfIndex.train]] doctrine):
  *  - ONE pass over the corpus computes per-partition partial
  *    (n, Σx, Σxxᵀ) moments — a d + d(d+1)/2-double payload per
  *    partition (~17 KB at d=64) — combined per fixed partition order
  *    on executors so only one tiny row reaches the driver and the
  *    float summation order is deterministic for a given partitioning;
  *  - the d×d eigen-decomposition runs on the driver (commons-math3,
  *    shipped with Spark) — d is the embedding width, never the corpus;
  *  - transform is map-only over the broadcast model.
  *
  * Determinism: eigenvectors are sign-canonicalized (largest-|entry|
  * coordinate made positive) and ordered by (eigenvalue desc, index),
  * so refitting on the same partitioning reproduces the model bit for
  * bit; different partitionings differ by float-summation order only
  * (≪ 1e-8 on unit-scale data).
  */
object Whitening {

  /** `mean` length d; `proj` is k×d — row i is the i-th whitened
    * direction already scaled by its 1/√eigenvalue.
    */
  final case class Model(mean: Array[Double], proj: Array[Array[Double]])

  def fit(e: DataFrame, embCol: String, k: Int, eps: Double = 1e-9): Model = {
    val spark = e.sparkSession
    import spark.implicits._
    val vecs = e.select(col(embCol)).as[Array[Float]]
    // per-partition moment partials, combined in fixed pid order
    val partials = vecs.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var n = 0L
      var s: Array[Double] = null
      var ss: Array[Double] = null // upper triangle, row-major
      rows.foreach { f =>
        val d = f.length
        if (s == null) { s = new Array[Double](d); ss = new Array[Double](d * (d + 1) / 2) }
        n += 1
        var i = 0; var t = 0
        while (i < d) {
          val xi = f(i).toDouble
          s(i) += xi
          var j = i
          while (j < d) { ss(t) += xi * f(j).toDouble; j += 1; t += 1 }
          i += 1
        }
      }
      if (s == null) Iterator.empty else Iterator.single((pid, n, s, ss))
    }
    val (n, sum, sumsq) = partials
      .map { case (pid, pn, ps, pss) => (0, (pid, pn, ps, pss)) }
      .groupByKey(1)
      .mapValues { parts =>
        val sorted = parts.toArray.sortBy(_._1)
        val d = sorted.head._3.length
        val s = new Array[Double](d); val ss = new Array[Double](d * (d + 1) / 2)
        var n = 0L
        sorted.foreach { case (_, pn, ps, pss) =>
          n += pn
          var i = 0; while (i < d) { s(i) += ps(i); i += 1 }
          var t = 0; while (t < ss.length) { ss(t) += pss(t); t += 1 }
        }
        (n, s, ss)
      }
      .values.collect().head
    require(n > 1, s"whitening needs > 1 vector, got $n")
    val d = sum.length
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")

    val mean = sum.map(_ / n)
    val cov = new Array2DRowRealMatrix(d, d)
    var i = 0; var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = sumsq(t) / n - mean(i) * mean(j)
        cov.setEntry(i, j, c); cov.setEntry(j, i, c)
        j += 1; t += 1
      }
      i += 1
    }
    val eig = new EigenDecomposition(cov)
    // order by (eigenvalue desc, original index) and sign-canonicalize
    val order = (0 until d).sortBy(c => (-eig.getRealEigenvalue(c), c)).take(k)
    val proj = order.map { c =>
      val v = eig.getEigenvector(c).toArray
      val m = v.indices.maxBy(x => (math.abs(v(x)), -x))
      val sgn = if (v(m) < 0) -1.0 else 1.0
      val scale = sgn / math.sqrt(math.max(eig.getRealEigenvalue(c), 0.0) + eps)
      v.map(_ * scale)
    }.toArray
    Model(mean, proj)
  }

  /** Map-only projection: (idCol, whitened array<double> of length k). */
  def transform(e: DataFrame, idCol: String, embCol: String,
      model: Model): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    e.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])]
      .map { case (id, f) =>
        val Model(mu, w) = bc.value
        val y = new Array[Double](w.length)
        var r = 0
        while (r < w.length) {
          val row = w(r); var acc = 0.0; var i = 0
          while (i < row.length) { acc += row(i) * (f(i).toDouble - mu(i)); i += 1 }
          y(r) = acc
          r += 1
        }
        (id, y)
      }
      .toDF(idCol, "white")
  }
}

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

  /** ANALYTIC whitening — the [[graft.operators.SignPq]] doctrine
    * applied to whitening so the whole transform replays in portable
    * SQL (the PCA path above cannot: no SQL engine eigendecomposes).
    * The rotation is the FIXED Sylvester-Hadamard basis
    * `h(j,i) = (−1)^popcount(j AND i)` (orthogonal, data-independent);
    * only the per-direction variances come from the data. The output
    * equalizes second moments across the 64 rotated directions —
    * variance whitening in a fixed basis, the same family as PCA
    * whitening minus the data-driven rotation.
    *
    * Exactness contract (why this hash-matches a DuckDB replay):
    *  - inputs quantized to 1e-7 BIGINTs ([[graft.functions.VectorFns.quantize]]);
    *  - centering is exact: `zin_i = n·q_i − Σq_i` (scaled by n so no
    *    division truncates), |zin| ≤ 2n·maxq ≈ 2^35 at bench scale;
    *  - the rotated coordinate `Z_j = Σ_i h(j,i)·zin_i` is an exact
    *    long (≤ 2^41); the per-direction moment `Σ_docs Z²` is summed
    *    in decimal(38,0) (Spark) / HUGEINT (DuckDB) — exact integers
    *    either way;
    *  - the only float steps are one divide+sqrt+multiply+round per
    *    coordinate (`Y_j = round(Z_j / sqrt(vn_j + 1) · 1e6)`), each
    *    IEEE-correctly-rounded from identical integers, so
    *    bit-identical across engines.
    *
    * Distribution shape: two 64-group aggregates (per-dim sums, then
    * per-direction moments) + map-only kernels; the corpus is scanned
    * three times and never shuffled by row. The 4096-op rotation is
    * fixed per-row cost — a plan that survives any corpus size.
    *
    * Returns (idCol, y array<long> of length d) — whitened coordinates
    * at 1e-6 resolution, ready for exact integer cosine.
    */
  def analyticWhiten(e: DataFrame, idCol: String, embCol: String): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val q = e.select(col(idCol).cast("long").as(idCol),
      graft.functions.VectorFns.quantize(col(embCol)).as("qv"))
    // corpus moments: one row of (n, per-dim sums) — control-plane sized
    val sums = q.select(posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(sum(col("x")).as("sx"))
      .agg(org.apache.spark.sql.functions.transform(
        array_sort(collect_list(struct(col("pos"), col("sx")))),
        p => p.getField("sx")).as("sarr"))
    val tot = q.agg(count(lit(1)).as("n"))
    // exact integer Hadamard rotation of the n-scaled centered vector
    val z = q.crossJoin(broadcast(sums)).crossJoin(broadcast(tot))
      .select(col(idCol), col("qv"), col("sarr"), col("n"))
      .as[(Long, Array[Long], Array[Long], Long)]
      .map { case (id, qv, sarr, n) =>
        val d = qv.length
        val zin = new Array[Long](d)
        var i = 0
        while (i < d) { zin(i) = qv(i) * n - sarr(i); i += 1 }
        val zz = new Array[Long](d)
        var j = 0
        while (j < d) {
          var acc = 0L; var k = 0
          while (k < d) {
            if (java.lang.Long.bitCount(j & k) % 2 == 0) acc += zin(k)
            else acc -= zin(k)
            k += 1
          }
          zz(j) = acc; j += 1
        }
        (id, zz)
      }.toDF(idCol, "z")
    // per-direction second moments, exact in decimal(38,0)
    val vn = z.select(posexplode(col("z")).as(Seq("pos", "zx")))
      .groupBy(col("pos"))
      .agg(sum(col("zx").cast("decimal(38,0)") * col("zx")).as("vn"))
      .agg(org.apache.spark.sql.functions.transform(
        array_sort(collect_list(struct(col("pos"), col("vn")))),
        p => p.getField("vn")).as("vnarr"))
    // variance-equalized coordinates at 1e-6 resolution (+1 guards a
    // zero-variance direction; it is exact integer arithmetic, so the
    // oracle replays it verbatim)
    z.crossJoin(broadcast(vn))
      .select(col(idCol),
        zip_with(col("z"), col("vnarr"), (zx, v) =>
          round(zx.cast("double") / sqrt((v + lit(1)).cast("double")) * lit(1e6))
            .cast("long")).as("y"))
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

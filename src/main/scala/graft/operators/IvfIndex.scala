package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** IVF (inverted-file) approximate nearest neighbor — the 100 TB scale
  * path for embedding search. A k-means coarse quantizer (spherical /
  * cosine k-means, Lloyd iterations expressed as DataFrame plans)
  * partitions the corpus into `nlist` buckets; a query probes its
  * `nprobe` nearest centroids and runs exact cosine top-k inside those
  * buckets only, scanning ~nprobe/nlist of the corpus.
  *
  * Distribution shape: vectors never leave their partitions during
  * training except as per-dimension partial sums (posexplode →
  * groupBy(cluster, dim) — a shuffle of 64·nlist aggregates, not of
  * vectors); centroids are tiny and broadcast. Assignment is a
  * broadcast nested-loop against ≤ nlist rows. At serving time the
  * bucketed corpus would be written out partitioned by cluster id so a
  * probe prunes partitions at the scan.
  */
object IvfIndex {

  final case class Params(nlist: Int = 16, nprobe: Int = 4, iters: Int = 3, k: Int = 5)

  /** Normalized double vectors from a raw float embedding column. */
  private def normalized(embeddings: DataFrame, embCol: String): DataFrame = {
    val q = VectorFns.quantize(col(embCol))
    embeddings
      .withColumn("_q", q)
      .withColumn("_n2", VectorFns.qnorm2(col("_q")))
      .withColumn("_x", transform(col("_q"),
        xi => xi.cast("double") / sqrt(col("_n2").cast("double"))))
      .drop("_q", "_n2")
  }

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Train the coarse quantizer and assign every vector to a cluster.
    * Deterministic: init = the `nlist` lowest-id vectors.
    */
  def assign(embeddings: DataFrame, idCol: String, embCol: String,
      p: Params): DataFrame = {
    val v = normalized(embeddings, embCol).persist()
    val spark = embeddings.sparkSession
    import spark.implicits._

    var centroids: Seq[(Int, Seq[Double])] =
      v.orderBy(col(idCol)).limit(p.nlist).select(col("_x"))
        .collect().zipWithIndex
        .map { case (r, i) => i -> r.getSeq[Double](0) }.toSeq

    var assigned: DataFrame = null
    for (_ <- 1 to p.iters) {
      val centDf = centroids.toDF("_cid", "_cvec")
      val w = Window.partitionBy(col(idCol)).orderBy(col("_cdot").desc, col("_cid"))
      assigned = v.crossJoin(broadcast(centDf))
        .withColumn("_cdot", dot(col("_x"), col("_cvec")))
        .withColumn("_crn", row_number().over(w))
        .filter(col("_crn") === 1)
        .drop("_crn", "_cvec")
      // per-dimension means → new normalized centroids (tiny aggregate)
      val dims = assigned
        .select(col("_cid"), posexplode(col("_x")).as(Seq("_dim", "_val")))
        .groupBy(col("_cid"), col("_dim")).agg(avg(col("_val")).as("_m"))
        .collect()
      centroids = dims.groupBy(_.getInt(0)).map { case (cid, rows) =>
        val vec = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        val norm = math.sqrt(vec.map(x => x * x).sum)
        cid -> (if (norm > 0) vec.map(_ / norm) else vec)
      }.toSeq.sortBy(_._1)
    }
    assigned.drop("_cdot")
  }

  /** Exact top-k among the vectors in the query's `nprobe` nearest
    * buckets. `queryPred` selects the query rows out of the corpus.
    */
  def topK(embeddings: DataFrame, idCol: String, embCol: String,
      queryPred: Column, p: Params = Params()): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._

    val assigned = assign(embeddings, idCol, embCol, p).persist()
    // recompute final centroids from the assignment (already converged)
    val centDf = {
      val dims = assigned
        .select(col("_cid"), posexplode(col("_x")).as(Seq("_dim", "_val")))
        .groupBy(col("_cid"), col("_dim")).agg(avg(col("_val")).as("_m"))
        .collect()
      dims.groupBy(_.getInt(0)).map { case (cid, rows) =>
        val vec = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        val norm = math.sqrt(vec.map(x => x * x).sum)
        cid -> (if (norm > 0) vec.map(_ / norm) else vec)
      }.toSeq.sortBy(_._1).toDF("_cid", "_cvec")
    }

    val queries = assigned.filter(queryPred)
      .select(col(idCol).as("q_id"), col("_x").as("_qx"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("_cdot").desc, col("_cid"))
    val probes = broadcast(queries).crossJoin(broadcast(centDf))
      .withColumn("_cdot", dot(col("_qx"), col("_cvec")))
      .withColumn("_crn", row_number().over(wProbe))
      .filter(col("_crn") <= p.nprobe)
      .select(col("q_id"), col("_qx"), col("_cid"))

    val wTop = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col(idCol))
    broadcast(probes).join(assigned, Seq("_cid"))
      .filter(col("q_id") =!= col(idCol))
      .withColumn("sim", dot(col("_qx"), col("_x")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= p.k)
      .select(col("q_id"), col("rank"), col(idCol).as("neighbor_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-quantized (int8) brute-force ANN — the memory-bandwidth
  * scale path for exact-ish search: each vector is quantized to one
  * byte per dimension (`round(x·127/max|x|)`, per-vector scale), a 4×
  * size cut vs float32 that turns a 100 TB embedding corpus into a
  * 25 TB scan, with dot products in cheap integer arithmetic. The
  * serving shape is identical to [[AnnTopK]]: corpus scanned once and
  * never shuffled, queries collected (bounded) and broadcast,
  * per-partition bounded heaps.
  *
  * Determinism contract: quantized codes are exact small integers
  * (|q| ≤ 127), so integer dot products are exact in Long and the
  * final cosine `dot / (sqrt(|a|²)·sqrt(|b|²))` is bit-identical to a
  * DuckDB oracle replaying the same quantizer (`q86`). Rounding is
  * half-away-from-zero — the convention both Spark's `round` and
  * DuckDB's `round` use — so codes agree everywhere. Similarity is
  * computed between CODES, not originals: quantization error is part
  * of the operator's semantics (that's the accuracy/size trade being
  * measured), and `QuantizedAnnSpec` pins its recall against exact
  * float search.
  */
object QuantizedAnn {

  /** round half away from zero, matching Spark/DuckDB `round` */
  @inline private def roundAway(v: Double): Int =
    if (v >= 0) math.floor(v + 0.5).toInt else math.ceil(v - 0.5).toInt

  /** Quantize one vector to int8 codes (per-vector max-abs scale). */
  private[graft] def quantizeI8(v: Array[Float]): Array[Byte] = {
    var mx = 0.0
    var i = 0
    while (i < v.length) { val a = math.abs(v(i).toDouble); if (a > mx) mx = a; i += 1 }
    val out = new Array[Byte](v.length)
    if (mx > 0) {
      i = 0
      while (i < v.length) {
        out(i) = roundAway(v(i).toDouble * 127.0 / mx).toByte
        i += 1
      }
    }
    out
  }

  /** Exact top-k cosine neighbors over int8-quantized codes for every
    * row matching `queryPred`. Output (q_id, rank, neighbor_id, sim),
    * rank 1-based long. Query side bounded by `maxQueries` (loud
    * failure, never a driver OOM — same contract as [[AnnTopK]]).
    */
  def topK(e: DataFrame, idCol: String, embCol: String,
      queryPred: Column, k: Int, maxQueries: Int = 4096): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._

    val quant = e.select(col(idCol).cast("long").as("id"),
        col(embCol).as("v"), queryPred.as("is_q"))
      .as[(Long, Array[Float], Boolean)]
      .map { case (id, v, isQ) => (id, quantizeI8(v), isQ) }
    val queries = AnnTopK.boundedQueryCollect(
      quant.filter(_._3).map(r => (r._1, r._2)).take(maxQueries + 1), maxQueries)
    val bc = spark.sparkContext.broadcast(queries)

    // one corpus pass; int dot products; |Q| bounded heaps per partition
    val partials = quant.map(r => (r._1, r._2)).mapPartitions { rows =>
      val qs = bc.value
      val nq = qs.length
      if (nq == 0 || !rows.hasNext) Iterator.empty
      else {
        val qNorm = new Array[Double](nq)
        var qi = 0
        while (qi < nq) {
          val q = qs(qi)._2
          var s = 0L; var d = 0
          while (d < q.length) { s += q(d).toLong * q(d); d += 1 }
          qNorm(qi) = math.sqrt(s.toDouble)
          qi += 1
        }
        val heaps = Array.fill(nq)(new BoundedTopK(k))
        rows.foreach { case (cid, cv) =>
          var s = 0L; var d = 0
          while (d < cv.length) { s += cv(d).toLong * cv(d); d += 1 }
          val cNorm = math.sqrt(s.toDouble)
          if (cNorm > 0) {
            var q = 0
            while (q < nq) {
              if (qs(q)._1 != cid) {
                val qv = qs(q)._2
                var dot = 0L; var i = 0
                while (i < qv.length) { dot += qv(i).toLong * cv(i); i += 1 }
                heaps(q).push(dot.toDouble / (qNorm(q) * cNorm), cid)
              }
              q += 1
            }
          }
        }
        (0 until nq).iterator.flatMap { q =>
          heaps(q).entries.map { case (id, sim) => (qs(q)._1, id, sim) }
        }
      }
    }

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    partials.toDF("q_id", "neighbor_id", "sim")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}

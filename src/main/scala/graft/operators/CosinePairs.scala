package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Exact all-pairs cosine similarity over a small-to-medium corpus —
  * the exact near-dup baseline (`q74`). This is the one operator where
  * the declarative form genuinely can't compete: per-pair dot products
  * through interpreted higher-order functions cost ~3 µs/pair, while a
  * primitive-array kernel does ~10 ns/pair. Per SURVEY.md §7.3's
  * ladder this is the measured case for (d) `mapPartitions`.
  *
  * Shape: quantize in Spark (so the integer math is bit-identical to
  * the declarative/oracle form), broadcast the quantized corpus
  * (all-pairs exact is definitionally a fits-in-memory corpus — beyond
  * that you use LSH/IVF pruning), then partition the outer index range
  * so every executor core scans a slice of rows against the broadcast.
  * Emits only pairs ≥ threshold, so output stays sparse.
  */
object CosinePairs {

  def exact(e: DataFrame, idCol: String, embCol: String,
      threshold: Double): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._

    val quantized: Dataset[(Long, Array[Long])] =
      e.select(col(idCol).cast("long"), VectorFns.quantize(col(embCol)))
        .as[(Long, Array[Long])]
    // corpus to driver once; ids sorted so (a_id < b_id) ⇔ (i < j)
    val corpus = quantized.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)
    val n = corpus.length

    // over-split the index range: row i scans (n-i) partners, so
    // contiguous slices are skewed — small slices let the scheduler
    // even the load out
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 4).as[Long]
      .mapPartitions { idxs =>
        val arr = bc.value
        val m = arr.length
        val norms = new Array[Double](m)
        var t = 0
        while (t < m) {
          val v = arr(t)._2
          var s = 0L; var d = 0
          while (d < v.length) { s += v(d) * v(d); d += 1 }
          norms(t) = math.sqrt(s.toDouble)
          t += 1
        }
        idxs.flatMap { ii =>
          val i = ii.toInt
          val (ida, va) = arr(i)
          Iterator.range(i + 1, m).flatMap { j =>
            val (idb, vb) = arr(j)
            var dot = 0L; var d = 0
            while (d < va.length) { dot += va(d) * vb(d); d += 1 }
            val sim = dot.toDouble / (norms(i) * norms(j))
            if (sim >= threshold) Iterator.single((ida, idb, sim))
            else Iterator.empty
          }
        }
      }
      .toDF("a_id", "b_id", "sim")
  }
}

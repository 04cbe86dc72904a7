package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Exact all-pairs cosine similarity — the exact near-dup baseline
  * (`q74`). This is the one operator where the declarative form
  * genuinely can't compete: per-pair dot products through interpreted
  * higher-order functions cost ~3 µs/pair, while a primitive-array
  * kernel does ~10 ns/pair. Per SURVEY.md §7.3's ladder this is the
  * measured case for (d) `mapPartitions`.
  *
  * Distribution shape: block-pair decomposition, no driver
  * materialization anywhere. Rows are assigned to `blocks` (B) buckets
  * by id; each row is replicated to the B unordered block-pair keys it
  * participates in (one shuffle of B× the corpus — the standard
  * block-nested-loop trade); each of the B(B+1)/2 reduce groups holds
  * two blocks (≈ 2·|corpus|/B vectors — the executor-memory knob: at
  * 100× data, raise B by ~100× and group memory is unchanged while
  * group count grows B², keeping every core busy) and runs the
  * primitive kernel over its cross/triangular pair range. Each
  * unordered row pair lands in exactly one group, so the union of the
  * group outputs is the exact pair set. Emits only pairs ≥ threshold.
  *
  * Determinism: quantized-integer dot products ([[VectorFns.quantize]]
  * contract), IEEE divide by the two sqrt'd norms — commutative, so
  * bit-identical to the declarative/oracle form regardless of block
  * layout.
  */
object CosinePairs {

  def exact(e: DataFrame, idCol: String, embCol: String,
      threshold: Double, blocks: Int = 16): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    bucketedPairs(
      e.select(col(idCol).cast("long"), VectorFns.quantize(col(embCol)),
          lit(0).as("bucket"))
        .as[(Long, Array[Long], Int)],
      threshold, blocks)
  }

  /** Block-pair cosine pairs *within* each bucket: only rows sharing a
    * bucket id are ever compared (the [[SemanticDedup]] shape — bucket
    * = sign-cluster; `exact` is the single-bucket case). Each bucket is
    * independently block-pair-decomposed, so per-reduce-group memory
    * stays ≈ 2·|bucket|/B vectors no matter how large a bucket grows,
    * and distinct buckets' groups schedule in parallel.
    */
  private[operators] def bucketedPairs(
      quantized: org.apache.spark.sql.Dataset[(Long, Array[Long], Int)],
      threshold: Double, blocks: Int): DataFrame = {
    val spark = quantized.sparkSession
    import spark.implicits._
    val B = blocks

    // replicate each row to every block pair containing its block,
    // scoped to its bucket
    val replicated = quantized.flatMap { case (id, v, bucket) =>
      val b = (((id % B) + B) % B).toInt
      (0 until B).iterator.map { o =>
        (bucket, math.min(b, o), math.max(b, o), b, id, v)
      }
    }

    replicated
      .groupByKey(t => (t._1, t._2, t._3))
      .flatMapGroups { (key: (Int, Int, Int), it: Iterator[(Int, Int, Int, Int, Long, Array[Long])]) =>
        val (_, ki, kj) = key
        val left = ArrayBuffer.empty[(Long, Array[Long])]
        val right = ArrayBuffer.empty[(Long, Array[Long])]
        it.foreach { case (_, _, _, b, id, v) =>
          if (b == ki) left += ((id, v)) else right += ((id, v))
        }

        def norms(xs: ArrayBuffer[(Long, Array[Long])]): Array[Double] = {
          val out = new Array[Double](xs.length)
          var i = 0
          while (i < xs.length) {
            val v = xs(i)._2
            var s = 0L; var d = 0
            while (d < v.length) { s += v(d) * v(d); d += 1 }
            out(i) = math.sqrt(s.toDouble)
            i += 1
          }
          out
        }

        @inline def score(va: Array[Long], vb: Array[Long]): Long = {
          var dot = 0L; var d = 0
          while (d < va.length) { dot += va(d) * vb(d); d += 1 }
          dot
        }

        if (ki == kj) {
          // single block: triangular scan over distinct index pairs
          val n = left.length
          val nm = norms(left)
          (0 until n).iterator.flatMap { i =>
            val (ida, va) = left(i)
            Iterator.range(i + 1, n).flatMap { j =>
              val (idb, vb) = left(j)
              val sim = score(va, vb).toDouble / (nm(i) * nm(j))
              if (sim >= threshold) {
                val (lo, hi) = if (ida < idb) (ida, idb) else (idb, ida)
                Iterator.single((lo, hi, sim))
              } else Iterator.empty
            }
          }
        } else {
          val nmL = norms(left); val nmR = norms(right)
          left.indices.iterator.flatMap { i =>
            val (ida, va) = left(i)
            right.indices.iterator.flatMap { j =>
              val (idb, vb) = right(j)
              val sim = score(va, vb).toDouble / (nmL(i) * nmR(j))
              if (sim >= threshold) {
                val (lo, hi) = if (ida < idb) (ida, idb) else (idb, ida)
                Iterator.single((lo, hi, sim))
              } else Iterator.empty
            }
          }
        }
      }
      .toDF("a_id", "b_id", "sim")
  }
}

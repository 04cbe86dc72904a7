package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Exact k-nearest-neighbor JOIN within groups (`q91`): for every
  * vector, its k most-cosine-similar neighbors among vectors sharing a
  * group key (label, topic, language, shard …). This is the
  * *symmetric* companion to [[AnnTopK.bruteForce]] — there the query
  * side is small-by-construction and broadcast; here every row is both
  * query and candidate, so a broadcast would ship the whole corpus.
  *
  * Distribution shape ([[CosinePairs]]'s block-pair decomposition plus
  * a two-stage top-k):
  *
  *   1. rows are replicated to the B unordered block pairs of their
  *      group (shuffle = B× corpus, the standard block-nested-loop
  *      trade); each (group, blockI, blockJ) reduce task holds
  *      ≈ 2·|group|/B vectors — raise B with data so task memory is
  *      flat while task count grows B²;
  *   2. each task runs the primitive integer-dot kernel over its pair
  *      range keeping a bounded per-row heap of the k best neighbors
  *      seen *in this task* — so a task emits ≤ rows×k candidates, not
  *      its full pair range;
  *   3. a final per-row top-k over the ≤ B·k surviving candidates per
  *      row (window partition = one row id, bounded by B·k rows — never
  *      a scale concern).
  *
  * Every unordered within-group pair is scored in exactly one task, so
  * stage-3 input is a superset of the true top-k and the result is
  * exact. Determinism: quantized-integer dot products
  * ([[VectorFns.quantize]]), IEEE divide by the two sqrt'd norms, ties
  * broken by ascending neighbor id at both heap and window stage — the
  * same total order, so block layout cannot change the result.
  *
  * Contracts: the group key may be any type — integral keys pass
  * through, anything else blocks on its xxhash64 (collision odds
  * ~n²/2⁶⁴ per group-pair merge two groups' candidate pools; the
  * original values are restored in the output). Zero-norm vectors are
  * skipped — no output row, never a neighbor — matching
  * [[graft.plans.CosineSim]]'s zero-norm-yields-NULL convention.
  */
object KnnJoin {

  def withinGroups(e: DataFrame, idCol: String, embCol: String,
      groupCol: String, k: Int, blocks: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = e.sparkSession
    import spark.implicits._
    val B = blocks

    // integral group keys flow through as their own value; any other
    // type (label/topic/language strings …) is blocked on its xxhash64
    // — a silent cast-to-null would otherwise crash the non-nullable
    // encoder — and the original value is re-attached at the end
    val integralGroup = e.schema(groupCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val gkey =
      if (integralGroup) col(groupCol).cast("long") else xxhash64(col(groupCol))

    val quantized = e.select(gkey, col(idCol).cast("long"),
        VectorFns.quantize(col(embCol)))
      .as[(Long, Long, Array[Long])]
      // zero-norm vectors cannot be cosine-scored: skip them entirely
      // (no output row, never a neighbor) — the kernel analog of
      // CosineSim's zero-norm-yields-NULL convention; a NaN sim would
      // order inconsistently through the heaps and the rank window
      .filter((t: (Long, Long, Array[Long])) => t._3.exists(_ != 0L))

    // replicate each row to every block pair containing its block,
    // scoped to its group key
    val replicated = quantized.flatMap { case (g, id, v) =>
      val b = (((id % B) + B) % B).toInt
      (0 until B).iterator.map { o =>
        (g, math.min(b, o), math.max(b, o), b, id, v)
      }
    }

    val candidates = replicated
      .groupByKey(t => (t._1, t._2, t._3))
      .flatMapGroups { (key: (Long, Int, Int), it: Iterator[(Long, Int, Int, Int, Long, Array[Long])]) =>
        val (g, ki, kj) = key
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

        @inline def dot(va: Array[Long], vb: Array[Long]): Long = {
          var s = 0L; var d = 0
          while (d < va.length) { s += va(d) * vb(d); d += 1 }
          s
        }

        // bounded best-k per row: parallel sim/id arrays sorted best
        // first (sim desc, id asc); insertion shift — k is small
        final class Heap {
          val sims = new Array[Double](k)
          val ids = new Array[Long](k)
          var n = 0
          def offer(sim: Double, id: Long): Unit = {
            if (n == k && (sim < sims(n - 1) ||
                (sim == sims(n - 1) && id > ids(n - 1)))) return
            var pos = if (n < k) n else k - 1
            while (pos > 0 && (sims(pos - 1) < sim ||
                (sims(pos - 1) == sim && ids(pos - 1) > id))) {
              sims(pos) = sims(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
            }
            sims(pos) = sim; ids(pos) = id
            if (n < k) n += 1
          }
        }

        if (ki == kj) {
          val n = left.length
          val nm = norms(left)
          val heaps = Array.fill(n)(new Heap)
          var i = 0
          while (i < n) {
            val (_, va) = left(i)
            var j = i + 1
            while (j < n) {
              val sim = dot(va, left(j)._2).toDouble / (nm(i) * nm(j))
              heaps(i).offer(sim, left(j)._1)
              heaps(j).offer(sim, left(i)._1)
              j += 1
            }
            i += 1
          }
          left.indices.iterator.flatMap { i =>
            val h = heaps(i)
            (0 until h.n).iterator.map(p => (g, left(i)._1, h.ids(p), h.sims(p)))
          }
        } else {
          val nmL = norms(left); val nmR = norms(right)
          val heapsL = Array.fill(left.length)(new Heap)
          val heapsR = Array.fill(right.length)(new Heap)
          var i = 0
          while (i < left.length) {
            val (_, va) = left(i)
            var j = 0
            while (j < right.length) {
              val sim = dot(va, right(j)._2).toDouble / (nmL(i) * nmR(j))
              heapsL(i).offer(sim, right(j)._1)
              heapsR(j).offer(sim, left(i)._1)
              j += 1
            }
            i += 1
          }
          left.indices.iterator.flatMap { i =>
            val h = heapsL(i)
            (0 until h.n).iterator.map(p => (g, left(i)._1, h.ids(p), h.sims(p)))
          } ++ right.indices.iterator.flatMap { j =>
            val h = heapsR(j)
            (0 until h.n).iterator.map(p => (g, right(j)._1, h.ids(p), h.sims(p)))
          }
        }
      }
      .toDF("grp", "id", "neighbor_id", "sim")

    // stage 3: global top-k per row over ≤ B·k local winners; each
    // (id, neighbor) pair exists exactly once, so no dedup is needed.
    // The window keys on (grp, id), NOT id alone: the contract allows
    // the same id to appear in two groups, and an id-only partition
    // would silently merge those rows' candidate pools
    val w = Window.partitionBy(col("grp"), col("id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val ranked = candidates
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("grp"), col("id"), col("rank"), col("neighbor_id"), col("sim"))
    if (integralGroup) ranked
    else
      // restore the caller's group values (the kernel only saw hashes)
      // by joining back on (group hash, id) — id alone would
      // cross-label an id living in two groups. n·k ⋈ n equi-join, one
      // extra hash shuffle, minor next to the B× block replication
      ranked.join(
        e.select(xxhash64(col(groupCol)).as("grp"),
            col(idCol).cast("long").as("id"), col(groupCol).as("_gval"))
          .dropDuplicates("grp", "id"),
        Seq("grp", "id"))
        .select(col("_gval").as("grp"), col("id"), col("rank"),
          col("neighbor_id"), col("sim"))
  }

  /** Approximate within-group kNN join — the documented ANN swap for
    * [[withinGroups]] once groups outgrow the B² block-pair budget.
    * Blocking comes from [[SignIvf]]'s analytic sign-bucket
    * (hyperoctant) quantizer instead of block-pairs: every row lives
    * in the ONE bucket its quantized group-sum signs pick, and as a
    * query it probes its `nprobe` best-aligned existing buckets
    * (multi-probe order: signed alignment between the query's group
    * sums and the bucket's sign pattern — exact integer comparisons).
    * Pair work drops from |group|²/2 to Σ_buckets |Q_b|·|C_b| ≈
    * (nprobe/2^signDims)·|group|² — and because the quantizer is a
    * pure per-vector function, the WHOLE join is reproducible in
    * portable SQL: unlike trained-kmeans ANN, this approximation has
    * a real cross-engine oracle (the q76 doctrine applied to the
    * join).
    *
    * Shape: one shuffle keying the corpus arm by (group, bucket) and
    * the query arm by (group, probed bucket) — cogrouped so each task
    * holds ONE bucket's candidates (≈ |group|/2^signDims rows,
    * flat-memory as signDims grows with data) and streams the probing
    * queries past a bounded per-query heap; a candidate lives in
    * exactly one bucket so no (query, candidate) pair is scored
    * twice. Final window top-k per row over ≤ nprobe·k survivors.
    * Determinism: identical quantize/dot/norm/tie contracts to the
    * exact kernel, so exact and approximate results differ ONLY by
    * probe coverage (recall), never by arithmetic.
    */
  def approxWithinGroups(e: DataFrame, idCol: String, embCol: String,
      groupCol: String, k: Int, signDims: Int = 4,
      nprobe: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(signDims >= 1 && signDims <= 16,
      s"signDims must be 1-16, got $signDims")
    require(nprobe >= 1 && nprobe <= (1 << signDims),
      s"nprobe must be 1-2^signDims, got $nprobe")
    val spark = e.sparkSession
    import spark.implicits._
    val sd = signDims

    val integralGroup = e.schema(groupCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val gkey =
      if (integralGroup) col(groupCol).cast("long") else xxhash64(col(groupCol))

    val quantized = e.select(gkey, col(idCol).cast("long"),
        VectorFns.quantize(col(embCol)))
      .as[(Long, Long, Array[Long])]
      .filter((t: (Long, Long, Array[Long])) => t._3.exists(_ != 0L))
      .persist()

    val ranked = try {
      // buckets that exist anywhere in the corpus: bounded driver
      // metadata (≤ 2^signDims ints), the multi-probe ranking domain
      val existing: Array[Int] = quantized
        .map((t: (Long, Long, Array[Long])) => SignIvf.cidOf(t._3, sd))
        .distinct().collect().sorted
      val bcEx = spark.sparkContext.broadcast(existing)

      val corpusArm = quantized.map { case (g, id, v) =>
        (g, SignIvf.cidOf(v, sd), id, v)
      }
      val queryArm = quantized.flatMap { case (g, id, v) =>
        val gs = SignIvf.groupSums(v, sd)
        def align(c: Int): Long = {
          var s = 0L; var d = 0
          while (d < sd) {
            s += (if ((c & (1 << d)) != 0) gs(d) else -gs(d)); d += 1
          }
          s
        }
        bcEx.value.sortBy(c => (-align(c), c)).take(nprobe)
          .iterator.map(c => (g, c, id, v))
      }

      val candidates = corpusArm.groupByKey(t => (t._1, t._2))
        .cogroup(queryArm.groupByKey(t => (t._1, t._2))) {
          case ((g, _), cand, qs) =>
            val cs = cand.map(t => (t._3, t._4)).toArray
            if (cs.isEmpty) Iterator.empty
            else {
              val nm = new Array[Double](cs.length)
              var i = 0
              while (i < cs.length) {
                val v = cs(i)._2
                var s = 0L; var d = 0
                while (d < v.length) { s += v(d) * v(d); d += 1 }
                nm(i) = math.sqrt(s.toDouble)
                i += 1
              }
              qs.flatMap { case (_, _, qid, qv) =>
                var qs2 = 0L; var d = 0
                while (d < qv.length) { qs2 += qv(d) * qv(d); d += 1 }
                val qn = math.sqrt(qs2.toDouble)
                // bounded best-k: sim desc, id asc — the exact
                // kernel's tie order
                val sims = new Array[Double](k)
                val ids = new Array[Long](k)
                var n = 0
                var j = 0
                while (j < cs.length) {
                  val (cid2, cv) = cs(j)
                  if (cid2 != qid) {
                    var s = 0L; var x = 0
                    while (x < cv.length) { s += qv(x) * cv(x); x += 1 }
                    val sim = s.toDouble / (qn * nm(j))
                    if (!(n == k && (sim < sims(n - 1) ||
                        (sim == sims(n - 1) && cid2 > ids(n - 1))))) {
                      var pos = if (n < k) n else k - 1
                      while (pos > 0 && (sims(pos - 1) < sim ||
                          (sims(pos - 1) == sim && ids(pos - 1) > cid2))) {
                        sims(pos) = sims(pos - 1); ids(pos) = ids(pos - 1)
                        pos -= 1
                      }
                      sims(pos) = sim; ids(pos) = cid2
                      if (n < k) n += 1
                    }
                  }
                  j += 1
                }
                (0 until n).iterator.map(p => (g, qid, ids(p), sims(p)))
              }
            }
        }
        .toDF("grp", "id", "neighbor_id", "sim")

      // ≤ nprobe·k survivors per row; a candidate lives in exactly one
      // bucket so no pair appears twice — no dedup, just the final cut
      val w = Window.partitionBy(col("grp"), col("id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      candidates
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select(col("grp"), col("id"), col("rank"), col("neighbor_id"),
          col("sim"))
        .localCheckpoint(true)
    } finally quantized.unpersist()

    if (integralGroup) ranked
    else
      ranked.join(
        e.select(xxhash64(col(groupCol)).as("grp"),
            col(idCol).cast("long").as("id"), col(groupCol).as("_gval"))
          .dropDuplicates("grp", "id"),
        Seq("grp", "id"))
        .select(col("_gval").as("grp"), col("id"), col("rank"),
          col("neighbor_id"), col("sim"))
  }
}

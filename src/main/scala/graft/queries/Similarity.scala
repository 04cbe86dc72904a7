package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * q75 is the exact baseline: broadcast the (small) query set against
  * the full vector table — one map-side pass over the corpus, then a
  * per-query top-k window. Scales to any corpus size (corpus is never
  * shuffled; only |queries| × k rows survive).
  *
  * q76 is the IVF scale path: a coarse quantizer (cluster centroids)
  * prunes the corpus to nprobe buckets per query, cutting scanned
  * vectors by ~nclusters/nprobe. Approximate by construction, so it is
  * spec-checked for recall against q75 instead of oracle-checked.
  */
object Similarity {

  private val K = 5

  def queries: Seq[GraftQuery] = Seq(
    // Brute-force cosine top-k: exact, deterministic (quantized-integer
    // dot products, ties broken by neighbor id). Scoring runs in the
    // AnnTopK partition kernel — one unshuffled corpus scan with
    // per-query bounded heaps; only partitions×|Q|×k rows survive.
    GraftQuery(
      "q75_ann_brute",
      (s, dir) => {
        graft.operators.AnnTopK.bruteForce(
            Tables.load(s, dir, "embeddings"),
            "vec_id", "embedding", col("vec_id") % 50 === 0, K)
          .orderBy(col("q_id"), col("rank"))
      },
      Some(s"""
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)::DOUBLE) AS q
          FROM embeddings),
        n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
        qs AS (SELECT vec_id AS q_id, q AS qq, n2 AS qn2 FROM n WHERE vec_id % 50 = 0),
        scored AS (
          SELECT q_id, vec_id,
                 list_dot_product(qq, q) / (sqrt(qn2) * sqrt(n2)) AS sim
          FROM qs CROSS JOIN n WHERE q_id <> vec_id),
        ranked AS (
          SELECT q_id, vec_id, sim,
                 CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
          FROM scored)
        SELECT q_id, rank, vec_id AS neighbor_id, sim
        FROM ranked WHERE rank <= $K ORDER BY q_id, rank
      """.stripMargin.trim),
      headline = true),

    // IVF ANN: spherical k-means coarse quantizer (graft.operators.
    // IvfIndex), nprobe nearest clusters per query, exact top-k within
    // the probed buckets — scans ~nprobe/nlist of the corpus.
    // Approximate by construction → spec-checked for recall vs q75.
    GraftQuery(
      "q76_ann_ivf",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        graft.operators.IvfIndex.topK(
          e, "vec_id", "embedding", col("vec_id") % 50 === 0,
          graft.operators.IvfIndex.Params(nlist = 16, nprobe = 4, iters = 3, k = K))
      },
      None)
  )
}

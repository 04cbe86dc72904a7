package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The ANN operators collect and broadcast their query side — small by
  * contract. These tests pin the contract's enforcement: a predicate
  * matching more than `maxQueries` rows fails loudly (bounded take, so
  * the oversized set is never pulled to the driver) instead of OOMing.
  */
class AnnContractSpec extends SparkSpec {
  import spark.implicits._

  private def embeddings(n: Int, dims: Int = 8) =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dims)(d => ((i * 31 + d * 7) % 13 - 6).toFloat / 6f))
    }.toDF("vec_id", "embedding")

  test("AnnTopK.bruteForce rejects an oversized query side") {
    val ex = intercept[IllegalArgumentException] {
      AnnTopK.bruteForce(embeddings(50), "vec_id", "embedding",
        col("vec_id") < 20, k = 3, maxQueries = 10)
    }
    assert(ex.getMessage.contains("maxQueries"))
  }

  test("SignIvf.topK rejects an oversized query side") {
    val ex = intercept[IllegalArgumentException] {
      SignIvf.topK(embeddings(50), "vec_id", "embedding",
        col("vec_id") < 20, maxQueries = 10)
    }
    assert(ex.getMessage.contains("maxQueries"))
  }

  test("IvfIndex.topK rejects an oversized query side") {
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.topK(embeddings(50), "vec_id", "embedding",
        col("vec_id") < 20, IvfIndex.Params(nlist = 4, nprobe = 2, iters = 1, k = 3),
        maxQueries = 10)
    }
    assert(ex.getMessage.contains("maxQueries"))
  }

  test("a query side within the cap is unaffected by it") {
    val e = embeddings(50)
    val loose = AnnTopK.bruteForce(e, "vec_id", "embedding", col("vec_id") < 5, k = 3)
      .collect().toSeq
    val tight = AnnTopK.bruteForce(e, "vec_id", "embedding", col("vec_id") < 5,
        k = 3, maxQueries = 5)
      .collect().toSeq
    assert(loose === tight)
  }
}

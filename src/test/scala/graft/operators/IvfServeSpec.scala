package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Partition-pruned IVF serving: the writeIndex layout + topKFromIndex
  * probe path. Locks in (a) result parity with the in-memory topK —
  * same centroids, probes and unit-vector math — and (b) that the
  * probe's scan carries a cluster partition filter and reads strictly
  * fewer files than the layout holds.
  */
class IvfServeSpec extends SparkSpec {

  private def finalNodes(df: DataFrame): Seq[SparkPlan] = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(flatten) ++ (p match {
        case q: QueryStageExec => flatten(q.plan)
        case _ => Nil
      }))
    flatten(root)
  }

  test("topKFromIndex equals in-memory topK and prunes unprobed clusters") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val p = IvfIndex.Params(nlist = 8, nprobe = 2, iters = 2, k = 5)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    IvfIndex.writeIndex(emb, "vec_id", "embedding", p, dir)

    val pred = col("vec_id") < 3
    val served = IvfIndex.topKFromIndex(spark, dir, emb.filter(pred),
      "vec_id", "embedding", p)
    val servedRows = served.collect().toSeq
    val memRows = IvfIndex.topK(emb, "vec_id", "embedding", pred, p)
      .collect().toSeq
    assert(servedRows.nonEmpty)
    assert(servedRows === memRows,
      "served results must match the in-memory index bit-for-bit")

    // pruning: the data scan must carry a cluster partition filter...
    val scans = finalNodes(served).collect {
      case f: FileSourceScanExec if f.metadata.getOrElse("Location", "").contains("data") => f
    }
    assert(scans.nonEmpty, "no file scan over the index data found")
    assert(scans.exists(_.partitionFilters.nonEmpty),
      s"no partition filter on the index scan:\n${scans.head}")
    // ...and actually read fewer files than the layout holds (3 queries
    // x 2 probes can touch at most 6 of the 8 cluster directories)
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val totalFiles = {
      val root = new java.io.File(s"$dir/data")
      def count(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(count).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      count(root)
    }
    assert(filesRead > 0 && filesRead < totalFiles,
      s"expected a pruned scan: read $filesRead of $totalFiles files")
  }
}

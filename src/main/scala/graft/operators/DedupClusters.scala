package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pairs — the step that
  * turns pairwise dedup output into an actionable keep-list (one
  * canonical representative per cluster, everything else dropped).
  *
  * Hash-to-Min label propagation: every node starts labeled with its
  * own id; each iteration pushes labels across edges and keeps the
  * minimum, converging to the component-minimum id in O(log diameter)
  * iterations. Each iteration is one key-partitioned join plus one
  * min-aggregation — the standard iterative-CC shape a 1000-executor
  * cluster runs (GraphX/GraphFrames execute the same plan); the driver
  * sees only a one-row converged check per iteration. Near-dup
  * components are shallow (duplicates of duplicates), so this settles
  * in a handful of rounds in practice; `maxIter` bounds pathological
  * chains.
  */
object DedupClusters {

  /** (id, rep) for every node appearing in `pairs`; `rep` is the
    * minimum id in the node's component.
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val e = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist()
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val pushed = e.join(labels, e("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      val next = labels.union(pushed)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .persist()
      converged = next.as("n")
        .join(labels.as("o"), "id")
        .filter(col("n.label") =!= col("o.label"))
        .isEmpty
      labels.unpersist()
      labels = next
      i += 1
    }
    e.unpersist()
    labels.withColumnRenamed("label", "rep")
  }

  /** Cluster assignment with component sizes: (doc_id, rep_id, csize),
    * one row per clustered document.
    */
  def assignments(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val c = components(pairs, aCol, bCol)
    val sizes = c.groupBy(col("rep")).agg(count(lit(1)).as("csize"))
    c.join(sizes, "rep")
      .select(col("id").as("doc_id"), col("rep").as("rep_id"), col("csize"))
  }
}

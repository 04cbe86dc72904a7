package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pairs — the step that
  * turns pairwise dedup output into an actionable keep-list (one
  * canonical representative per cluster, everything else dropped).
  *
  * Min-label propagation with pointer jumping: every node starts
  * labeled with its own id; each round (a) pushes labels across edges
  * and keeps the minimum, then (b) replaces each node's label with its
  * label's label. The jump halves remaining chain depth per round, so
  * convergence is O(log diameter) — a plain one-hop push would need
  * O(diameter) rounds and silently mislabel long duplicate chains at
  * the iteration cap. Each round is two key-partitioned joins plus a
  * min-aggregation (the iterative-CC shape GraphX-style CC runs); the
  * driver sees one converged check per round. Non-convergence at
  * `maxIter` throws rather than returning wrong representatives.
  */
object DedupClusters {

  /** (id, rep) for every node appearing in `pairs`; `rep` is the
    * minimum id in the node's component. Each round is
    * `localCheckpoint`ed: the pointer-jump self-join references the
    * round's frame twice, so without lineage truncation the logical
    * plan doubles per round (2^k nodes by round k) and plan
    * stringification alone OOMs; checkpoint blocks are freed by the
    * context cleaner as the frames are dereferenced.
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val e = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist()
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // fresh aliases: both union children otherwise carry the same
      // exprIds (pushed derives from labels), which breaks Union's
      // constraint rewriting
      val pushed = e.join(labels, e("src") === labels("id"))
        .select(col("dst").as("id"), col("label").as("label"))
      val minned = labels.select(col("id").as("id"), col("label").as("label"))
        .union(pushed)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
      // pointer jump: label ← label(label). Every label is itself a
      // node id (labels only ever move down to other ids), so the
      // lookup join is total and the jump only improves.
      val next = minned.as("a")
        .join(minned.as("b"), col("a.label") === col("b.id"))
        .select(col("a.id").as("id"), col("b.label").as("label"))
        .localCheckpoint(true)
      converged = next.as("n")
        .join(labels.as("o"), "id")
        .filter(col("n.label") =!= col("o.label"))
        .isEmpty
      labels = next
      i += 1
    }
    e.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — raise maxIter")
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

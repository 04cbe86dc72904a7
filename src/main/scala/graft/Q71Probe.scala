package graft
import org.apache.spark.sql.functions._

/** Dev probe: candidate-pair volume of the q71 exact-Jaccard join,
  * before/after prefix filtering (r17 opt evidence). Counts, over the
  * same corpus: full-postings rows, prefix-postings rows, the pair
  * rows the OLD full-postings self-join enumerated (a<b + length-ratio
  * prune — the rows the old per-pair aggregate had to shuffle and
  * count), the distinct candidate pairs the NEW prefix join verifies,
  * and the true output pairs. Honors SPARK_GRAFT_SF_DIR.
  */
object Q71Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t = 0.8
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val post = graft.operators.MinHashLsh.postings(docs, "doc_id", "text")
      .persist()
    val nPost = post.count()
    // per-doc prefix length under the signed-hash global order:
    // p = nsh - ceil(t*nsh) + 2 (one slack element, as in the operator)
    val p = least(col("nsh"), greatest(lit(1L),
      col("nsh") - ceil(lit(t) * col("nsh")).cast("long") + lit(2L)))
    val pfx = post
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("s"))))
      .filter(col("rk") <= p)
    val nPfx = pfx.count()
    val ratioOk = least(col("na"), col("nb")).cast("double") >=
      lit(t) * greatest(col("na"), col("nb")).cast("double") - 1.0d
    def pairRows(df: org.apache.spark.sql.DataFrame): Long = {
      val a = df.select(col("doc_id").as("a_id"), col("nsh").as("na"), col("s"))
      val b = df.select(col("doc_id").as("b_id"), col("nsh").as("nb"), col("s"))
      a.join(b, Seq("s")).filter(col("a_id") < col("b_id") && ratioOk).count()
    }
    def candPairs(df: org.apache.spark.sql.DataFrame): Long = {
      val a = df.select(col("doc_id").as("a_id"), col("nsh").as("na"), col("s"))
      val b = df.select(col("doc_id").as("b_id"), col("nsh").as("nb"), col("s"))
      a.join(b, Seq("s")).filter(col("a_id") < col("b_id") && ratioOk)
        .select("a_id", "b_id").distinct().count()
    }
    def candPairsPos(df: org.apache.spark.sql.DataFrame): Long = {
      val a = df.select(col("doc_id").as("a_id"), col("nsh").as("na"),
        (col("rk") - 1L).as("ia"), col("s"))
      val b = df.select(col("doc_id").as("b_id"), col("nsh").as("nb"),
        (col("rk") - 1L).as("ib"), col("s"))
      val posOk = (lit(1L) + least(col("na") - col("ia") - 1L,
        col("nb") - col("ib") - 1L)).cast("double") >=
        lit(t / (1.0d + t)) * (col("na") + col("nb")).cast("double") - 1.0d
      a.join(b, Seq("s")).filter(col("a_id") < col("b_id") && ratioOk && posOk)
        .select("a_id", "b_id").distinct().count()
    }
    val oldRows = pairRows(post)
    val newRows = pairRows(pfx.select(col("doc_id"), col("nsh"), col("s")))
    val oldCand = candPairs(post)
    val newCand = candPairs(pfx.select(col("doc_id"), col("nsh"), col("s")))
    val posCand = candPairsPos(pfx)
    val outPairs = graft.operators.MinHashLsh
      .exactJaccardPairs(docs, "doc_id", "text", t).count()
    post.unpersist()
    println(s"[q71probe] postings_rows=$nPost prefix_rows=$nPfx " +
      s"old_pair_join_rows=$oldRows new_pair_join_rows=$newRows " +
      s"old_distinct_cand=$oldCand new_distinct_cand=$newCand " +
      s"pos_distinct_cand=$posCand true_pairs=$outPairs")
    spark.stop()
  }
}

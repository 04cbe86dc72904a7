package graft

/** Dev tool: execute one or more queries and print the FINAL adaptive
  * physical plan (`runMain graft.FinalPlan q72_dedup_minhash_lsh ...`).
  * `explain("formatted")` shows the initial plan (`isFinalPlan=false`),
  * which hides AQE's runtime exchange/stage reuse — duplicate-looking
  * subtrees may execute once. This prints the executed plan after the
  * action, where `ReusedExchange` / shared query stages are visible, so
  * plan-dedup claims can be checked against what actually ran.
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: FinalPlan <q1> [q2 ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    args.foreach { n =>
      val df = Registry.byName(n).run(spark, sfDir)
      df.queryExecution.toRdd.foreach(_ => ())
      println(s"\n========== $n (final) ==========")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

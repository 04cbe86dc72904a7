package graft

/** Dev tool: print the formatted physical plan of one or more queries
  * (`runMain graft.Explain q1_agg q10_join_star ...`; no args = all
  * headline queries). Used to audit pushdown (PushedFilters/ReadSchema),
  * join strategies, and whole-stage codegen spans per round.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.get()
    val names = if (args.nonEmpty) args.toSeq else Registry.headline.map(_.name)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.byName(n).run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

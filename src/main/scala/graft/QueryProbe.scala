package graft

/** Time individual registry queries against an arbitrary data dir —
  * the single-query companion to [[ScaleBench]] (which runs the fixed
  * headline growth suite). Used to measure one operator's scaling
  * before/after a plan change without paying for the whole suite:
  *
  *   sbt "runMain graft.QueryProbe /tmp/graft_scale100 q305_dsl_fuzzy_transpositions"
  *
  * Prints one line per query: min seconds over `SPARK_GRAFT_PROBE_PASSES`
  * (default 3) timed executions after one warm-up.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProbe <dir> <q1,q2,...>")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val passesRaw = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3")
    val passes = passesRaw.toIntOption.getOrElse(
      sys.error(s"SPARK_GRAFT_PROBE_PASSES must be a positive integer, " +
        s"got '$passesRaw'"))
    require(passes >= 1,
      s"SPARK_GRAFT_PROBE_PASSES must be >= 1, got $passes")
    val spark = GraftSession.get()
    def once(q: GraftQuery): Double = {
      val t0 = System.nanoTime()
      q.run(spark, dir).queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val q = Registry.byName(n)
      once(q) // warm-up
      val best = (1 to passes).map(_ => once(q)).min
      println(f"[probe] $n%s $best%.3f s")
    }
    spark.stop()
  }
}

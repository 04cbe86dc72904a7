package graft

/** Benchmark main (driver contract): runs the headline query suite on
  * `SPARK_GRAFT_SF_DIR` at `local[N]` and prints exactly one JSON line
  * `{"metric":…, "value":…, "unit":"sec", "queries":{name:sec,…}, "sf":…}`.
  *
  * Timing protocol: one untimed warm-up pass of the whole suite (JIT +
  * codegen + parquet footer caches), then one timed pass in stable
  * name order. `SPARK_GRAFT_BENCH_ALL=1` benches every registered
  * query instead of the headline set; `SPARK_GRAFT_BENCH_COLD=1` skips
  * the warm-up.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val suite =
      (if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1")) Registry.all
       else Registry.headline).sortBy(_.name)

    def runOnce(q: GraftQuery): Double = {
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    if (!sys.env.get("SPARK_GRAFT_BENCH_COLD").contains("1"))
      suite.foreach(runOnce)
    val results = suite.map(q => q.name -> runOnce(q))

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.functions._
object Q79Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[q79probe] $name ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    // warm
    graft.operators.SemanticDedup.assignments(e, "vec_id", "embedding", 0.3)
      .queryExecution.toRdd.foreach(_ => ())
    (1 to 3).foreach { i =>
      time(s"full assignments $i") {
        graft.operators.SemanticDedup.assignments(e, "vec_id", "embedding", 0.3)
          .queryExecution.toRdd.foreach(_ => ())
      }
    }
    // pieces: replicate internals
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
    })
    jobs.set(0)
    graft.operators.SemanticDedup.assignments(e, "vec_id", "embedding", 0.3)
      .queryExecution.toRdd.foreach(_ => ())
    Thread.sleep(500)
    println(s"[q79probe] spark jobs per run: ${jobs.get}")
    spark.stop()
  }
}

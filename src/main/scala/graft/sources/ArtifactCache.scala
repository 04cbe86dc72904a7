package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Build-once-per-JVM temp artifacts (serving indexes, clustered
  * layouts) keyed by BOTH a caller key and a fingerprint of the input
  * data — the single implementation behind
  * [[graft.etl.SearchIndex.cachedIndex]] and
  * [[graft.operators.ZOrder.cachedLayout]]. The fingerprint closes the
  * staleness hole a path-only key has: regenerate the dataset at the
  * same path inside one JVM and the old cache entry stops matching, so
  * the artifact is rebuilt from the live data instead of silently
  * serving the previous corpus. Cached directories are removed on JVM
  * exit.
  */
object ArtifactCache {

  private val cache = new ConcurrentHashMap[String, String]()

  /** Cheap input fingerprint: entry count, newest modification time
    * and total byte size of the path's direct listing — any rewrite of
    * a parquet dataset changes at least one of them. One RPC per
    * lookup; never reads data.
    */
  def freshnessToken(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      val ss = fs.listStatus(p)
      val mtime = if (ss.isEmpty) 0L else ss.map(_.getModificationTime).max
      s"${ss.length}:$mtime:${ss.map(_.getLen).sum}"
    }
  }

  /** The directory holding the artifact for (`key`, current state of
    * `watch`), building it on first request. `build` receives the
    * fresh directory path.
    */
  def cachedDir(spark: SparkSession, key: String, watch: Seq[String],
      prefix: String)(build: String => Unit): String = {
    val full = (key +: watch.map(p => freshnessToken(spark, p))).mkString("|")
    cache.computeIfAbsent(full, { _ =>
      val dir = java.nio.file.Files.createTempDirectory(prefix)
      build(dir.toString)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.Files
        import scala.jdk.CollectionConverters._
        if (Files.exists(dir)) {
          val all = Files.walk(dir).iterator().asScala.toSeq.reverse
          all.foreach(p => Files.deleteIfExists(p): Unit)
        }
      }))
      dir.toString
    })
  }
}

package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERSIONED IVF serving store with point-in-time pins (r16, VERDICT
  * r15 #5) — the [[graft.etl.IndexAlias]] / [[graft.streaming.TablePit]]
  * discipline brought to the vector-index layouts: [[IvfIndex
  * .mergeCdcBatch]]'s dynamic partition overwrite rewrites touched
  * clusters IN PLACE, so a search session paging mid-merge can see
  * mixed state. Here every merge instead writes a NEW version holding
  * ONLY the clusters it touched, plus a tiny cluster map naming, per
  * cluster, the version that hosts its current piece:
  *
  * {{{
  * root/v1/data/cluster=*        full build (+ v1/centroids)
  * root/v3/data/cluster=7        a merge's rewrite of cluster 7
  * root/_clustermap_v3           "centroids v1", then "<cluster> v<host>"
  * root/_active                  current map version (temp+rename flip)
  * }}}
  *
  * Copy-on-write economics at 100 TB: a merge still reads and writes
  * ONLY the touched clusters (untouched cluster directories are SHARED
  * across versions through the map — never copied), the cutover is one
  * pointer rename, and a pinned session keeps resolving its frozen map
  * while merges land and [[vacuum]] reclaims unreferenced versions.
  * Serving reads exactly the probed clusters' hosting directories —
  * path-enumerated pruning, strictly the same bytes the partition
  * filter would admit.
  *
  * Pins are per-JVM driver refcounts (the single-driver serving shape,
  * same as IndexAlias/TablePit; a multi-driver deployment would persist
  * pin leases beside the map files). Single-writer contract for
  * [[build]]/[[merge]] (the CdcMerge epoch discipline): crash mid-merge
  * leaves an unreferenced version the pointer never named — the next
  * merge claims a higher number and [[vacuum]] reclaims the debris once
  * the pointer moves past it.
  *
  * SignPq/SignIvf note: those quantizers serve in-memory from the
  * corpus (no persisted layout exists to pin); the IVF store here is
  * the one persisted vector serving surface.
  */
object IvfAlias {

  final case class Pit(root: String, version: Int, centroidsVersion: Int,
      clusterMap: Map[Int, Int])

  private def fsOf(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Pin keys address the directory, not its spelling (the TablePit
    * lesson): qualify through the Hadoop FS so `root/`, relative and
    * scheme-full forms land on one key.
    */
  private def normRoot(spark: SparkSession, root: String): String =
    fsOf(spark, root).makeQualified(new Path(root)).toString

  private val pins = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def pinKey(spark: SparkSession, root: String, v: Int) =
    s"${normRoot(spark, root)}@v$v"

  private def versionsOnDisk(spark: SparkSession, root: String): Seq[Int] = {
    val r = new Path(root)
    val fs = fsOf(spark, root)
    if (!fs.exists(r)) Seq.empty
    else fs.listStatus(r).toSeq.collect {
      case s if s.isDirectory && s.getPath.getName.matches("v\\d+") =>
        s.getPath.getName.drop(1).toInt
    }.sorted
  }

  private def mapPath(root: String, v: Int) = new Path(s"$root/_clustermap_v$v")
  private def pointerPath(root: String) = new Path(s"$root/_active")

  private def writeText(spark: SparkSession, p: Path, text: String): Unit = {
    val out = fsOf(spark, p.toString).create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  private def readText(spark: SparkSession, p: Path): Option[String] = {
    val fs = fsOf(spark, p.toString)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  private def writeMap(spark: SparkSession, root: String, v: Int,
      centVer: Int, cmap: Map[Int, Int]): Unit =
    writeText(spark, mapPath(root, v),
      (s"centroids v$centVer" +:
        cmap.toSeq.sortBy(_._1).map { case (c, hv) => s"$c v$hv" })
        .mkString("\n"))

  private def readMap(spark: SparkSession, root: String,
      v: Int): (Int, Map[Int, Int]) = {
    val lines = readText(spark, mapPath(root, v)).getOrElse(
      throw new IllegalStateException(
        s"cluster map _clustermap_v$v missing under $root")).linesIterator
      .map(_.trim).filter(_.nonEmpty).toSeq
    val cent = lines.head match {
      case s if s.startsWith("centroids v") => s.stripPrefix("centroids v").toInt
      case other => throw new IllegalStateException(
        s"malformed cluster map under $root: first line '$other'")
    }
    (cent, lines.tail.map { l =>
      val Array(c, hv) = l.split(" ")
      c.toInt -> hv.stripPrefix("v").toInt
    }.toMap)
  }

  /** Atomically repoint `_active` at version `v` (temp + rename — the
    * IndexAlias cutover discipline, rename failure loud).
    */
  private def flip(spark: SparkSession, root: String, v: Int): Unit = {
    val fs = fsOf(spark, root)
    val tmp = new Path(s"$root/_active.tmp$v")
    writeText(spark, tmp, s"v$v")
    fs.delete(pointerPath(root), false)
    require(fs.rename(tmp, pointerPath(root)),
      s"pointer flip rename failed for $root -> v$v")
  }

  /** The active map version — fails loud before the first build. */
  def activeVersion(spark: SparkSession, root: String): Int =
    readText(spark, pointerPath(root))
      .map(_.trim.stripPrefix("v").toInt)
      .getOrElse(throw new IllegalStateException(
        s"ivf store $root has no active version — build first"))

  /** Full (re)build under the next version: an [[IvfIndex.writeIndex]]
    * layout (data + centroids + optional payload columns) plus the
    * cluster map naming this version as every cluster's host.
    */
  /** Next free version number — above every on-disk dir AND the
    * pointer (a pure-delete merge flips the pointer without creating
    * a data dir, and reusing its number would overwrite the live map).
    */
  private def nextVersion(spark: SparkSession, root: String): Int = {
    val ptr = readText(spark, pointerPath(root))
      .map(_.trim.stripPrefix("v").toInt).getOrElse(0)
    (versionsOnDisk(spark, root) :+ ptr :+ 0).max + 1
  }

  def build(embeddings: DataFrame, idCol: String, embCol: String,
      p: IvfIndex.Params, root: String, payloadCols: Seq[String] = Nil): Int = {
    val spark = embeddings.sparkSession
    val n = nextVersion(spark, root)
    IvfIndex.writeIndex(embeddings, idCol, embCol, p, s"$root/v$n", payloadCols)
    val fs = fsOf(spark, root)
    val clusters = fs.listStatus(new Path(s"$root/v$n/data")).toSeq.collect {
      case s if s.isDirectory && s.getPath.getName.startsWith("cluster=") =>
        s.getPath.getName.stripPrefix("cluster=").toInt
    }
    writeMap(spark, root, n, n, clusters.map(_ -> n).toMap)
    flip(spark, root, n)
    n
  }

  /** The layout's payload columns (from any hosted cluster's files). */
  private def payloadsOf(spark: SparkSession, root: String,
      centVer: Int, cmap: Map[Int, Int]): Seq[String] =
    cmap.headOption.map { case (c, hv) =>
      spark.read.parquet(s"$root/v$hv/data/cluster=$c").schema.names.toSeq
        .filterNot(Set("id", "unit_vec"))
    }.getOrElse(Seq.empty)

  /** Read `clusters` through the map — each cluster from its hosting
    * version's directory, the partition value re-attached (path
    * enumeration IS the pruning: nothing outside these directories is
    * ever listed).
    */
  private def readClusters(spark: SparkSession, root: String,
      cmap: Map[Int, Int], clusters: Seq[Int]): Option[DataFrame] =
    clusters.sorted.flatMap { c =>
      cmap.get(c).map(hv =>
        spark.read.parquet(s"$root/v$hv/data/cluster=$c")
          .withColumn("cluster", lit(c)))
    }.reduceOption(_.unionByName(_))

  /** Merge a CDC batch into the store — the [[IvfIndex.mergeCdcBatch]]
    * contract (one row per key, upsert/delete, nearest EXISTING
    * centroid) realized copy-on-write: touched clusters are rewritten
    * under the NEXT version, untouched clusters stay shared, and the
    * pointer flip publishes the new map atomically. Returns the new
    * version.
    */
  def merge(spark: SparkSession, root: String, batch: DataFrame,
      idCol: String, embCol: String, actionCol: String = "_action"): Int = {
    import spark.implicits._
    val active = activeVersion(spark, root)
    val (centVer, cmap) = readMap(spark, root, active)
    val cents: Array[Array[Double]] =
      spark.read.parquet(s"$root/v$centVer/centroids")
        .select(col("cluster").cast("int"), col("centroid"))
        .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    val bc = spark.sparkContext.broadcast(cents)

    val payloads = payloadsOf(spark, root, centVer, cmap)
    payloads.find(!batch.columns.contains(_)).foreach(c =>
      throw new IllegalArgumentException(
        s"the store at $root carries payload column '$c' but the CDC " +
          s"batch does not (batch columns: ${batch.columns.mkString(", ")})"))

    val ids = batch.select(col(idCol).cast("long").as("id"))
    val oldClusters = readClusters(spark, root, cmap, cmap.keys.toSeq)
      .map(_.select(col("id").cast("long"), col("cluster"))
        .join(broadcast(ids), Seq("id"), "left_semi")
        .select(col("cluster")).distinct().as[Int].collect().toSeq)
      .getOrElse(Seq.empty)

    val assigned = IvfIndex.layoutRows(
        batch.filter(col(actionCol) === "upsert"), idCol, embCol, payloads, bc)
      .localCheckpoint(true)
    try {
      val newClusters = assigned.select(col("cluster")).distinct()
        .as[Int].collect().toSeq
      val touched = (oldClusters ++ newClusters).distinct.sorted
      val n = nextVersion(spark, root)
      val replacement = readClusters(spark, root, cmap, touched)
        .map(_.select((Seq(col("id").cast("long"), col("unit_vec"),
            col("cluster").cast("int")) ++ payloads.map(c => col(s"`$c`"))): _*)
          .dropDuplicates("id")
          .join(broadcast(ids), Seq("id"), "left_anti")
          .unionByName(assigned))
        .getOrElse(assigned)
      if (touched.nonEmpty)
        replacement.write.mode("overwrite").partitionBy("cluster")
          .parquet(s"$root/v$n/data")
      // copy the (tiny, nlist×dims) centroids forward so a superseded
      // full-build version is not kept alive forever just for them —
      // exact doubles round-trip parquet bit-for-bit (the layout
      // contract), so serving math is unchanged
      spark.read.parquet(s"$root/v$centVer/centroids")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/v$n/centroids")
      val stillThere: Set[Int] =
        if (touched.isEmpty) Set.empty
        else replacement.select(col("cluster")).distinct().as[Int].collect().toSet
      val newMap = (cmap -- touched.filterNot(stillThere)) ++
        touched.filter(stillThere).map(_ -> n)
      writeMap(spark, root, n, n, newMap)
      flip(spark, root, n)
      n
    } finally assigned.unpersist()
  }

  /** Serve approximate top-k against the ACTIVE map, or against a
    * pinned one — identical math to [[IvfIndex.topKFromIndex]] (the
    * shared [[IvfIndex.probeTopK]] core), reading only the probed
    * clusters' hosting directories. `filter` pre-filters candidates on
    * payload columns exactly like the direct layout's filtered serve.
    */
  def topK(spark: SparkSession, root: String, queries: DataFrame,
      idCol: String, embCol: String, p: IvfIndex.Params = IvfIndex.Params(),
      pit: Option[Pit] = None, filter: Option[Column] = None,
      maxQueries: Int = 4096): DataFrame = {
    import spark.implicits._
    val (centVer, cmap) = pit match {
      case Some(pt) => (pt.centroidsVersion, pt.clusterMap)
      case None => readMap(spark, root, activeVersion(spark, root))
    }
    val cents: Array[Array[Double]] =
      spark.read.parquet(s"$root/v$centVer/centroids")
        .select(col("cluster").cast("int"), col("centroid"))
        .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    val qs = AnnTopK.boundedQueryCollect(
      IvfIndex.unitVectors(queries, idCol, embCol, lit(true))
        .map(t => (t._1, t._2)).take(maxQueries + 1),
      maxQueries)
    val probes: Array[Array[Int]] = qs.map { case (_, qx) =>
      cents.indices.toArray
        .sortBy(c => (-IvfIndex.dot(qx, cents(c)), c)).take(p.nprobe)
    }
    val probed = probes.flatten.distinct.sorted.filter(cmap.contains)
    val corpus = readClusters(spark, root, cmap, probed) match {
      case None => spark.emptyDataset[(Long, Array[Double], Int)]
      case Some(df) => df
        .transform(d => filter.fold(d)(d.filter))
        .dropDuplicates("id")
        .select(col("id").cast("long"), col("unit_vec"),
          col("cluster").cast("int"))
        .as[(Long, Array[Double], Int)]
    }
    IvfIndex.probeTopK(corpus, qs, probes, p)
  }

  /** Pin the active map for a pagination session. Pin-then-verify (the
    * TablePit race lesson): after the pin lands, every directory the
    * map references is re-checked; a piece a racing vacuum swept
    * releases and re-resolves, failing loud only if the store stays
    * unstable across retries.
    */
  def openPit(spark: SparkSession, root: String): Pit = {
    val fs = fsOf(spark, root)
    var attempt = 0
    while (true) {
      attempt += 1
      val v = activeVersion(spark, root)
      val (centVer, cmap) = readMap(spark, root, v)
      pins.merge(pinKey(spark, root, v), 1, (a, b) => a + b): Unit
      val pieces = s"$root/v$centVer/centroids" +:
        cmap.toSeq.map { case (c, hv) => s"$root/v$hv/data/cluster=$c" }
      if (pieces.forall(pp => fs.exists(new Path(pp))))
        return Pit(root, v, centVer, cmap)
      release(spark, Pit(root, v, centVer, cmap))
      if (attempt >= 3)
        throw new IllegalStateException(
          s"ivf store $root kept losing pieces to concurrent vacuums " +
            s"across $attempt open attempts — quiesce the vacuum cadence")
    }
    throw new IllegalStateException("unreachable")
  }

  /** Drop one pin reference; double release fails loud. */
  def release(spark: SparkSession, pit: Pit): Unit = {
    pins.compute(pinKey(spark, pit.root, pit.version), (_, n) =>
      if (n == null)
        throw new IllegalStateException(
          s"ivf pit ${pit.root}@v${pit.version} is not pinned (double release?)")
      else if (n <= 1) null
      else n - 1): Unit
  }

  /** Reclaim version directories nothing references: keep the active
    * version, everything its map references, every PINNED map's
    * version and references, and any version NEWER than active (an
    * in-progress build/merge). Returns the versions removed.
    */
  def vacuum(spark: SparkSession, root: String): Seq[Int] = {
    val fs = fsOf(spark, root)
    val active = activeVersion(spark, root)
    val norm = normRoot(spark, root)
    val pinnedMapVers = versionsOnDisk(spark, root)
      .filter(v => pins.containsKey(s"$norm@v$v"))
    def refsOf(v: Int): Set[Int] = {
      val (cv, cm) = readMap(spark, root, v)
      cm.values.toSet + cv + v
    }
    val keep = (active +: pinnedMapVers).map(refsOf)
      .foldLeft(Set.empty[Int])(_ ++ _)
    versionsOnDisk(spark, root)
      .filter(v => v < active && !keep(v))
      .map { v =>
        fs.delete(new Path(s"$root/v$v"), true)
        fs.delete(mapPath(root, v), false)
        v
      }
  }
}

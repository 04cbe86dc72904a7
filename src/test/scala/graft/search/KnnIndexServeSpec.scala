package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IvfIndex
import graft.sources.Tables

/** The DSL `knn` request's `index` arm: served from a materialized IVF
  * layout (the 100 TB plan — every exact request would rescan the
  * corpus) instead of the brute-force scan. Locks in:
  *  (a) routing — the DSL arm returns byte-identical rows to calling
  *      IvfIndex.topKFromIndex directly (it IS that operator, not a
  *      reimplementation);
  *  (b) recall vs the exact arm at the same k;
  *  (c) the probe's scan is cluster-partition-pruned (reads strictly
  *      fewer files than the layout holds) — mirroring IvfServeSpec;
  *  (d) filter + index fails loud (the layout has no corpus columns).
  */
class KnnIndexServeSpec extends SparkSpec {

  private def finalNodes(df: DataFrame): Seq[SparkPlan] = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(flatten) ++ (p match {
        case q: QueryStageExec => flatten(q.plan)
        case _ => Nil
      }))
    flatten(root)
  }

  private val vec = (0 until 64).map(i => ((i * 3) % 11 - 5) / 20.0)

  test("index-served knn routes to IvfIndex, recalls vs exact, prunes") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val p = IvfIndex.Params(nlist = 8, nprobe = 4, iters = 2, k = 10)
    val dir = java.nio.file.Files.createTempDirectory("knn_dsl_idx").toString
    IvfIndex.writeIndex(emb, "vec_id", "embedding", p, dir)

    val served = QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${vec.mkString(",")}],
           "k": 10,
           "index": {"path": "$dir", "nprobe": 4}}}""")
    val servedRows = served.collect().toSeq
    assert(servedRows.size === 10)
    assert(servedRows.map(_.getLong(1)) === (1L to 10L), "ranks 1..10")

    // (a) routing parity with the operator surface, bit-for-bit
    import spark.implicits._
    val qdf = Seq((-1L, vec.map(_.toFloat).toArray)).toDF("q_id", "q_emb")
    val direct = IvfIndex.topKFromIndex(spark, dir, qdf, "q_id", "q_emb", p)
      .select(col("neighbor_id").as("vec_id"), col("rank"), col("sim"))
      .collect().toSeq
    assert(servedRows === direct,
      "DSL index arm must BE IvfIndex.topKFromIndex, not a lookalike")

    // (b) recall vs the exact arm (q169's contract) at the same k
    val exact = QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${vec.mkString(",")}], "k": 10}}""")
      .collect().map(_.getLong(0)).toSet
    val got = servedRows.map(_.getLong(0)).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"index-served knn recall@10 = $recall")

    // (c) partition-pruned probe: cluster filter present, fewer files
    val scans = finalNodes(served).collect {
      case f: FileSourceScanExec if f.metadata.getOrElse("Location", "").contains("data") => f
    }
    assert(scans.nonEmpty, "no file scan over the index data found")
    assert(scans.exists(_.partitionFilters.nonEmpty),
      s"no partition filter on the index scan:\n${scans.head}")
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val totalFiles = {
      val root = new java.io.File(s"$dir/data")
      def count(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(count).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      count(root)
    }
    assert(filesRead > 0 && filesRead < totalFiles,
      s"expected a pruned scan: read $filesRead of $totalFiles files")

    // (d) filtered serve: over-fetch + id semi-join. Survivors all
    // pass the filter, ranks re-pack 1..k, and every survivor appears
    // in the unfiltered over-fetch window (it IS the window filtered)
    val filtered = QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${vec.mkString(",")}], "k": 5,
           "filter": {"range": {"label": {"lte": 4}}},
           "index": {"path": "$dir", "nprobe": 4, "oversample": 8}}}""")
    val frows = filtered.collect().toSeq
    assert(frows.nonEmpty && frows.size <= 5)
    assert(frows.map(_.getLong(1)) === (1L to frows.size.toLong),
      "filtered ranks re-pack 1..k")
    val lbl1 = emb.filter(col("label") <= 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(frows.forall(r => lbl1(r.getLong(0))),
      "every filtered-serve hit passes the corpus filter")
    val window = IvfIndex.topKFromIndex(spark, dir, qdf, "q_id", "q_emb",
        p.copy(k = 40))
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(frows.forall(r => window(r.getLong(0))),
      "filtered hits come from the over-fetch window")
    // recall vs the exact FILTERED arm at the same k
    val exactF = QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${vec.mkString(",")}], "k": 5,
           "filter": {"range": {"label": {"lte": 4}}}}}""")
      .collect().map(_.getLong(0)).toSet
    val recallF = (exactF & frows.map(_.getLong(0)).toSet).size.toDouble /
      exactF.size
    assert(recallF >= 0.4, s"filtered index-served knn recall@5 = $recallF")
    // the pruned probe scan is RETAINED under the filtered plan
    val fscans = finalNodes(filtered).collect {
      case f: FileSourceScanExec if f.metadata.getOrElse("Location", "").contains("data") => f
    }
    assert(fscans.exists(_.partitionFilters.nonEmpty),
      "filtered serve lost the partition-pruned probe scan")

    // (e) saturation fails loud: a filter no candidate passes, with
    // the over-fetch window fully consumed → recall unbounded → error
    val saturated = QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${vec.mkString(",")}], "k": 10,
           "filter": {"term": {"label": -999}},
           "index": {"path": "$dir", "nprobe": 8, "oversample": 2}}}""")
    val e = intercept[Exception](saturated.collect())
    assert(e.getMessage.contains("cannot be bounded") ||
      Option(e.getCause).exists(_.getMessage.contains("cannot be bounded")),
      s"expected the saturation raise, got: ${e.getMessage}")

    // oversample is a filtered-serve knob only, and must be >= 1
    assertThrows[IllegalArgumentException](QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${vec.mkString(",")}], "k": 10,
           "index": {"path": "$dir", "nprobe": 4, "oversample": 8}}}"""))
    assertThrows[IllegalArgumentException](QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${vec.mkString(",")}], "k": 10,
           "filter": {"term": {"label": 1}},
           "index": {"path": "$dir", "nprobe": 4, "oversample": 0}}}"""))
    // malformed index arms fail loud too
    assertThrows[IllegalArgumentException](QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [1.0], "k": 10,
           "index": {"nprobe": 4}}}"""))
    assertThrows[IllegalArgumentException](QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [1.0], "k": 10,
           "index": {"path": "$dir", "nprobe": 0}}}"""))
    // a wrong-dimension query vector must fail loud at compile time —
    // shorter would silently dot only its prefix, longer would crash
    // in the executor
    assertThrows[IllegalArgumentException](QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${(0 until 32).map(_ => "0.1").mkString(",")}],
           "k": 10, "index": {"path": "$dir", "nprobe": 4}}}"""))
  }

  test("payload layout: filter compiles into the pruned scan (r16)") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val p = IvfIndex.Params(nlist = 8, nprobe = 8, iters = 2, k = 5)
    val dir = java.nio.file.Files.createTempDirectory("knn_payload_idx").toString
    IvfIndex.writeIndex(emb, "vec_id", "embedding", p, dir,
      payloadCols = Seq("label"))

    // nprobe == nlist: the probe degenerates to the exact scan over
    // filter survivors, so the served ID RANKING equals the exact
    // filtered brute-force arm's
    val served = QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${vec.mkString(",")}], "k": 5,
           "filter": {"range": {"label": {"lte": 4}}},
           "index": {"path": "$dir", "nprobe": 8}}}""")
    val srows = served.collect().toSeq
    assert(srows.size === 5)
    assert(srows.map(_.getLong(1)) === (1L to 5L))
    val exact = QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${vec.mkString(",")}], "k": 5,
           "filter": {"range": {"label": {"lte": 4}}}}}""")
      .collect().map(_.getLong(0)).toSeq
    assert(srows.map(_.getLong(0)) === exact,
      "all-probe payload serve must equal the exact filtered ranking")
    // every hit passes the filter
    val ok = emb.filter(col("label") <= 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(srows.forall(r => ok(r.getLong(0))))

    // plan pins: the cluster partition filter is RETAINED and the
    // payload predicate reaches the pruned parquet scan
    val probed = QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${vec.mkString(",")}], "k": 5,
           "filter": {"range": {"label": {"lte": 4}}},
           "index": {"path": "$dir", "nprobe": 2}}}""")
    probed.collect()
    val scans = finalNodes(probed).collect {
      case f: FileSourceScanExec if f.metadata.getOrElse("Location", "").contains("data") => f
    }
    assert(scans.nonEmpty, "no file scan over the index data found")
    assert(scans.exists(_.partitionFilters.nonEmpty),
      "payload-filtered serve lost the partition-pruned probe scan")
    assert(scans.exists(_.metadata.getOrElse("PushedFilters", "").contains("label")),
      s"label filter not pushed into the layout scan:\n${scans.head.metadata}")

    // fail-loud: a filter naming a column the layout does not carry
    val e = intercept[IllegalArgumentException](QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${vec.mkString(",")}], "k": 5,
           "filter": {"term": {"missing_col": 1}},
           "index": {"path": "$dir", "nprobe": 4}}}"""))
    assert(e.getMessage.contains("does not carry"), e.getMessage)
    // fail-loud: oversample has no meaning without an over-fetch window
    val e2 = intercept[IllegalArgumentException](QueryDsl.search(emb,
      s"""{"knn": {"field": "embedding", "id_field": "vec_id",
           "query_vector": [${vec.mkString(",")}], "k": 5,
           "filter": {"range": {"label": {"lte": 4}}},
           "index": {"path": "$dir", "nprobe": 4, "oversample": 8}}}"""))
    assert(e2.getMessage.contains("no over-fetch window"), e2.getMessage)
    // build-time fail-loud: reserved/missing payload names
    assertThrows[IllegalArgumentException](IvfIndex.writeIndex(
      emb, "vec_id", "embedding", p,
      java.nio.file.Files.createTempDirectory("bad1").toString,
      payloadCols = Seq("cluster")))
    assertThrows[IllegalArgumentException](IvfIndex.writeIndex(
      emb, "vec_id", "embedding", p,
      java.nio.file.Files.createTempDirectory("bad2").toString,
      payloadCols = Seq("nope")))
  }
}

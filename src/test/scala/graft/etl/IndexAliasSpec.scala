package graft.etl

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Alias-mediated zero-downtime reindex: version cutover is atomic,
  * readers never resolve a half-built layout, crash windows repair,
  * and rollback versions survive until pruned.
  */
class IndexAliasSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private def served(aliasDir: String): Seq[(Long, Double)] =
    IndexAlias.bm25(spark, aliasDir, Seq("spark"), k = 5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq

  test("reindex builds versions, cuts over atomically, serves the new corpus") {
    val alias = java.nio.file.Files.createTempDirectory("graft-alias").toString
    // before the first reindex: fail loud, not an empty ranking
    val ex = intercept[IllegalStateException](served(alias))
    assert(ex.getMessage.contains("reindex first"))

    val v1 = IndexAlias.reindex(
      corpus(1L -> "spark join", 2L -> "row scan"), "doc_id", "text", alias, buckets = 4)
    assert(v1.endsWith("/v1") && IndexAlias.resolve(spark, alias).contains(v1))
    assert(served(alias).map(_._1) === Seq(1L))

    // reindex with doc 1 gone and doc 3 added — the alias must flip to
    // the new truth while v1 stays on disk for rollback
    val v2 = IndexAlias.reindex(
      corpus(2L -> "row scan", 3L -> "spark window spark"), "doc_id", "text", alias, buckets = 4)
    assert(IndexAlias.resolve(spark, alias).contains(v2))
    assert(served(alias).map(_._1) === Seq(3L))
    val fs = new Path(alias).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(s"$alias/v1/stats")), "rollback version was destroyed")

    // rollback is just a swap; prune then drops everything below active
    IndexAlias.swap(spark, alias, "v1")
    assert(served(alias).map(_._1) === Seq(1L))
    IndexAlias.swap(spark, alias, "v2")
    assert(IndexAlias.prune(spark, alias) === Seq("v1"))
    assert(!fs.exists(new Path(s"$alias/v1")) && fs.exists(new Path(s"$alias/v2")))
  }

  test("crash windows: lost pointer falls back to last complete build; half-builds never resolve") {
    val alias = java.nio.file.Files.createTempDirectory("graft-alias2").toString
    IndexAlias.reindex(corpus(1L -> "spark join"), "doc_id", "text", alias, buckets = 4)
    val fs = new Path(alias).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // a half-built v2 (no stats yet — stats is written last) must be
    // invisible: to resolve's fallback, and to swap
    fs.mkdirs(new Path(s"$alias/v2/postings"))
    fs.delete(new Path(s"$alias/_active"), false) // crash between delete and rename
    assert(IndexAlias.resolve(spark, alias).exists(_.endsWith("/v1")))
    assert(served(alias).map(_._1) === Seq(1L))
    intercept[IllegalArgumentException](IndexAlias.swap(spark, alias, "v2"))

    // re-running the reindex claims the next free version number and
    // leaves the debris unreferenced
    val v3 = IndexAlias.reindex(
      corpus(1L -> "spark join", 4L -> "spark"), "doc_id", "text", alias, buckets = 4)
    assert(v3.endsWith("/v3") && IndexAlias.resolve(spark, alias).contains(v3))
    assert(served(alias).map(_._1).toSet === Set(1L, 4L))
  }

  test("PIT pagination: a cutover mid-pagination cannot shift pages; pin shields prune") {
    val alias = java.nio.file.Files.createTempDirectory("graft-pit").toString
    // 8 spark-bearing docs with distinct tf profiles → a total ranking
    val docsV1 = (1L to 8L).map(i =>
      i -> (Seq.fill(i.toInt)("spark") ++ Seq.fill(9 - i.toInt)("row"))
        .mkString(" "))
    IndexAlias.reindex(corpus(docsV1: _*), "doc_id", "text", alias, buckets = 4)

    val pit = IndexAlias.openPit(spark, alias)
    def page(after: Option[(Double, Long)]): Seq[(Long, Double)] =
      IndexAlias.bm25Page(spark, pit, Seq("spark"), k = 3, after = after)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    val full = IndexAlias.bm25(spark, alias, Seq("spark"), k = 8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq

    val p1 = page(None)
    // REINDEX BETWEEN PAGES: different corpus, alias cuts over
    IndexAlias.reindex(
      corpus(100L -> "spark spark spark", 101L -> "spark row"),
      "doc_id", "text", alias, buckets = 4)
    assert(IndexAlias.bm25(spark, alias, Seq("spark"), k = 8)
      .collect().map(_.getAs[Long]("doc_id")).toSet === Set(100L, 101L),
      "the alias itself must serve the new corpus")

    val p2 = page(Some((p1.last._2, p1.last._1)))
    val p3 = page(Some((p2.last._2, p2.last._1)))
    // the three PIT pages reconstruct v1's ranking exactly: complete,
    // disjoint, in order — the cutover never showed through
    assert(p1 ++ p2 ++ p3 === full)
    assert((p1 ++ p2 ++ p3).map(_._1).distinct.size === 8)

    // prune cannot take the pinned version out from under the cursor
    assert(IndexAlias.prune(spark, alias) === Seq.empty)
    val p1Again = page(None)
    assert(p1Again === p1, "pinned reads stay stable under prune")

    // after release the old version is prunable; double release is loud
    IndexAlias.releasePit(pit)
    assert(IndexAlias.prune(spark, alias) === Seq("v1"))
    val e = intercept[IllegalStateException](IndexAlias.releasePit(pit))
    assert(e.getMessage.contains("not pinned"), e.getMessage)
  }

  test("PIT on the wire: a DSL search_after session pages the pinned version end-to-end") {
    import graft.search.QueryDsl
    val alias = java.nio.file.Files.createTempDirectory("graft-pit-wire").toString
    val docsV1 = (1L to 8L).map(i =>
      i -> (Seq.fill(i.toInt)("spark") ++ Seq.fill(9 - i.toInt)("row"))
        .mkString(" "))
    IndexAlias.reindex(corpus(docsV1: _*), "doc_id", "text", alias, buckets = 4)
    val full = IndexAlias.bm25(spark, alias, Seq("spark"), k = 8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq

    // open = resolve once + pin; the id is the wire handle
    val id = QueryDsl.openPit(spark, alias)
    def page(after: Option[(Double, Long)]): Seq[(Long, Double)] = {
      val cursor = after.map { case (s, d) =>
        s""", "search_after": [$s, $d]""" }.getOrElse("")
      QueryDsl.searchPit(spark,
        s"""{"pit": {"id": "$id"},
             "query": {"bm25": {"terms": ["spark"]}},
             "size": 3$cursor}""")
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    }
    val p1 = page(None)
    // cutover mid-session: the alias moves, the pit must not
    IndexAlias.reindex(corpus(100L -> "spark spark", 101L -> "spark row"),
      "doc_id", "text", alias, buckets = 4)
    val p2 = page(Some((p1.last._2, p1.last._1)))
    val p3 = page(Some((p2.last._2, p2.last._1)))
    assert(p1 ++ p2 ++ p3 === full,
      "wire pages must reconstruct the pinned ranking exactly")

    // close releases the pin: the version becomes prunable, the id dies
    QueryDsl.closePit(id)
    assert(IndexAlias.prune(spark, alias) === Seq("v1"))
    val e1 = intercept[IllegalArgumentException](QueryDsl.searchPit(spark,
      s"""{"pit": {"id": "$id"}, "query": {"bm25": {"terms": ["spark"]}}}"""))
    assert(e1.getMessage.contains("unknown pit id"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](QueryDsl.closePit(id))
    assert(e2.getMessage.contains("unknown pit id"), e2.getMessage)
    // malformed wire shapes fail loud
    val e3 = intercept[IllegalArgumentException](QueryDsl.searchPit(spark,
      """{"query": {"bm25": {"terms": ["spark"]}}}"""))
    assert(e3.getMessage.contains("requires a pit section"), e3.getMessage)
  }
}

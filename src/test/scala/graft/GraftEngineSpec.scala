package graft

import org.apache.spark.sql.functions._
import graft.etl.{DdbJson, Fixtures, IngestPipeline}
import graft.sources.Tables

class GraftEngineSpec extends SparkSpec {

  private lazy val g = GraftEngine(spark)
  private lazy val ingest = IngestPipeline.fromRaw(
    DdbJson.readExport(spark, Fixtures.writeExport().toString))

  test("keyLookup: PK equality + SK begins_with, the DynamoDB access path") {
    val fares = ingest.fare
    val hits = g.keyLookup(fares, "LAX", skPrefix = Some("SEA#"))
    assert(hits.count() === 1)
    assert(hits.head().getAs[String]("dest") === "SEA")
    // range form
    val range = g.keyLookup(fares, "LAX", skRange = Some(("A", "ZZZ")))
    assert(range.count() === 2)
  }

  test("search: all terms must match, tokenized") {
    val docs = Tables.load(spark, sf(), "documents")
    val res = g.search(docs, terms = Seq("spark", "join"), textCol = "text",
      must = Seq(col("lang") === "en"), size = 5).collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getAs[String]("lang") == "en"))
    assert(res.forall { r =>
      val t = r.getAs[String]("text").split(" ").toSet
      t.contains("spark") && t.contains("join")
    })
  }

  test("exactDuplicates finds planted copies") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "  Alpha beta   GAMMA "), (3L, "unrelated text here"))
      .toDF("doc_id", "text")
    val dups = g.exactDuplicates(docs, "text", "doc_id").collect()
    assert(dups.length === 1)
    assert(dups(0).getAs[Long]("keep_id") === 1L)
    assert(dups(0).getAs[Long]("copies") === 2L)
  }

  test("nearDuplicates finds planted near-copies via MinHash+LSH") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 58).map(i => s"tok$i").mkString(" ") + " x y"
    val far = (100 to 160).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = g.nearDuplicates(docs, "text", "doc_id", threshold = 0.7).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
  }

  test("annBruteForce returns k ranked neighbors per query") {
    val e = Tables.load(spark, sf(), "embeddings")
    val res = g.annBruteForce(e, "vec_id", "embedding", col("vec_id") < 3, k = 4)
      .collect()
    assert(res.length === 12)
    val byQ = res.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.values.foreach { rows =>
      val sims = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.sorted.reverse.toSeq === sims.toSeq) // descending by rank
    }
  }

  test("termSuggest corrects a misspelling to the corpus term it is one edit from") {
    val docs = Tables.load(spark, sf(), "documents")
    val res = g.termSuggest(docs, "text", Seq("sprk", "windoow")).collect()
    val byQ = res.groupBy(_.getAs[String]("q"))
    // "sprk" is one deletion from "spark"; distance ranks before frequency
    val top = byQ("sprk").minBy(_.getAs[Long]("rank"))
    assert(top.getAs[String]("term") === "spark")
    assert(top.getAs[Long]("dist") === 1L)
    assert(byQ("windoow").exists(_.getAs[String]("term") == "window"))
    // ranks are dense from 1 and capped at the requested size
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ===
        (1L to rows.length.toLong).toSeq)
      assert(rows.length <= 3)
    }
  }

  test("moreLikeThis never returns the seed and scores by shared seed terms") {
    val docs = Tables.load(spark, sf(), "documents")
    val res = g.moreLikeThis(docs, "doc_id", "text", seedId = 7L).collect()
    assert(res.length === 15)
    assert(res.forall(_.getAs[Long]("doc_id") != 7L))
    // descending score with doc_id tie-break = the served order
    val scores = res.map(_.getAs[Long]("score"))
    assert(scores.sorted.reverse.toSeq === scores.toSeq)
    assert(res.forall(_.getAs[Long]("n_shared") >= 1L))
  }

  test("cdc snapshot round-trip through the facade") {
    val target = java.nio.file.Files.createTempDirectory("graft-eng-cdc").toString
    import spark.implicits._
    val batch = Seq(("d1", "upsert", 1L, "x"), ("d2", "upsert", 2L, "y"))
      .toDF("_doc_id", "_action", "_seq", "payload")
    graft.streaming.CdcStream.mergeBatch(spark, batch, target, 0L)
    assert(g.cdcSnapshot(target).get.count() === 2)
  }
}

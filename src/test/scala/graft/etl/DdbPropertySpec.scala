package graft.etl

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Property-based coverage (SURVEY.md §5.3), native ScalaCheck: random
  * typed-attribute items survive decode with values intact; random CDC
  * event interleavings converge to the last-writer-wins oracle under
  * any batch split.
  */
object DdbPropertySpec extends Properties("ddb") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private val key = Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)

  property("decode round-trip keeps S/N/BOOL values") = {
    val item = for {
      pk <- key; sk <- key
      sVal <- Gen.identifier.map(_.take(20))
      nVal <- Gen.chooseNum(-1000000L, 1000000L)
      bVal <- Gen.oneOf(true, false)
    } yield (pk, sk, sVal, nVal, bVal)

    forAll(Gen.listOfN(15, item)) { items0 =>
      // unique (PK,SK) so the comparison is by key
      val items = items0.zipWithIndex.map { case ((pk, sk, s, n, b), i) =>
        (s"$pk$i", sk, s, n, b)
      }
      val json = items.map { case (pk, sk, s, n, b) =>
        s"""{"Item": {"PK": {"S": "$pk"}, "SK": {"S": "$sk"}, "type": {"S": "t"},
            "sv": {"S": "$s"}, "nv": {"N": "$n"}, "bv": {"BOOL": $b},
            "__id": {}}}""".replaceAll("\n\\s*", " ")
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-prop")
      java.nio.file.Files.writeString(dir.resolve("x.json"), json.mkString("\n"))
      val got = DdbJson.decodeCommon(DdbJson.readExport(spark, dir.toString))
        .selectExpr("PK", "SK", "item['sv'].S", "CAST(item['nv'].N AS LONG)",
          "item['bv'].BOOL")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
          r.getBoolean(4)))
        .sortBy(_._1)
      val expect = items.sortBy(_._1)
      Prop(got.toSeq == expect) :| s"got=${got.take(3).mkString(",")}"
    }
  }

  /** A typed DDB value paired with its expected untyped rendering. */
  private case class TV(ddb: String, plain: String)

  private def tvGen(depth: Int): Gen[TV] = {
    val s = Gen.identifier.map(_.take(10))
      .map(v => TV(s"""{"S": "$v"}""", "\"" + v + "\""))
    val n = Gen.chooseNum(-100000L, 100000L)
      .map(v => TV(s"""{"N": "$v"}""", v.toString))
    val b = Gen.oneOf(true, false)
      .map(v => TV(s"""{"BOOL": $v}""", v.toString))
    val nul = Gen.const(TV("""{"NULL": true}""", "null"))
    if (depth <= 0) Gen.oneOf(s, n, b, nul)
    else {
      val l = for {
        sz <- Gen.chooseNum(0, 3)
        els <- Gen.listOfN(sz, tvGen(depth - 1))
      } yield TV(
        s"""{"L": [${els.map(_.ddb).mkString(", ")}]}""",
        "[" + els.map(_.plain).mkString(",") + "]")
      val m = for {
        sz <- Gen.chooseNum(1, 3)
        ks <- Gen.listOfN(sz, key)
        vs <- Gen.listOfN(sz, tvGen(depth - 1))
      } yield {
        val entries = ks.zipWithIndex.map { case (k, i) => s"$k$i" }.zip(vs)
        TV(
          "{\"M\": {" + entries.map { case (k, v) => s""""$k": ${v.ddb}""" }.mkString(", ") + "}}",
          "{" + entries.map { case (k, v) => s""""$k":${v.plain}""" }.mkString(",") + "}")
      }
      Gen.frequency(4 -> Gen.oneOf(s, n, b, nul).flatMap(Gen.const), 1 -> l, 1 -> m)
    }
  }

  property("nested L/M decode renders the plain JSON the typed form encodes") =
    forAll(Gen.listOfN(5, tvGen(3))) { tvs =>
      val json = tvs.zipWithIndex.map { case (tv, i) =>
        s"""{"Item": {"PK": {"S": "p$i"}, "SK": {"S": "s"}, "v": ${tv.ddb}}}"""
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-nest-prop")
      java.nio.file.Files.writeString(dir.resolve("x.json"), json.mkString("\n"))
      val got = DdbJson.readExport(spark, dir.toString)
        .select(
          DdbJson.attrString(col("item"), "PK").as("pk"),
          DdbJson.plainJson(col("item")("v")).as("pj"))
        .collect().map(r => r.getString(0) -> r.getString(1)).sortBy(_._1).map(_._2)
      val expect = tvs.zipWithIndex.map { case (tv, i) => s"p$i" -> tv.plain }
        .sortBy(_._1).map(_._2)
      Prop(got.toSeq == expect) :| s"got=${got.take(2).mkString("|")} expect=${expect.take(2).mkString("|")}"
    }

  property("CDC LWW converges under any batch split") = {
    val eventsGen = for {
      nKeys <- Gen.chooseNum(1, 6)
      picks <- Gen.listOfN(30, Gen.zip(
        Gen.chooseNum(0, nKeys - 1), Gen.chooseNum(1, 5)))
    } yield picks.zipWithIndex.map { case ((k, kind), i) =>
      // seq = global index: all distinct, so LWW winner is unique
      (s"k$k", if (kind == 1) "delete" else "upsert", i.toLong, s"v$i")
    }

    forAll(Gen.zip(eventsGen, Gen.chooseNum(1, 29), Gen.long)) {
      case (events0, split, shuffleSeed) =>
        val events = new scala.util.Random(shuffleSeed).shuffle(events0)
        val expect = events.groupBy(_._1).view
          .mapValues(_.maxBy(_._3))
          .collect { case (k, e) if e._2 != "delete" => (k, e._4) }
          .toSeq.sorted

        val (b1, b2) = events.splitAt(split)
        var state = CdcMerge.initialState(
          b1.toDF("_doc_id", "_action", "_seq", "payload"))
        if (b2.nonEmpty)
          state = CdcMerge.applyBatch(state,
            b2.toDF("_doc_id", "_action", "_seq", "payload"))
        val got = CdcMerge.snapshot(state).collect()
          .map(r => (r.getAs[String]("_doc_id"), r.getAs[String]("payload")))
          .toSeq.sorted
        Prop(got == expect) :| s"split=$split got=$got expect=$expect"
    }
  }
}

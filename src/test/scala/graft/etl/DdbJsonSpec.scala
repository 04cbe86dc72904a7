package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkSpec

class DdbJsonSpec extends SparkSpec {

  private lazy val raw = DdbJson.readExport(spark, Fixtures.writeExport().toString)

  test("export reader parses every fixture line") {
    assert(raw.count() === Fixtures.all.size)
  }

  test("decodeCommon extracts PK/SK/type and builds the doc id") {
    val d = DdbJson.decodeCommon(raw)
    val lax = d.filter(col("type") === "fare" && col("PK") === "LAX")
      .select("_doc_id").collect().map(_.getString(0)).sorted
    assert(lax.head === "LAX#BOS#2023-05-14T23:59:59#direct")
    assert(lax.forall(_.startsWith("LAX#")))
  }

  test("empty attributes (__id) are stripped by dropEmptyAttrs") {
    val keys = raw.select(map_keys(DdbJson.dropEmptyAttrs(col("item"))).as("ks"))
      .collect().flatMap(_.getSeq[String](0))
    assert(!keys.contains("__id"))
    // but __id IS present pre-cleanup
    val rawKeys = raw.select(map_keys(col("item")).as("ks"))
      .collect().flatMap(_.getSeq[String](0))
    assert(rawKeys.contains("__id"))
  }

  test("N attributes decode as numbers; S-typed 'number' stays lenient") {
    val d = DdbJson.decodeCommon(raw)
    val flightNums = Entities.decodeFlight(d.filter(col("type") === "flight"))
      .select("number").collect().map(_.getLong(0)).sorted
    assert(flightNums === Array(210L, 211L, 320L, 430L, 540L))
    val assignNums = Entities.decodeAssignment(d.filter(col("type") === "assignment"))
      .select("number").collect().map(_.getString(0)).sorted
    assert(assignNums === Array("210", "210", "320")) // strings here, by design
  }

  test("BOOL decodes, absent BOOL is null") {
    val f = Entities.decodeFlight(
      DdbJson.decodeCommon(raw).filter(col("type") === "flight"))
    val bySeg = f.groupBy(col("isSegment")).count().collect()
      .map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    assert(bySeg(Some(true)) === 2L)
    assert(bySeg(Some(false)) === 1L)
    assert(bySeg(None) === 2L)
  }

  test("stringified lists and sets parse to arrays; '[]' parses empty") {
    val parsed = spark.range(1).select(
      DdbJson.parseStringifiedList(lit("[wheelchair, kosher]")).as("a"),
      DdbJson.parseStringifiedList(lit("[]")).as("b"),
      DdbJson.parseStringifiedList(lit("{LAX, AUS}")).as("c"),
      DdbJson.parseStringifiedList(lit("plain")).as("d")).head()
    assert(parsed.getSeq[String](0) === Seq("wheelchair", "kosher"))
    assert(parsed.getSeq[String](1) === Seq())
    assert(parsed.getSeq[String](2) === Seq("LAX", "AUS"))
    assert(parsed.isNullAt(3))
  }

  test("template-literal bug flows through undisturbed") {
    val a = Entities.decodeAssignment(
      DdbJson.decodeCommon(raw).filter(col("type") === "assignment"))
    val g2 = a.select("GSI2PK").collect().map(_.getString(0)).toSet
    assert(g2.contains("${number}")) // raw data bug preserved, ingestion didn't choke
  }

  test("ISO-8601 timestamps decode; composite SK parts recover them") {
    val f = Entities.decodeFare(
      DdbJson.decodeCommon(raw).filter(col("type") === "fare"))
    val row = f.filter(col("PK") === "BOS").select("start", "depart", "sk_dest", "sk_class").head()
    assert(row.getTimestamp(0).toString === "2023-05-04 00:00:00.0")
    assert(row.getTimestamp(1).toString === "2023-05-05 08:30:00.0") // drift field decoded
    assert(row.getString(2) === "LAX")
    assert(row.getString(3) === "nonstop")
  }

  test("nested M/L attributes decode recursively; plain JSON strips tags") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nested")
    val line =
      """{"Item": {"PK": {"S": "LAX"}, "SK": {"S": "META#1"}, "type": {"S": "fare"},
         "meta": {"M": {"tags": {"L": [{"S": "red-eye"}, {"N": "42"}]},
                        "inner": {"M": {"deep": {"M": {"leaf": {"BOOL": true}}}}},
                        "nul": {"NULL": true}}},
         "stops": {"L": [{"M": {"code": {"S": "DEN"}, "wait": {"N": "35"}}},
                         {"M": {"code": {"S": "P\"X"}}}]}}}"""
        .replaceAll("\n\\s*", " ")
    java.nio.file.Files.writeString(dir.resolve("x.json"), line)
    val nested = DdbJson.readExport(spark, dir.toString)

    // typed access straight down the recursive struct
    val row = nested.select(
      col("item")("meta").getField("M")("tags").getField("L")
        .getItem(0).getField("S"),
      col("item")("meta").getField("M")("inner").getField("M")("deep")
        .getField("M")("leaf").getField("BOOL"),
      col("item")("stops").getField("L").getItem(1).getField("M")("code")
        .getField("S")).head()
    assert(row.getString(0) === "red-eye")
    assert(row.getBoolean(1) === true)
    assert(row.getString(2) === "P\"X")

    // untyped render: tags stripped, numbers raw, quotes escaped
    val js = nested.select(
      DdbJson.plainJson(col("item")("meta")).as("m"),
      DdbJson.plainJson(col("item")("stops")).as("s"),
      DdbJson.itemPlainJson(col("item")).as("doc")).head()
    assert(js.getString(0) ===
      """{"tags":["red-eye",42],"inner":{"deep":{"leaf":true}},"nul":null}""")
    assert(js.getString(1) ===
      """[{"code":"DEN","wait":35},{"code":"P\"X"}]""")
    assert(js.getString(2).startsWith("""{"PK":"LAX","SK":"META#1""""))

    // losslessness: typed JSON out re-parses to the same item
    val rt = nested.select(
      to_json(col("item")).as("a"),
      to_json(from_json(to_json(col("item")), DdbJson.itemSchema)).as("b"))
      .head()
    assert(rt.getString(0) === rt.getString(1))
  }

  test("corrupt export lines reach the DLQ with their raw text") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt")
    java.nio.file.Files.writeString(dir.resolve("x.json"),
      """{"Item": {"PK": {"S": "OK1"}, "SK": {"S": "A"}, "type": {"S": "fare"}}}""" +
        "\n" + """{"Item": {"PK": {"S": "TRUNCATED-MID""")
    val broken = DdbJson.readExport(spark, dir.toString)
    assert(broken.count() === 2) // corrupt line kept, not silently dropped
    val r = IngestPipeline.fromRaw(broken)
    assert(r.fare.count() === 1)
    assert(r.dlq.count() === 1)
    val raw = r.dlq.select("_corrupt").head().getString(0)
    assert(raw.contains("TRUNCATED-MID"))
  }

  test("PITR export layout: manifest governs which gzipped files are read") {
    import java.util.zip.GZIPOutputStream
    val root = java.nio.file.Files.createTempDirectory("graft-pitr")
    val dataDir = root.resolve("AWSDynamoDB/01234-abcd/data")
    java.nio.file.Files.createDirectories(dataDir)
    def gzLine(file: String, pk: String): Unit = {
      val os = new GZIPOutputStream(
        java.nio.file.Files.newOutputStream(dataDir.resolve(file)))
      os.write(
        s"""{"Item": {"PK": {"S": "$pk"}, "SK": {"S": "X"}, "type": {"S": "fare"}}}\n"""
          .getBytes("UTF-8"))
      os.close()
    }
    gzLine("a.json.gz", "AAA")
    gzLine("b.json.gz", "BBB")
    gzLine("orphan.json.gz", "ZZZ") // present on disk, NOT in the manifest
    java.nio.file.Files.writeString(
      root.resolve("AWSDynamoDB/01234-abcd/manifest-files.json"),
      Seq("a.json.gz", "b.json.gz").map(f =>
        s"""{"itemCount": 1, "dataFileS3Key": "AWSDynamoDB/01234-abcd/data/$f"}""")
        .mkString("\n"))

    val pks = DdbJson.readExport(spark, root.toString)
      .select(DdbJson.attrString(col("item"), "PK")).collect()
      .map(_.getString(0)).sorted
    assert(pks === Array("AAA", "BBB")) // orphan excluded, gzip decoded
  }

  test("action mapping: REMOVE → delete, INSERT/MODIFY → upsert") {
    import spark.implicits._
    val m = Seq("INSERT", "MODIFY", "REMOVE").toDF("eventName")
      .select(col("eventName"), DdbJson.action(col("eventName")).as("a"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m === Map("INSERT" -> "upsert", "MODIFY" -> "upsert", "REMOVE" -> "delete"))
  }
}

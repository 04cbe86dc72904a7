package graft.etl

import java.nio.file.{Files, Path}

/** Synthesized DynamoDB-export fixture corpus. Shapes follow the
  * reference's single-table airline design and its dirty-data cases
  * (SURVEY.md §1.2: empty `__id`, `number` N-vs-S inconsistency,
  * stringified lists/sets, `${number}` template-literal bug, schema
  * drift) — but with freshly made-up values: nothing is copied from
  * the reference dataset.
  */
object Fixtures {

  private def fare(origin: String, dest: String, startTs: String, endTs: String,
      cls: String, gsi1: Boolean, depart: Option[String] = None): String = {
    val g = if (gsi1)
      s""","GSI1PK": {"S": "$dest"}, "GSI1SK": {"S": "$origin#$startTs"}""" else ""
    val d = depart.map(x => s""","depart": {"S": "$x"}""").getOrElse("")
    s"""{"Item": {"PK": {"S": "$origin"}, "SK": {"S": "$dest#$endTs#$cls"},
        "type": {"S": "fare"}, "origin": {"S": "$origin"}, "dest": {"S": "$dest"},
        "start": {"S": "$startTs"}, "end": {"S": "$endTs"},
        "class": {"S": "$cls"}$g$d, "__id": {}}}""".replaceAll("\n\\s*", " ")
  }

  private def flight(origin: String, dest: String, departTs: String, arriveTs: String,
      number: Int, segId: Int, isSegment: Option[Boolean], segments: Option[String]): String = {
    val seg = isSegment.map(b => s""","isSegment": {"BOOL": $b}""").getOrElse("")
    val segs = segments.map(x => s""","segments": {"S": "$x"}""").getOrElse("")
    s"""{"Item": {"PK": {"S": "$origin"}, "SK": {"S": "$origin#$departTs#$number#$segId"},
        "type": {"S": "flight"}, "origin": {"S": "$origin"}, "dest": {"S": "$dest"},
        "depart": {"S": "$departTs"}, "arrive": {"S": "$arriveTs"},
        "number": {"N": "$number"}, "segId": {"N": "$segId"}$seg$segs,
        "GSI2PK": {"S": "$number"}, "GSI2SK": {"S": "$segId"}, "__id": {}}}"""
      .replaceAll("\n\\s*", " ")
  }

  private def assignment(pax: String, departTs: String, number: String, segId: Int,
      seat: String, ssr: String, templateBug: Boolean): String = {
    val g2 = if (templateBug) "${number}" else number
    s"""{"Item": {"PK": {"S": "$pax"}, "SK": {"S": "$departTs#$number#$segId#$seat"},
        "type": {"S": "assignment"}, "number": {"S": "$number"}, "seat": {"S": "$seat"},
        "SSR": {"S": "$ssr"}, "GSI2PK": {"S": "$g2"}, "GSI2SK": {"S": "$segId"},
        "__id": {}}}""".replaceAll("\n\\s*", " ")
  }

  private def booking(pax: String, departTs: String, number: Int, segments: Int): String =
    s"""{"Item": {"PK": {"S": "$pax"}, "SK": {"S": "$departTs#$number"},
        "type": {"S": "booking"}, "segments": {"N": "$segments"},
        "GSI1PK": {"S": "$pax"}, "GSI1SK": {"S": "$departTs"}, "__id": {}}}"""
      .replaceAll("\n\\s*", " ")

  /** Missing PK → undecodable, must land in the DLQ. */
  private val malformed =
    """{"Item": {"SK": {"S": "orphan#1"}, "type": {"S": "fare"}, "__id": {}}}"""

  val fares: Seq[String] = Seq(
    fare("LAX", "SEA", "2023-05-01T00:00:00", "2023-05-07T23:59:59", "nonstop", gsi1 = true),
    fare("LAX", "BOS", "2023-05-01T00:00:00", "2023-05-14T23:59:59", "direct", gsi1 = true),
    fare("SEA", "MIA", "2023-05-02T00:00:00", "2023-05-09T23:59:59", "nonstop", gsi1 = false),
    fare("SEA", "AUS", "2023-05-03T00:00:00", "2023-05-10T23:59:59", "direct", gsi1 = true),
    fare("BOS", "LAX", "2023-05-04T00:00:00", "2023-05-11T23:59:59", "nonstop", gsi1 = false,
      depart = Some("2023-05-05T08:30:00")), // schema-drift item
    fare("MIA", "SEA", "2023-05-05T00:00:00", "2023-05-12T23:59:59", "nonstop", gsi1 = true),
    fare("AUS", "BOS", "2023-05-06T00:00:00", "2023-05-13T23:59:59", "direct", gsi1 = false))

  val flights: Seq[String] = Seq(
    flight("LAX", "SEA", "2023-05-02T09:15:00", "2023-05-02T11:45:00", 210, 1,
      Some(false), None),
    flight("LAX", "BOS", "2023-05-02T12:00:00", "2023-05-02T20:30:00", 211, 1,
      Some(true), Some("{LAX, AUS}")), // stringified set
    flight("SEA", "MIA", "2023-05-03T07:40:00", "2023-05-03T16:05:00", 320, 1, None, None),
    flight("BOS", "LAX", "2023-05-04T10:10:00", "2023-05-04T13:25:00", 430, 2,
      Some(true), Some("{BOS, MIA}")),
    flight("MIA", "AUS", "2023-05-05T14:00:00", "2023-05-05T16:10:00", 540, 1, None, None))

  val assignments: Seq[String] = Seq(
    assignment("PAX-01", "2023-05-02T09:15:00", "210", 1, "12A", "[vegan]", templateBug = false),
    assignment("PAX-02", "2023-05-02T09:15:00", "210", 1, "12B", "[]", templateBug = true),
    assignment("PAX-03", "2023-05-03T07:40:00", "320", 1, "3C", "[wheelchair, kosher]",
      templateBug = false))

  val bookings: Seq[String] = Seq(
    booking("PAX-01", "2023-05-02T09:15:00", 210, 1))

  val all: Seq[String] = fares ++ flights ++ assignments ++ bookings :+ malformed

  /** Write the corpus as a JSON-lines export file; returns the dir. */
  def writeExport(): Path = {
    val dir = Files.createTempDirectory("graft-export")
    Files.writeString(dir.resolve("export-000.json"), all.mkString("\n"))
    dir
  }
}

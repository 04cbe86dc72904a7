package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-entity normalized schemas for the reference's single-table
  * airline design (FIXTURES.md §3; field presence counted over the
  * 40-item corpus at /root/reference/assets/dynamodb-data/
  * table-data.json). Each entity keeps its own column types — the
  * corpus deliberately reuses field names at different DDB types across
  * entities (`number` is N on flights, S on assignments;
  * SURVEY.md §1.2), so a single merged schema would corrupt them.
  *
  * The `#`-composite sort keys (SURVEY.md §1.3) are split into their
  * parts at decode time so downstream queries get real typed columns.
  */
object Entities {

  import DdbJson._

  private def skPart(n: Int): Column = element_at(split(col("SK"), "#"), n)

  /** fare — SK = dest#startTs#class (table-data.json:8-9). */
  def decodeFare(routed: DataFrame): DataFrame = {
    val item = col("item")
    routed.select(
      col("PK"), col("SK"), col("_doc_id"), col("type"),
      attrString(item, "origin").as("origin"),
      attrString(item, "dest").as("dest"),
      attrTimestamp(item, "start").as("start"),
      attrTimestamp(item, "end").as("end"),
      attrString(item, "class").as("fare_class"),
      attrString(item, "GSI1PK").as("GSI1PK"),
      attrString(item, "GSI1SK").as("GSI1SK"),
      attrTimestamp(item, "depart").as("depart")) // schema-drift field, 1 item
      .withColumn("sk_dest", skPart(1))
      .withColumn("sk_start", to_timestamp(skPart(2)))
      .withColumn("sk_class", skPart(3))
  }

  /** flight — SK = origin#departTs#flightNo#segId (:74-75). */
  def decodeFlight(routed: DataFrame): DataFrame = {
    val item = col("item")
    routed.select(
      col("PK"), col("SK"), col("_doc_id"), col("type"),
      attrString(item, "origin").as("origin"),
      attrString(item, "dest").as("dest"),
      attrTimestamp(item, "depart").as("depart"),
      attrTimestamp(item, "arrive").as("arrive"),
      attrLong(item, "number").as("number"), // N here, S on assignments
      attrLong(item, "segId").as("segId"),
      attrBool(item, "isSegment").as("isSegment"),
      attrStringArray(item, "segments").as("segments"),
      attrString(item, "GSI1PK").as("GSI1PK"),
      attrString(item, "GSI1SK").as("GSI1SK"),
      attrString(item, "GSI2PK").as("GSI2PK"),
      attrString(item, "GSI2SK").as("GSI2SK"))
  }

  /** assignment — SK = departTs#flightNo#segId#seat. `number` is a
    * string here (seat row), SSR is a stringified list ("[wheelchair,
    * vegan]", table-data.json:715).
    */
  def decodeAssignment(routed: DataFrame): DataFrame = {
    val item = col("item")
    routed.select(
      col("PK"), col("SK"), col("_doc_id"), col("type"),
      attrString(item, "number").as("number"),
      attrString(item, "seat").as("seat"),
      attrStringArray(item, "SSR").as("ssr"),
      attrString(item, "GSI2PK").as("GSI2PK"),
      attrString(item, "GSI2SK").as("GSI2SK"))
      .withColumn("sk_depart", to_timestamp(skPart(1)))
      .withColumn("sk_flight", skPart(2).cast("long"))
      .withColumn("sk_segId", skPart(3).cast("long"))
      .withColumn("sk_seat", skPart(4))
  }

  /** booking — SK = departTs#flightNo. */
  def decodeBooking(routed: DataFrame): DataFrame = {
    val item = col("item")
    routed.select(
      col("PK"), col("SK"), col("_doc_id"), col("type"),
      attrDecimal(item, "segments").cast("long").as("segments"), // N on bookings
      attrString(item, "GSI1PK").as("GSI1PK"),
      attrString(item, "GSI1SK").as("GSI1SK"))
      .withColumn("sk_depart", to_timestamp(skPart(1)))
      .withColumn("sk_flight", skPart(2).cast("long"))
  }

  /** GSI1 access path (table-attributes.json:39-55): same rows re-keyed
    * by (GSI1PK, GSI1SK), sparse — rows without the GSI keys are
    * omitted, exactly like a DynamoDB sparse index. In Spark a GSI is
    * just a filtered re-partitioned projection — no physical index.
    */
  def gsi1(entity: DataFrame): DataFrame =
    entity.filter(col("GSI1PK").isNotNull && col("GSI1SK").isNotNull)
      .repartition(col("GSI1PK"))
      .sortWithinPartitions(col("GSI1PK"), col("GSI1SK"))
}

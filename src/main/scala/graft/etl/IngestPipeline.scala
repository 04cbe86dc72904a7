package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's whole batch data path as one composable pipeline
  * (SURVEY.md §3.2): export scan (S1) → typed-attribute decode (T1) →
  * empty-attribute cleanup (P4) → doc-id (T2) → route on `type`
  * (P1–P3) → per-entity materializations (S5) with undecodable rows to
  * a DLQ (S6).
  *
  * Routes are reference-faithful: `fare` and `flight` are bound;
  * `assignment`/`booking` match no route and are dropped (P3) unless
  * `keepDropped`. Rows with no usable primary key cannot be addressed
  * by any sink — they go to the DLQ rather than vanishing.
  */
object IngestPipeline {

  final case class Result(
      fare: DataFrame,
      flight: DataFrame,
      dropped: DataFrame,
      dlq: DataFrame,
      private val routed: Option[Router.Routed] = None) {
    /** Release the cached decoded scan once the outputs are written. */
    def release(): Unit = routed.foreach(_.unpersist())
  }

  def run(spark: SparkSession, exportPath: String): Result =
    fromRaw(DdbJson.readExport(spark, exportPath))

  def fromRaw(raw: DataFrame): Result = {
    val decoded = DdbJson.decodeCommon(raw)
    val dlq = decoded.filter(col("PK").isNull || col("SK").isNull)
    val ok = decoded.filter(col("PK").isNotNull && col("SK").isNotNull)
    val routed = Router.route(ok, Seq(
      "fare" -> (col("type") === "fare"),
      "flight" -> (col("type") === "flight")))
    Result(
      fare = Entities.decodeFare(routed.matched("fare")),
      flight = Entities.decodeFlight(routed.matched("flight")),
      dropped = routed.dropped,
      dlq = dlq,
      routed = Some(routed))
  }

  /** Materialize the per-entity "indices" + DLQ under `outDir`. At scale
    * the entity tables would also be bucketed by PK for co-located key
    * lookups; sortWithinPartitions preserves the DynamoDB range-key
    * order contract (O1).
    */
  def materialize(r: Result, outDir: String): Unit = {
    r.fare.repartition(col("PK")).sortWithinPartitions(col("PK"), col("SK"))
      .write.mode("overwrite").parquet(s"$outDir/fare")
    r.flight.repartition(col("PK")).sortWithinPartitions(col("PK"), col("SK"))
      .write.mode("overwrite").parquet(s"$outDir/flight")
    // DLQ keyed by route (reference: dlq/fare, dlq/flight) — rows that
    // decoded no type land under _unknown rather than vanishing; for
    // unparseable lines `raw` is the original text
    val corrupt =
      if (r.dlq.columns.contains("_corrupt")) col("_corrupt")
      else lit(null: String)
    r.dlq.select(
        coalesce(col("type"), lit("_unknown")).as("_route"),
        col("_doc_id"), coalesce(to_json(col("item")), corrupt).as("raw"))
      .write.mode("overwrite").partitionBy("_route").parquet(s"$outDir/dlq")
    r.release()
  }
}

package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE deterministic synthetic lat/lon point set every geo query
  * (q125 grid, q164 radius, q173 box, q181 grid-agg, q182 sort) and
  * its DuckDB oracle CTE derive from: customer keys hashed onto a
  * [-90, 90) × [-180, 180) grid with exact integer arithmetic before
  * ONE float divide, so both engines build identical doubles. Shared
  * so the recipe can never drift between queries while their oracles
  * share one CTE text.
  */
object GeoFixtures {
  def syntheticPoints(customer: DataFrame): DataFrame =
    syntheticPointsKeeping(customer)

  /** The ONE lat/lon recipe, carrying any extra source columns through
    * (for queries that need a payload column next to the coordinates).
    * [[syntheticPoints]] delegates here so the recipe exists exactly
    * once — the no-drift doctrine the scaladoc promises.
    */
  def syntheticPointsKeeping(customer: DataFrame, extras: String*): DataFrame =
    customer.select(
      (col("c_custkey") +: extras.map(col)) ++ Seq(
        (((col("c_custkey") * lit(2654435761L)) % lit(180000L)).cast("double")
          / lit(1000.0) - lit(90.0)).as("lat"),
        (((col("c_custkey") * lit(40503L) + lit(7L)) % lit(360000L)).cast("double")
          / lit(1000.0) - lit(180.0)).as("lon")): _*)

  /** Deterministic synthetic ENVELOPE set (doc-side shapes for the
    * geo_shape `doc_shape` arm): the [[syntheticPoints]] recipe for
    * the min corner, plus a hashed 0–12° extent per axis — the same
    * exact-integer-then-one-divide structure, so both engines build
    * identical doubles and the box relations hash-match.
    */
  def syntheticBoxes(customer: DataFrame): DataFrame = {
    val latMin = ((col("c_custkey") * lit(2654435761L)) % lit(160000L))
      .cast("double") / lit(1000.0) - lit(85.0)
    val lonMin = ((col("c_custkey") * lit(40503L) + lit(7L)) % lit(340000L))
      .cast("double") / lit(1000.0) - lit(175.0)
    val latExt = ((col("c_custkey") * lit(48271L) + lit(11L)) % lit(12000L))
      .cast("double") / lit(1000.0)
    val lonExt = ((col("c_custkey") * lit(69621L) + lit(3L)) % lit(12000L))
      .cast("double") / lit(1000.0)
    customer.select(
      col("c_custkey"),
      latMin.as("lat0"), (latMin + latExt).as("lat1"),
      lonMin.as("lon0"), (lonMin + lonExt).as("lon1"))
  }
}

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
    customer.select(
      col("c_custkey"),
      (((col("c_custkey") * lit(2654435761L)) % lit(180000L)).cast("double")
        / lit(1000.0) - lit(90.0)).as("lat"),
      (((col("c_custkey") * lit(40503L) + lit(7L)) % lit(360000L)).cast("double")
        / lit(1000.0) - lit(180.0)).as("lon"))
}

package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The r14 geo_line bounded heap (VERDICT r13 #2): per-bucket state is
  * O(size), and the output is byte-identical to the old
  * sort_array(collect_list) + slice shape — asserted here against an
  * independently computed truth (generator arithmetic), on a bucket
  * 4000× the requested size.
  */
class GeoLineHeapSpec extends SparkSpec {
  import spark.implicits._

  // one hot bucket of 20k points + a small bucket; sort key descends
  // as id ascends so asc-truncation keeps the LAST ids
  private def pts = spark.range(20000)
    .select(
      col("id"),
      lit("hot").as("g"),
      (lit(20000) - col("id")).cast("double").as("s"),
      (col("id") % 90).cast("double").as("plat"),
      (col("id") % 180).cast("double").as("plon"))
    .union(spark.range(3).select(
      col("id"), lit("cold").as("g"), col("id").cast("double").as("s"),
      col("id").cast("double").as("plat"), (col("id") * 2).cast("double").as("plon")))

  private def run(order: String, size: Int) = QueryDsl.search(pts.toDF(),
    s"""{"size": 0, "aggs": {"g": {"terms": {"field": "g", "size": 10},
         "aggs": {"track": {"geo_line": {"lat_field": "plat",
           "lon_field": "plon", "sort_field": "s",
           "sort_order": "$order", "size": $size}}}}}}""")

  test("a bucket 4000x the size truncates to the exact first-k track") {
    val got = run("asc", 5).orderBy(col("g"))
      .select(col("g"), col("track_lats"), col("track_lons"))
      .as[(String, Seq[Double], Seq[Double])].collect().toSeq
    // asc by s: s = 20000 - id, so the smallest s are the LARGEST ids
    // 19999, 19998, ... — lat = id % 90, lon = id % 180
    val hotIds = (19999L to 19995L by -1L)
    assert(got === Seq(
      ("cold", Seq(0.0, 1.0, 2.0), Seq(0.0, 2.0, 4.0)),
      ("hot", hotIds.map(i => (i % 90).toDouble),
        hotIds.map(i => (i % 180).toDouble))))
  }

  test("desc order reverses the full tuple order like sort_array desc") {
    val got = run("desc", 4).orderBy(col("g"))
      .select(col("g"), col("track_lats"))
      .as[(String, Seq[Double])].collect().toSeq
    // desc by s: largest s first = ids 0, 1, 2, 3
    assert(got === Seq(
      ("cold", Seq(2.0, 1.0, 0.0)),
      ("hot", Seq(0.0, 1.0, 2.0, 3.0))))
  }

  test("the plan carries the typed heap, not collect_list") {
    val plan = run("asc", 5).queryExecution.executedPlan.toString()
    assert(!plan.contains("collect_list"), plan.take(2000))
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      plan.take(2000))
  }

  test("ties on the sort value break by (lat, lon) — the pinned total order") {
    val tied = Seq(
      (1L, 1.0, 5.0, 9.0), (2L, 1.0, 3.0, 1.0), (3L, 1.0, 3.0, 0.5),
      (4L, 1.0, 4.0, 2.0), (5L, 0.5, 9.0, 9.0)
    ).toDF("id", "s", "plat", "plon").withColumn("g", lit("t"))
    val got = QueryDsl.search(tied,
      """{"size": 0, "aggs": {"g": {"terms": {"field": "g", "size": 1},
           "aggs": {"track": {"geo_line": {"lat_field": "plat",
             "lon_field": "plon", "sort_field": "s", "size": 3}}}}}}""")
      .select(col("track_lats"), col("track_lons"))
      .as[(Seq[Double], Seq[Double])].head()
    // order: (0.5,9,9), then s=1 ties by lat: (1,3,0.5), (1,3,1)
    assert(got === ((Seq(9.0, 3.0, 3.0), Seq(9.0, 0.5, 1.0))))
  }
}

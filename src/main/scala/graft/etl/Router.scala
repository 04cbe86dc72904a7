package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate routing with drop-unmatched semantics — P1–P3 of
  * SURVEY.md §2.2, mirroring the Data Prepper `route:` block
  * (custom_resource.py:340-342): an event may match multiple routes;
  * events matching none reach no sink (the reference silently drops
  * `assignment`/`booking`).
  *
  * Two physical strategies:
  *  - `route`: N filters over one (optionally cached) input — right
  *    when routes feed different downstream transforms.
  *  - `writeFanout`: single-pass `partitionBy` write — right when
  *    routes only differ by destination; one scan regardless of route
  *    count, and downstream reads get partition pruning for free.
  */
object Router {

  final case class Routed(matched: Map[String, DataFrame], dropped: DataFrame,
      private val source: Option[DataFrame] = None) {
    /** Release the cached scan once every route has been materialized —
      * long-lived sessions otherwise accumulate cached blocks.
      */
    def unpersist(): Unit = source.foreach(_.unpersist())
  }

  def route(df: DataFrame, routes: Seq[(String, Column)],
      cache: Boolean = true): Routed = {
    require(routes.nonEmpty, "route needs at least one (name, predicate)")
    val src = if (cache) df.persist() else df
    val anyMatch = routes.map(_._2).reduce(_ || _)
    Routed(
      routes.map { case (name, pred) => name -> src.filter(pred) }.toMap,
      src.filter(!coalesce(anyMatch, lit(false))),
      if (cache) Some(src) else None)
  }

  /** Routes declared as OpenSearch query-DSL JSON request-body
    * `query` objects — the wire format the reference's clients
    * already speak — compiled by [[graft.search.QueryDsl]] to the
    * same pushable Catalyst predicates a hand-written route uses
    * (score discarded: routing is filter context). A route config
    * can therefore ship as data, not code, exactly like the Data
    * Prepper YAML's route expressions.
    */
  def routeDsl(df: DataFrame, routes: Seq[(String, String)],
      cache: Boolean = true): Routed =
    route(df, routes.map { case (name, json) =>
      name -> graft.search.QueryDsl.compileQuery(
        graft.search.QueryDsl.parse(json)).pred
    }, cache)

  /** Single-pass fan-out write: route tag becomes a partition column.
    * Multi-match faithful to `route`: a row matching several routes is
    * written under every matching partition (array of matched names →
    * explode), so the two strategies never diverge on overlapping
    * predicates. Unmatched rows go to `_dropped` when `keepDropped`,
    * else nowhere (reference-faithful default — explode drops the
    * empty array).
    */
  def writeFanout(df: DataFrame, routes: Seq[(String, Column)], path: String,
      keepDropped: Boolean = false): Unit = {
    val matched = filter(
      array(routes.map { case (name, pred) =>
        when(coalesce(pred, lit(false)), lit(name))
      }: _*),
      _.isNotNull)
    val tags =
      if (keepDropped) when(size(matched) === 0, array(lit("_dropped"))).otherwise(matched)
      else matched
    df.withColumn("_route", explode(tags))
      .write.mode("overwrite").partitionBy("_route").parquet(path)
  }
}

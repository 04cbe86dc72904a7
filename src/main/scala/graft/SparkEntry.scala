package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are derived from [[Registry]], which pairs
  * every Spark implementation with its DuckDB oracle SQL in one value.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q1_agg").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** All engine queries; extend per operator area. */
object Registry {
  def all: Seq[GraftQuery] =
    graft.queries.Relational.queries ++
      graft.queries.Scalars.queries ++
      graft.queries.Search.queries ++
      graft.queries.EtlOps.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Sampling.queries ++
      graft.queries.Curation.queries ++
      graft.queries.MultimodalOps.queries ++
      graft.queries.DslSearch.queries

  def byName(name: String): GraftQuery =
    all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))

  def headline: Seq[GraftQuery] = all.filter(_.headline)
}

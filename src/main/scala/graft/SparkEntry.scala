package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every implemented query, assembled from the per-area registries. */
  def registry: Seq[Q] = queries_all

  private lazy val queries_all: Seq[Q] =
    graft.queries.CoreQueries.all ++
      graft.queries.Core2Queries.all ++
      graft.queries.ExtraQueries.all ++
      graft.queries.Extra2Queries.all ++
      graft.queries.Extra3Queries.all ++
      graft.queries.Extra4Queries.all ++
      graft.queries.Extra5Queries.all ++
      graft.queries.Extra6Queries.all ++
      graft.queries.Extra7Queries.all ++
      graft.queries.LineageQueries.all ++
      graft.queries.PipelineQueries.all ++
      graft.queries.Text2Queries.all ++
      graft.queries.Text3Queries.all ++
      graft.queries.StreamQueries.all ++
      graft.queries.SqlQueries.all ++
      graft.queries.SourceQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q19_multijoin_agg")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the declared queries of every operator module (SURVEY.md §2
  * inventory). Each module pairs a DataFrame query with a DuckDB oracle twin;
  * modules without an oracle entry get the driver's rows-only check.
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.Aggregates,
    operators.WindowOps,
    operators.Scalars,
    text.TextAnalysis,
    text.Privacy,
    text.Monitoring,
    dedup.Dedup,
    dedup.EntityResolution,
    similarity.Similarity,
    similarity.Pca,
    analytics.Behavioral,
    analytics.Probe,
    streaming.Streaming,
    domain.GridQueries,
    multimodal.Multimodal,
    sources.SourceQueries,
    graph.GraphQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregates.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracleSql).reduce(_ ++ _)
}

package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every operator module's registry; `oracleSql`
  * carries the DuckDB-equivalent ANSI SQL for each SQL-expressible entry.
  * Column names and row order are made to match the oracle exactly (see
  * [[graft.Tables]] determinism conventions).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Cleaning.queries ++
      operators.Enrichment.queries ++
      operators.TextAnalysis.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Events.queries ++
      operators.Multimodal.queries ++
      operators.Quality.queries ++
      operators.Graph.queries ++
      operators.Stats.queries ++
      operators.AsOf.queries ++
      operators.Linkage.queries ++
      operators.TypedAgg.queries ++
      engine.Skew.queries ++
      engine.Pipelines.queries ++
      sources.Lake.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++
      operators.Cleaning.oracle ++
      operators.Enrichment.oracle ++
      operators.TextAnalysis.oracle ++
      operators.Dedup.oracle ++
      operators.Similarity.oracle ++
      operators.Events.oracle ++
      operators.Multimodal.oracle ++
      operators.Quality.oracle ++
      operators.Graph.oracle ++
      operators.Stats.oracle ++
      operators.AsOf.oracle ++
      operators.Linkage.oracle ++
      operators.TypedAgg.oracle ++
      engine.Skew.oracle ++
      engine.Pipelines.oracle ++
      sources.Lake.oracle
}

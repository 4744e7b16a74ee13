package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{r2, t}

/** Hive-style partitioned-lake layout — the storage discipline that makes
  * 100 TB scans affordable: data written under `col=value/` directories
  * so a filter on the partition column prunes whole directories at
  * planning time (complementing [[graft.BucketingSpec]]'s bucketed-join
  * layout: partitioning prunes SCANS, bucketing removes join SHUFFLES).
  *
  * The reference has no storage layout at all (one CSV in, one Excel
  * out); this is north-star scale surface, gated like wb1: a physical
  * write-then-read roundtrip whose final result the DuckDB oracle
  * recomputes from the source table directly, so a partition-boundary
  * bug (rows landing in the wrong directory, partition-column type
  * mangling) breaks the hash.
  */
object Lake {

  private def lakeDir(name: String): String =
    new java.io.File(sys.props("user.dir"), s"target/lake/$name").getAbsolutePath

  /** Write events partitioned by event_type, read back ONE partition, and
    * summarize it. The read's filter must resolve at planning time
    * against the directory layout (PlanSpec asserts `PartitionFilters`
    * carries the predicate and the data filters are empty — directory
    * pruning, not row filtering).
    */
  def partitionedRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = lakeDir("events_by_type")
    t(spark, dir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    spark.read.parquet(out)
      .filter(col("event_type") === "click")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"),
        r2(sum(col("value"))).as("total_value"))
      .orderBy("event_type")
  }

  /** The read side of [[partitionedRoundtrip]] alone (for plan
    * assertions): one partition's scan after the write.
    */
  private[graft] def prunedScan(spark: SparkSession, dir: String): DataFrame = {
    val out = lakeDir("events_by_type")
    t(spark, dir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    spark.read.parquet(out).filter(col("event_type") === "click")
  }

  /** Small-files control: repartition to an explicit file budget before
    * writing — the operational knob that keeps a 1000-executor job from
    * emitting a million KB-sized files (and the reverse: one giant file
    * per partition). Returns the written path; LakeSpec asserts the
    * file count equals the budget.
    */
  def compactedWrite(df: DataFrame, name: String, numFiles: Int): String = {
    val out = lakeDir(name)
    df.repartition(numFiles).write.mode("overwrite").parquet(out)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake1_partitioned_roundtrip" -> partitionedRoundtrip
  )

  val oracle: Map[String, String] = Map(
    "lake1_partitioned_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  round(sum(value), 2) AS total_value
        |FROM events
        |WHERE event_type = 'click'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
  )
}

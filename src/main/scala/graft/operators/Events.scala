package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{t, r2}

/** Windowed aggregation over the `events` stream table, batch mode
  * (north-star extension, SURVEY.md §2.5 "Streaming"). These are the
  * DuckDB-checkable batch equivalents of the Structured Streaming
  * pipelines in [[graft.streaming]] — `window()`/`session_window()` in a
  * batch groupBy compute exactly what the streaming job emits once the
  * watermark passes, which is what makes the semantics testable.
  *
  * Window starts are emitted as epoch milliseconds (engine-portable;
  * avoids timestamp codec differences). All windows are epoch-aligned, so
  * the oracle reproduces them with date_trunc / bucket arithmetic.
  */
object Events {

  /** Tumbling 1-hour windows per event type: the canonical streaming
    * aggregation (partial aggregation map-side; one shuffle on
    * (window, event_type)).
    */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), r2(sum(col("value"))).as("total_value"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start_ms", "event_type")

  /** Sliding 1-hour windows every 30 minutes: each event lands in exactly
    * two epoch-aligned windows.
    */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), r2(sum(col("value"))).as("total_value"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("n"), col("total_value"))
      .orderBy("window_start_ms")

  /** Per-user sessionization with a 5-minute inactivity gap
    * (`session_window`): session end = last event + gap, merge iff the
    * next event arrives strictly inside the gap.
    */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), r2(sum(col("value"))).as("total_value"))
      .select(col("user_id"), unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start_ms")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev1_tumbling_window" -> tumbling,
    "ev2_sliding_window" -> sliding,
    "ev3_sessions" -> sessions
  )

  val oracle: Map[String, String] = Map(
    "ev1_tumbling_window" ->
      """SELECT epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS window_start_ms,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start_ms, event_type""".stripMargin,
    "ev2_sliding_window" ->
      """WITH b AS (
        |  SELECT epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(CAST(ts AS TIMESTAMP)) % 1800000 AS t30, value
        |  FROM events),
        | w AS (
        |  SELECT t30 AS ws, value FROM b
        |  UNION ALL
        |  SELECT t30 - 1800000, value FROM b)
        |SELECT ws AS window_start_ms, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM w
        |GROUP BY ws
        |ORDER BY window_start_ms""".stripMargin,
    "ev3_sessions" ->
      """WITH us AS (
        |  -- truncate to microseconds first: Spark's ts is ns div 1000, and
        |  -- DuckDB's TIMESTAMP_NS->TIMESTAMP cast truncates identically,
        |  -- so gap comparisons agree at the boundary
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        | o AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM us),
        | marked AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN prev_ts IS NULL
        |           OR ts - prev_ts >= INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM o),
        | grp AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  epoch_ms(min(ts)) AS session_start_ms,
        |  epoch_ms(max(ts)) + 300000 AS session_end_ms,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM grp
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin
  )
}

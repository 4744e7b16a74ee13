package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver test tables (`TESTDATA.md`) and for
  * oracle-deterministic query output.
  *
  * Determinism conventions (driver hash-compares our parquet dump against a
  * DuckDB run of `SparkEntry.oracleSql`, sorting columns by name):
  *   - every query result is fully ordered (`orderBy` on a unique key set) so
  *     row order cannot depend on partitioning;
  *   - every floating-point aggregate is rounded (`r2`/`r6`) identically on
  *     both sides, so parallel-summation error below the rounding grain
  *     cannot flip the hash.
  */
object Tables {

  /** Load one driver parquet table from an sf directory.
    *
    * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * rejects by default; it is read via the nanos-as-long escape hatch and
    * converted to a microsecond timestamp (`ts div 1000` floor-truncates,
    * matching DuckDB's TIMESTAMP_NS → TIMESTAMP cast for the oracle).
    *
    * The escape hatch is a SESSION-WIDE conf and is deliberately left set
    * (an engine-wide default, also set by [[GraftSession]]): restoring it
    * after this call would be unsound because the returned frame is lazy
    * and re-consults the conf at execution. Effect on other reads: parquet
    * nanos columns elsewhere decode as raw longs instead of failing — an
    * explicit schema shape, not silent data corruption.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.select(raw.columns.map {
        case "ts" => expr("timestamp_micros(ts div 1000)").as("ts")
        case c => col(c)
      }.toIndexedSeq: _*)
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Round a double aggregate to cents — for sums of monetary columns. */
  def r2(c: Column): Column = round(c, 2)

  /** Round a double aggregate to 6 places — for averages/ratios where more
    * resolution is meaningful but bit-exactness across engines is not
    * guaranteed.
    */
  def r6(c: Column): Column = round(c, 6)
}

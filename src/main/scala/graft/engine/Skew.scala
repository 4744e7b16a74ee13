package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §2.5 / north-star scale notes).
  *
  * AQE's skew-join handling (on by default in Spark 4) covers sort-merge
  * joins; explicit salting remains the tool for aggregations and for joins
  * where one side must be replicated. The salt here is DETERMINISTIC —
  * derived by hashing a caller-named unique column — so results are
  * replayable and oracle-checkable, unlike `rand()`-based salting.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from a row-unique column. */
  def saltCol(unique: Column, buckets: Int): Column =
    pmod(hash(unique), lit(buckets))

  /** Salted equi-join: the big (skewed) side gets a deterministic salt,
    * the small side is replicated `buckets` times, and the join runs on
    * (key, salt) — splitting each hot key's rows across `buckets`
    * partitions. Result equals the plain inner join on `key` (asserted by
    * SkewSpec).
    *
    * @param bigUnique a row-unique column of `big` used to derive the salt
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      bigUnique: String, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(col(bigUnique), buckets))
    val replicated = small
      .withColumn("__salt", explode(lit((0 until buckets).toArray)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted partial -> final) aggregation for skewed group
    * keys: sums/counts accumulate per (key, salt) first, then combine.
    * Use when one group key dominates and a single reducer would bottleneck
    * (the map-side partial aggregation Spark already does usually suffices;
    * this adds an extra fan-out level for extreme skew).
    */
  def saltedSum(
      df: DataFrame, key: String, value: String,
      bigUnique: String, buckets: Int): DataFrame =
    df.withColumn("__salt", saltCol(col(bigUnique), buckets))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$value"))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t, r2, r6}

/** Relational query surface (SURVEY.md §2.5): aggregations, joins, windows,
  * set ops, top-k — the capabilities the reference lacks but the north star
  * requires, expressed as declarative DataFrame plans so Catalyst handles
  * pushdown, join selection (broadcast for the small dimensions), partial
  * aggregation and AQE.
  *
  * Scale notes (100 TB): every query here shuffles only on its aggregation or
  * join keys; dimension tables (region/nation/supplier/customer/part) are
  * broadcast-joined — no shuffle of the fact table for enrichment joins; the
  * fact-table scans push filters and prune columns into the parquet reader.
  */
object Relational {

  /** TPC-H Q1-style pricing summary over lineitem: single hash aggregate with
    * map-side partial aggregation; scan prunes to 7 of 11 columns and pushes
    * the shipdate filter (reference has no aggregation — SURVEY §2.5).
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" <= to_timestamp(lit("2001-09-02")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        r2(sum($"l_quantity")).as("sum_qty"),
        r2(sum($"l_extendedprice")).as("sum_base_price"),
        r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_price"),
        r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))).as("sum_charge"),
        r6(avg($"l_quantity")).as("avg_qty"),
        r6(avg($"l_extendedprice")).as("avg_price"),
        r6(avg($"l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}

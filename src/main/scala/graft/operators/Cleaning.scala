package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.engine.Preprocess

/** Oracle-checked queries exercising the P1-P10 cleaning pass
  * (graft.engine.Preprocess, SURVEY.md §2.2) over the driver tables.
  *
  * `p_clean_documents` runs the pass over a real table (string trim +
  * placeholder-null + exact row dedup). `p_clean_messy` first derives a messy
  * frame FROM `orders` deterministically (padded mixed-case headers,
  * punctuation in names, an unnamed column, an all-null column, placeholder
  * values, a numeric-as-string column, a datetime-as-string column with
  * per-value junk) so the oracle can verify name normalization, column drops,
  * the all-or-nothing double cast and per-value timestamp coercion.
  */
object Cleaning {

  def cleanDocuments(spark: SparkSession, dir: String): DataFrame =
    Preprocess.clean(t(spark, dir, "documents")).df.orderBy("doc_id")

  def cleanMessy(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val messy = o.select(
      concat(lit("  "), col("o_orderpriority"), lit(" ")).as(" Priority Level "),
      when(col("o_orderkey") % 100 === 0, lit("n/a"))
        .otherwise(col("o_orderkey").cast("string")).as("Order#Key!"),
      when(col("o_orderkey") % 7 === 0, lit("junk"))
        .otherwise(col("o_orderdate").cast("string")).as("Order Date"),
      lit(null).cast("string").as("empty_col"),
      col("o_orderstatus").as("Unnamed: 5"),
      col("o_totalprice").as("total"))
    Preprocess.clean(messy).df
      .orderBy(col("orderkey").asc_nulls_first, col("order_date").asc_nulls_first,
        col("priority_level"), col("total"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_clean_documents" -> cleanDocuments,
    "p_clean_messy" -> cleanMessy
  )

  private val ph = "('n/a','none','-','null','')"

  val oracle: Map[String, String] = Map(
    "p_clean_documents" ->
      s"""SELECT DISTINCT doc_id,
         |  trim(CASE WHEN text IN $ph THEN NULL ELSE text END) AS text,
         |  trim(CASE WHEN lang IN $ph THEN NULL ELSE lang END) AS lang,
         |  trim(CASE WHEN source IN $ph THEN NULL ELSE source END) AS source,
         |  n_chars
         |FROM documents
         |ORDER BY doc_id""".stripMargin,
    "p_clean_messy" ->
      """SELECT DISTINCT
        |  trim(o_orderpriority) AS priority_level,
        |  CASE WHEN o_orderkey % 100 = 0 THEN NULL
        |       ELSE CAST(o_orderkey AS DOUBLE) END AS orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderdate END AS order_date,
        |  o_totalprice AS total
        |FROM orders
        |ORDER BY orderkey ASC NULLS FIRST, order_date ASC NULLS FIRST,
        |  priority_level, total""".stripMargin
  )
}

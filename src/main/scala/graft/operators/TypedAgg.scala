package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY.md §2.5 UDAF): a
  * bounded top-k aggregator over `Dataset[OrderRow]`.
  *
  * The buffer holds AT MOST k elements at every step (insert + trim), so
  * partial aggregation ships k rows per partition per key — the property
  * that makes distributed top-k cheap: the shuffle carries O(keys x k),
  * never the fact table. Comparator (price desc, orderkey asc) matches the
  * window-function formulation exactly, so the DuckDB oracle is the
  * row_number form.
  */
object TypedAgg {

  final case class OrderRow(o_custkey: Long, o_orderkey: Long, o_totalprice: Double)
  final case class TopOrder(o_orderkey: Long, o_totalprice: Double)

  /** Keep the k best (totalprice desc, orderkey asc) orders. */
  final class TopKOrders(k: Int) extends Aggregator[OrderRow, List[TopOrder], Seq[TopOrder]] {
    private def lt(a: TopOrder, b: TopOrder): Boolean =
      a.o_totalprice > b.o_totalprice ||
        (a.o_totalprice == b.o_totalprice && a.o_orderkey < b.o_orderkey)

    override def zero: List[TopOrder] = Nil
    override def reduce(buf: List[TopOrder], row: OrderRow): List[TopOrder] =
      merge(buf, List(TopOrder(row.o_orderkey, row.o_totalprice)))
    override def merge(a: List[TopOrder], b: List[TopOrder]): List[TopOrder] =
      (a ++ b).sortWith(lt).take(k)
    override def finish(r: List[TopOrder]): Seq[TopOrder] = r
    override def bufferEncoder: Encoder[List[TopOrder]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[TopOrder]] = ExpressionEncoder()
  }

  /** Top-3 orders per customer through the typed Aggregator (same result
    * as the window formulation `w1_top_orders_per_customer`).
    */
  def topOrdersTyped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[OrderRow]
      .groupByKey(_.o_custkey)
      .agg(new TopKOrders(3).toColumn.name("top"))
      .toDF("o_custkey", "top")
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), col("col.o_orderkey").as("o_orderkey"),
        col("col.o_totalprice").as("o_totalprice"),
        (col("pos") + 1).cast("long").as("rn"))
      .orderBy("o_custkey", "rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg1_topk_typed" -> topOrdersTyped
  )

  val oracle: Map[String, String] = Map(
    "agg1_topk_typed" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin
  )
}

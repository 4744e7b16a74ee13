package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.t
import graft.engine.Skew

/** Salted join/aggregation equal their unsalted forms. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin == plain join on (orders x customer)") {
    val ord = t(spark, sf, "orders")
    val cust = t(spark, sf, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = ord.join(cust, Seq("o_custkey"))
    val salted = Skew.saltedJoin(ord, cust, "o_custkey", "o_orderkey", 8)
    assert(salted.count() == plain.count())
    assert(salted.select(plain.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      .exceptAll(plain).isEmpty)
  }

  test("saltedSum == plain groupBy sum") {
    import spark.implicits._
    val ord = t(spark, sf, "orders")
    val plain = ord.groupBy($"o_custkey")
      .agg(org.apache.spark.sql.functions.sum($"o_totalprice").as("sum_o_totalprice"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(ord, "o_custkey", "o_totalprice", "o_orderkey", 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, v) => assert(math.abs(v - plain(k)) < 1e-6) }
  }
}

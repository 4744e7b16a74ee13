package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Approximate-sketch surface (SURVEY §2.5 aggregations; 100 TB tooling):
  * HLL distinct counts and quantile sketches must land within documented
  * error of the exact answers. Sketch internals are engine-specific (no
  * DuckDB oracle can hash-match them) — the accuracy bound IS the
  * contract, pinned here against exact computations on the same data.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL) lands within 5% of exact on order keys") {
    val l = Tables.t(spark, sf, "lineitem")
    val exact = l.select(countDistinct(col("l_orderkey")).as("n"))
      .collect()(0).getLong(0)
    val approx = l.select(approx_count_distinct(col("l_orderkey"), 0.02).as("n"))
      .collect()(0).getLong(0)
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx tracks the exact median of extended price") {
    val l = Tables.t(spark, sf, "lineitem")
    val exact = l.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    val approx = l
      .select(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("m"))
      .collect()(0).getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** The SparkSessionExtensions seam: SQL-text access to custom
  * expressions.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("float_dot_product callable from SQL after registration") {
    GraftExtensions.registerOn(spark)
    val r = spark.sql(
      """SELECT float_dot_product(
        |  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }

  test("extensions object injects without error at construction") {
    // smoke: applying the extensions hook to a fresh container must not
    // throw (full wiring needs a new session, which local tests share)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}

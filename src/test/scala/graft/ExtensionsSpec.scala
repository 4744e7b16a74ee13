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

  test("graftbridge reaches Spark's private Column<->Expression seam") {
    // Bridge (org.apache.spark.sql.graftbridge) depends on the
    // `private[sql]` classic.ExpressionUtils — a deliberate, version-pinned
    // dependency on Spark 4.1 internals. If a Spark upgrade moves or
    // removes it, this test fails loudly at build time instead of the
    // library failing at runtime; the round-trip also pins the semantics.
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.graftbridge.Bridge
    // Column -> Expression -> Column round trip must yield an executable
    // column (the expression side is a lazily-resolved wrapper node, so
    // execution — not a type check — is what pins the seam).
    val expr = Bridge.expression(lit(42))
    val col = Bridge.column(expr)
    val out = spark.range(1).select(col.as("v")).collect()(0).getInt(0)
    assert(out == 42)
  }
}

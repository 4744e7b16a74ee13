package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Dictionary

/** D1-D4 over inline frames + the sf0.001 driver tables. */
class DictionarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("D1 long-format distinct dictionary: trim, dropna, one scan") {
    import spark.implicits._
    val df = Seq(
      (Some(" a "), Some("x")), (Some("a"), None), (None, Some("x")),
      (Some("b"), Some("y"))).toDF("c1", "c2")
    val dict = Dictionary.distinctValues(df, Seq("c1", "c2"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(dict == Set(("c1", "a"), ("c1", "b"), ("c2", "x"), ("c2", "y")))
  }

  test("D2 deterministic top-N sample") {
    val s = Dictionary.sampleTopNSeq(
      spark.read.parquet(s"$sf/documents.parquet"), "lang", 3)
    assert(s == Seq("de", "en", "es"))
  }

  test("D3 hashed sample is deterministic across invocations") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
    val a = Dictionary.sampleHashed(df, "source", 5).collect().map(_.getString(0)).toSeq
    val b = Dictionary.sampleHashed(df, "source", 5).collect().map(_.getString(0)).toSeq
    assert(a == b && a.size == 5)
  }

  test("D4 schema extraction") {
    val df = spark.read.parquet(s"$sf/region.parquet")
    assert(Dictionary.schemaOf(Map("region" -> df)) ==
      Map("region" -> Seq("r_regionkey", "r_name")))
  }
}

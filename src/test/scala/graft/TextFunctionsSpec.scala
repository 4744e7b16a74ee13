package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def one(c: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("t").select(c.as("r")).collect()(0).get(0)
  }

  test("tokenCount: whitespace words, empty-safe") {
    assert(one(tokenCount(col("t")), "a  b c") == 3L)
    assert(one(tokenCount(col("t")), "  ") == 0L)
    assert(one(tokenCount(col("t")), "one") == 1L)
  }

  test("bpeTokenCount: letter runs + digits + symbols") {
    assert(one(bpeTokenCount(col("t")), "Hello, wor4ld!") == 6L)
  }

  test("alpha/punct ratios") {
    assert(one(alphaRatio(col("t")), "ab,c 12") == 3.0 / 7)
    assert(one(punctRatio(col("t")), "a,b.") == 2.0 / 4)
  }

  test("langId: stopword argmax with en precedence, und fallback") {
    assert(one(langId(col("t")), "the cat and the dog") == "en")
    assert(one(langId(col("t")), "der Hund und die Katze ist") == "de")
    assert(one(langId(col("t")), "el perro y la casa de que") == "es")
    assert(one(langId(col("t")), "xyzzy qwerty") == "und")
  }

  test("fingerprint is whitespace/case-normalized") {
    val a = one(fingerprint(col("t")), "  The   CAT  ")
    val b = one(fingerprint(col("t")), "the cat")
    assert(a == b)
  }

  test("qualityScore in [0,1] and ranks clean text above junk") {
    val good = one(qualityScore(col("t")),
      "the quick brown fox jumps over a lazy dog in the morning sun and runs to the river")
      .asInstanceOf[Double]
    val junk = one(qualityScore(col("t")), "@@!! ## 123 ,,,, ....").asInstanceOf[Double]
    assert(good > junk && good <= 1.0 && junk >= 0.0)
  }

  test("redaction counts exactly the injected PII class per doc_id residue") {
    // the synthetic corpus carries no PII of its own, so the typed counts
    // must be exactly the one injected literal for that residue class
    val rows = graft.operators.TextAnalysis
      .redact(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val expected = (r.getAs[Long]("doc_id") % 5) match {
        case 0 => (1L, 0L, 0L)
        case 1 => (0L, 1L, 0L)
        case 2 => (0L, 0L, 1L)
        case _ => (0L, 0L, 0L)
      }
      val got = (r.getAs[Long]("n_emails"), r.getAs[Long]("n_urls"),
        r.getAs[Long]("n_phones"))
      assert(got == expected, s"doc ${r.getAs[Long]("doc_id")}: $got != $expected")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.DictionaryTranslator

/** E3/E4/E5 against the golden-artifact excerpt
  * (`src/test/resources/translation_map.json`, shaped like the reference's
  * `cache/translated-map.json`).
  */
class TranslateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val golden = DictionaryTranslator.fromJson(
    getClass.getResource("/translation_map.json").getPath)

  test("E3 golden mappings load and translate") {
    val m = golden.translate(Seq("Aral Autohof", "Verpflegungspauschale", "unseen value"))
    assert(m("Aral Autohof") == "Aral truck stop")
    assert(m("Verpflegungspauschale") == "Meal package")
    assert(m("unseen value") == "unseen value") // identity fallback
  }

  test("E4 single-value translation with identity fallback") {
    assert(golden.translateOne("An/Abreise") == "Arrival/departure")
    assert(golden.translateOne("already English") == "already English")
  }

  test("E3 totality: every input appears in the output map (scalacheck-style)") {
    val inputs = Seq("a", "", "Aral Autohof", "ü", "nan", "x y z")
    val out = golden.translate(inputs)
    assert(inputs.forall(out.contains))
    assert(out.values.forall(_ != null))
  }

  test("E5 both physical strategies agree and preserve nulls + unknowns") {
    import spark.implicits._
    val df = Seq(
      Some("Aral Autohof"), Some("Deutsche Bahn"), Some("unknown merchant"),
      None).toDF("merchant")
    val small = new DictionaryTranslator(golden.table).applyTo(df)
    val joined = new DictionaryTranslator(golden.table, literalMapThreshold = 0).applyTo(df)
    val expect = Set(Some("Aral truck stop"), Some("Deutsche Bahn"),
      Some("unknown merchant"), None)
    assert(small.collect().map(r => Option(r.getString(0))).toSet == expect)
    assert(joined.collect().map(r => Option(r.getString(0))).toSet == expect)
  }

  test("E5 large synthetic map takes the join path and rejoins correctly") {
    import spark.implicits._
    val bigMap = (0 until 20000).map(i => s"v$i" -> s"t$i").toMap
    val tr = new DictionaryTranslator(Map("c" -> bigMap)) // > default threshold
    val df = (0 until 500).map(i => s"v${i * 40}").toDF("c")
    val out = tr.applyTo(df).collect().map(_.getString(0)).toSet
    assert(out == (0 until 500).map(i => s"t${i * 40}").toSet)
  }
}

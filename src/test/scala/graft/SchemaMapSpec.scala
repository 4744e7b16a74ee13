package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.SchemaMap
import graft.engine.SchemaMap.ColumnMapping

/** E6/E7/E8: name-similarity mapping, LLM-line parsing + cleanup, vertical
  * partitioning — against the GHG star schema shape of the reference
  * (`prompts/schema_description.txt:1-11`).
  */
class SchemaMapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val ghg = Map(
    "DIM_Country" -> Seq("country_id", "country_name"),
    "DIM_Date" -> Seq("date_id", "year", "month", "day"),
    "DIM_Company" -> Seq("company_id", "company_name"),
    "FACT_EmissionActivityData" -> Seq("activity_id", "amount", "unit", "country_id"))

  test("E6 exact and near name matches, Unclear below threshold") {
    val m = new SchemaMap.NameSimilarityMapper()
    val out = m.mapColumns(
      Seq(" Country Name ", "amount", "company", "zzz_opaque"), ghg)
    assert(out(" Country Name ").contains(ColumnMapping("DIM_Country", "country_name")))
    assert(out("amount").contains(ColumnMapping("FACT_EmissionActivityData", "amount")))
    assert(out("company").get.table == "DIM_Company") // containment match
    assert(out("zzz_opaque").isEmpty)                 // Unclear
  }

  test("E6 determinism: ties break by (table, column), not map order") {
    val m = new SchemaMap.NameSimilarityMapper()
    val dest = Map("B_Table" -> Seq("val"), "A_Table" -> Seq("val"))
    val out = m.mapColumns(Seq("val"), dest)
    assert(out("val").contains(ColumnMapping("A_Table", "val")))
  }

  test("E7 parse LLM-style mapping lines with markdown junk and Unclear") {
    val parsed = SchemaMap.parseMappingLines(Seq(
      "1. **Country** -> DIM_Country.country_name",
      "amount -> FACT_EmissionActivityData.amount (the numeric value)",
      "note -> Unclear (needs review)",
      "garbage line without arrow"))
    assert(parsed("country").contains(ColumnMapping("DIM_Country", "country_name")))
    assert(parsed("amount").contains(
      ColumnMapping("FACT_EmissionActivityData", "amount")))
    assert(parsed("note").isEmpty)
    assert(!parsed.contains("garbage line without arrow"))
  }

  test("E7 cleanMapping drops unclear tables and strips parens") {
    val cleaned = SchemaMap.cleanMapping(Map(
      "**A**" -> Some(ColumnMapping("DIM_X", "col (explanation)")),
      "b" -> Some(ColumnMapping("unclear-table", "c")),
      "c" -> None))
    assert(cleaned == Map("a" -> ColumnMapping("DIM_X", "col")))
  }

  test("E8 vertical partition routes and renames, row-aligned") {
    import spark.implicits._
    val df = Seq((1, "DE", 10.5), (2, "FR", 20.0))
      .toDF("activity", "country", "amt")
    val parts = SchemaMap.verticalPartition(df, Map(
      "activity" -> ColumnMapping("FACT", "activity_id"),
      "amt" -> ColumnMapping("FACT", "amount"),
      "country" -> ColumnMapping("DIM_Country", "country_name"),
      "missing_src" -> ColumnMapping("DIM_Country", "x")))
    assert(parts.keySet == Set("FACT", "DIM_Country"))
    assert(parts("FACT").columns.toSeq == Seq("activity_id", "amount"))
    assert(parts("DIM_Country").collect().map(_.getString(0)).toSet == Set("DE", "FR"))
  }
}

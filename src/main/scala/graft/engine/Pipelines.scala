package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StringType

import graft.engine.Enrich.{ColumnClassifier, LanguageDetector}
import graft.engine.SchemaMap.{ColumnMapping, SchemaMapper}
import graft.sources.{Loader, WorkbookSink}

/** End-to-end pipelines mirroring the reference's three entry points
  * (SURVEY.md §3): EP1 `main.py` (load+clean), EP2 `translate.py:151-226`
  * (clean → dictionary → classify → detect → translate → apply), EP3
  * `mapper.py:195-235` (clean → schema-map → vertically partition → sink).
  *
  * Stage boundaries follow the reference but the execution model is
  * Spark's: the per-column dictionary work (classification, detection)
  * runs on tiny deterministic samples collected driver-side — bounded by
  * distinct-value counts, exactly like the reference's LLM-call inputs —
  * while everything row-scaled (cleaning, map application, partitioning)
  * stays a lazy DataFrame plan until the caller acts on it. The
  * reference's JSON checkpoint artifacts become optional returns (the
  * report object) instead of filesystem barriers.
  */
object Pipelines {

  /** EP2 stage artifacts — the checkpoint payloads of the reference
    * (`cache/unique_values.json`, classification/detection maps) as a
    * typed report.
    */
  final case class TranslateReport(
      df: DataFrame,
      columnLabels: Map[String, String],   // E1: col -> TEXT/NON-TEXT
      languageLabels: Map[String, String], // E2: TEXT col -> ENGLISH/NON-ENGLISH
      translatedColumns: Seq[String],      // columns actually mapped
      log: Seq[String])

  /** EP1: extension-dispatched load + the P1-P10 cleaning pass. */
  def cleanPipeline(spark: SparkSession, path: String,
      verbose: Boolean = false): Preprocess.CleanResult =
    Preprocess.clean(Loader.load(spark, path), verbose)

  /** EP2: the translation pipeline over an already-loaded frame. */
  def translatePipeline(
      df: DataFrame,
      translator: DictionaryTranslator,
      classifier: ColumnClassifier = Enrich.HeuristicColumnClassifier,
      detector: LanguageDetector = Enrich.HeuristicLanguageDetector,
      sampleN: Int = 10): TranslateReport = {

    val cleaned = Preprocess.clean(df)
    val stringCols = cleaned.df.schema.fields
      .filter(_.dataType == StringType).map(_.name).toSeq

    // D2 samples -> E1 classification (driver-side, one tiny job per col —
    // same cost shape as the reference's one LLM call per column). The
    // per-column jobs are independent; submit them concurrently instead
    // of paying N sequential job latencies on wide tables.
    // Finite deadline + scoped cancellation (Jobs.boundedTraverse): a
    // wedged sample job surfaces as an error without hanging the driver or
    // cancelling unrelated work on a shared SparkContext.
    val samples = Jobs.boundedTraverse(
        cleaned.df.sparkSession, stringCols, "translatePipeline-samples")(c =>
        c -> Dictionary.sampleTopNSeq(cleaned.df, c, sampleN))
      .toMap
    val columnLabels = samples.map { case (c, s) => c -> classifier.classify(c, s) }
    val textCols = stringCols.filter(c => columnLabels(c) == "TEXT")

    // E2 detection over TEXT columns only (translate.py:196-204)
    val languageLabels = textCols.map(c => c -> detector.detect(samples(c))).toMap
    val nonEnglish = textCols.filter(c => languageLabels(c) == "NON-ENGLISH")

    // E3+E5: translate only NON-ENGLISH text columns, identity fallback
    val translated = translator.applyTo(cleaned.df, nonEnglish)
    val applied = nonEnglish.filter(c => translator.forColumn(c).nonEmpty)

    TranslateReport(translated, columnLabels, languageLabels, applied,
      cleaned.log ++
        Seq(s"TEXT columns: ${textCols.mkString(", ")}",
          s"NON-ENGLISH columns: ${nonEnglish.mkString(", ")}",
          s"Translated columns: ${applied.mkString(", ")}"))
  }

  /** EP3: schema-map a cleaned frame onto a destination star schema and
    * vertically partition; optionally sink one dataset per table.
    */
  def mapPipeline(
      df: DataFrame,
      destSchema: Map[String, Seq[String]],
      mapper: SchemaMapper = new SchemaMap.NameSimilarityMapper(),
      sinkPath: Option[String] = None): Map[String, DataFrame] = {
    val cleaned = Preprocess.clean(df).df
    val mapping: Map[String, ColumnMapping] =
      mapper.mapColumns(cleaned.columns.toSeq, destSchema)
        .collect { case (src, Some(cm)) => src -> cm }
    val tables = SchemaMap.verticalPartition(cleaned, mapping)
    sinkPath.foreach(p => WorkbookSink.save(tables, p))
    tables
  }
}

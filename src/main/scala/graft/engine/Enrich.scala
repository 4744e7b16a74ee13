package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic enrichment engines replacing the reference's LLM calls
  * (SURVEY.md §2.4, E1/E2). The reference's semantics are "a labeling
  * function exists and is applied to a small deterministic sample per
  * column" — the contract here preserves the sample-in/label-out shape
  * (`prompts/text_column_classifier.txt`, `prompts/detect_language.txt`)
  * with pluggable implementations; the default impls are pure heuristics,
  * so the pipeline is reproducible and zero-egress.
  *
  * Labels match the reference's closed vocabularies:
  * `TEXT`/`NON-TEXT`/`UNKNOWN` (`translate.py:36-55`) and
  * `ENGLISH`/`NON-ENGLISH`/`UNKNOWN` (`translate.py:57-76`; the prompt's
  * rule "any one non-English value ⇒ NON-ENGLISH", `detect_language.txt:5`).
  * The `ERROR` label of the reference (its exception path) cannot occur in
  * a pure implementation and is intentionally absent.
  */
object Enrich {

  /** E1: free-text vs code/id/numeric column classifier
    * (`translate.py:36-55`).
    */
  trait ColumnClassifier {
    /** @return "TEXT", "NON-TEXT" or "UNKNOWN" */
    def classify(columnName: String, sample: Seq[String]): String
  }

  /** E2: column-level language detector (`translate.py:57-76`). */
  trait LanguageDetector {
    /** Per-value score: true iff the value looks non-English. */
    def isNonEnglish(value: String): Boolean
    /** @return "ENGLISH", "NON-ENGLISH" or "UNKNOWN" */
    def detect(sample: Seq[String]): String = {
      val vals = sample.filter(v => v != null && v.nonEmpty)
      if (vals.isEmpty) "UNKNOWN"
      else if (vals.exists(isNonEnglish)) "NON-ENGLISH" // prompt line 5
      else "ENGLISH"
    }
  }

  /** Default E1: a value is non-text when it is numeric-like, id-like
    * (letters + `#`/`_` + trailing digits), or a short single-token code;
    * the column is TEXT when fewer than half the sampled values are
    * non-text. Pure and total — same inputs, same label, any machine.
    */
  object HeuristicColumnClassifier extends ColumnClassifier {
    private val NumericLike = "^[-+]?[\\d.,/:\\s%-]+$".r
    private val IdLike = "^[A-Za-z]*[#_]?\\d+$".r

    def valueNonText(v: String): Boolean = {
      val t = v.trim
      t.isEmpty ||
        NumericLike.matches(t) ||
        IdLike.matches(t) ||
        (t.length <= 3 && !t.exists(_.isWhitespace))
    }

    override def classify(columnName: String, sample: Seq[String]): String = {
      val vals = sample.filter(v => v != null && v.trim.nonEmpty)
      if (vals.isEmpty) "UNKNOWN"
      else {
        val nonText = vals.count(valueNonText)
        if (nonText * 2 < vals.size) "TEXT" else "NON-TEXT"
      }
    }
  }

  /** Default E2: a value is non-English when it contains a non-ASCII
    * letter, its tokens hit more non-English stopwords than English ones,
    * or a token carries a characteristic non-English suffix (German
    * compounds like "Verpflegungspauschale" contain no stopwords at all —
    * the reference's golden artifact is full of them). Lexica cover the
    * languages of `cache/translated-map.json` (de, fr, es, sv).
    */
  object HeuristicLanguageDetector extends LanguageDetector {
    private[graft] val ForeignStopwords: Set[String] = Set(
      // de
      "der", "die", "das", "und", "nicht", "mit", "für", "ist", "von", "des",
      "ein", "eine", "im", "zum", "zur", "bei", "nur", "oder", "kosten",
      "anderes", "ausland", "inland", "geschenke",
      // fr
      "le", "les", "et", "ou", "je", "est", "une", "du", "au", "aux", "sur",
      // es
      "el", "los", "las", "una", "que", "por", "con", "nacional",
      // sv
      "och", "på", "för", "till", "av", "med", "som", "hotell", "resor",
      "parkering")

    /** Word suffixes characteristic of the artifact's source languages and
      * vanishingly rare as English word endings.
      */
    private[graft] val ForeignSuffixes: Seq[String] =
      Seq("keit", "heit", "schale", "kosten", "aje", "ttning", "samkeit")
    private[graft] val EnglishStopwords: Set[String] = Set(
      "the", "and", "of", "to", "in", "is", "for", "with", "on", "at", "by",
      "from", "as", "or", "an", "be", "this", "that", "it", "are")

    override def isNonEnglish(value: String): Boolean = {
      val hasForeignLetter = value.exists(c => c > 127 && Character.isLetter(c))
      if (hasForeignLetter) true
      else {
        // Distinct-token hits, matching the array_intersect semantics of
        // the distributed form below.
        val tokens = value.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty).toSet
        val foreign = tokens.count(ForeignStopwords)
        val english = tokens.count(EnglishStopwords)
        val suffixHit = tokens.exists(t =>
          ForeignSuffixes.exists(s => t.length > s.length && t.endsWith(s)))
        suffixHit || (foreign > 0 && foreign > english)
      }
    }

    /** Distributed form of [[isNonEnglish]] as a pure Column expression —
      * used when scoring the full distinct dictionary instead of a sample,
      * so detection scales with cardinality and stays codegen-friendly (no
      * UDF).
      */
    def isNonEnglishExpr(c: Column): Column = {
      // non-ASCII LETTER, matching the driver-side form exactly (plain
      // [^\x00-\x7F] would also flag em dashes, €, °, ...): strip ASCII,
      // then test the remainder for any unicode letter — RE2 (the oracle
      // side) has no char-class intersection, and this form is portable.
      val hasForeignLetter =
        regexp_replace(c, "[\\x00-\\x7F]", "").rlike("\\p{L}")
      val tokens = split(lower(c), "[^\\p{L}]+")
      val foreign = size(array_intersect(tokens, typedlit(ForeignStopwords.toSeq)))
      val english = size(array_intersect(tokens, typedlit(EnglishStopwords.toSeq)))
      val suffixHit = exists(tokens, t =>
        ForeignSuffixes.map(s => t.rlike(s".$s$$")).reduce(_ || _))
      hasForeignLetter || suffixHit || (foreign > 0 && foreign > english)
    }
  }

  /** E1 through the reference's PROMPT plumbing (S8): render the template
    * per column, delegate to a completion function — the LLM seam, a
    * deterministic fake in tests, a remote model in a networked
    * deployment. Response handling mirrors `translate.py:49-52`:
    * trim + uppercase, anything outside the closed vocabulary → UNKNOWN.
    * Sample truncation matches `translate.py:43` (top 10).
    */
  final class PromptedColumnClassifier(
      complete: String => String,
      template: graft.sources.Prompts.PromptTemplate =
        graft.sources.Prompts.fromResource("text_column_classifier"))
    extends ColumnClassifier {
    override def classify(columnName: String, sample: Seq[String]): String = {
      val out = complete(template.render(Map(
        "column_name" -> columnName,
        "sample_values" -> graft.sources.Prompts.sampleValues(sample.take(10)))))
        .trim.toUpperCase
      if (Set("TEXT", "NON-TEXT")(out)) out else "UNKNOWN"
    }
  }

  /** E2 through the prompt plumbing (S8): ONE call labels the whole
    * sample (`translate.py:57-76`), unlike the heuristic's per-value
    * scoring. Empty samples short-circuit to UNKNOWN without a call.
    */
  final class PromptedLanguageDetector(
      complete: String => String,
      template: graft.sources.Prompts.PromptTemplate =
        graft.sources.Prompts.fromResource("detect_language"),
      columnName: String = "values")
    extends LanguageDetector {
    override def isNonEnglish(value: String): Boolean =
      detect(Seq(value)) == "NON-ENGLISH"
    override def detect(sample: Seq[String]): String = {
      val vals = sample.filter(v => v != null && v.nonEmpty)
      if (vals.isEmpty) "UNKNOWN"
      else {
        val out = complete(template.render(Map(
          "column_name" -> columnName,
          "sample_values" -> graft.sources.Prompts.sampleValues(vals.take(10)))))
          .trim.toUpperCase
        if (Set("ENGLISH", "NON-ENGLISH")(out)) out else "UNKNOWN"
      }
    }
  }
}

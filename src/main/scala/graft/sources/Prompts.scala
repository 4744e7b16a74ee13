package graft.sources

import java.nio.charset.StandardCharsets

/** S8: prompt-file source (SURVEY.md §2.1).
  *
  * The reference keeps its LLM prompt templates as text files loaded at
  * pipeline start (`config.py:30-32` → `prompts/<name>.txt`, read at
  * `translate.py:179,196` and `mapper.py:219`) and formats them with named
  * `{placeholders}` (`translate.py:44-47`). The deterministic engines in
  * this library never call an LLM, but the prompt plumbing is part of the
  * reference's API surface — a swapped-in remote implementation needs the
  * same load/render path — so it ships as a first-class source: default
  * templates as classpath resources (this library's own wording, same
  * variables and closed answer vocabularies), overridable from any
  * filesystem path.
  */
object Prompts {

  private val Placeholder = "\\{([A-Za-z_][A-Za-z0-9_]*)\\}".r

  final case class PromptTemplate(text: String) {
    /** Placeholder names (`{snake_case}`, the ChatPromptTemplate style). */
    lazy val variables: Set[String] =
      Placeholder.findAllMatchIn(text).map(_.group(1)).toSet

    /** Strict render: every placeholder must be bound (the reference's
      * `format_messages` raises on missing variables too) and every
      * binding must name a placeholder (catches typos that would
      * otherwise silently ship an unformatted prompt).
      */
    def render(vars: Map[String, String]): String = {
      val missing = variables -- vars.keySet
      require(missing.isEmpty,
        s"unbound prompt variables: ${missing.toSeq.sorted.mkString(", ")}")
      val unknown = vars.keySet -- variables
      require(unknown.isEmpty,
        s"unknown prompt variables: ${unknown.toSeq.sorted.mkString(", ")}")
      vars.foldLeft(text) { case (acc, (k, v)) => acc.replace(s"{$k}", v) }
    }
  }

  /** Load a template from storage (the reference's `open(config.PROMPT_*)`
    * path). Reads through the Hadoop `FileSystem` like the other sources,
    * so prompt overrides can live next to the data (`file:`, `hdfs:`,
    * `s3a:`); a bare local path keeps working via the default scheme.
    */
  def load(path: String): PromptTemplate = {
    val p = new org.apache.hadoop.fs.Path(path)
    Artifacts.withFs(p) { fs =>
      val in = fs.open(p)
      try PromptTemplate(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Shipped default templates: `graft/prompts/<name>.txt` on the
    * classpath (`text_column_classifier`, `detect_language`,
    * `schema_description`).
    */
  def fromResource(name: String): PromptTemplate = {
    val res = s"/graft/prompts/$name.txt"
    val in = Option(getClass.getResourceAsStream(res)).getOrElse(
      throw new IllegalArgumentException(s"no such prompt resource: $res"))
    try PromptTemplate(new String(in.readAllBytes(), StandardCharsets.UTF_8))
    finally in.close()
  }

  /** The reference's sample-list formatting (`translate.py:46`): a leading
    * newline, then one `- ` bullet per value.
    */
  def sampleValues(values: Seq[String]): String =
    "\n- " + values.mkString("\n- ")
}

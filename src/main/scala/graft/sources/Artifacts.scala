package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** JSON artifact checkpoints (SURVEY.md §2.1 S4/S5).
  *
  * The reference materializes every pipeline stage to pretty JSON and
  * reloads it (`preprocess.py:95-110` store with Timestamp→ISO conversion;
  * reload at `translate.py:175-176` etc.) — its only recovery/debugging
  * mechanism. Here the same artifact pattern exists in two scales:
  *   - frame artifacts: `df.write.json` (Spark's JSON writer emits ISO
  *     timestamps natively, matching the reference's conversion) and
  *     `spark.read.json` — splittable, any size;
  *   - map artifacts (the reference's `{col → {orig → translated}}` shapes):
  *     driver-side Jackson, because they are dictionary-sized by
  *     construction and consumed driver-side.
  */
object Artifacts {

  /** S4: checkpoint a frame as JSON (one file per partition; coalesce
    * yourself if a single debuggable file is wanted).
    */
  def store(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** S5: reload a frame artifact (schema re-inferred, as the reference's
    * json.load does).
    */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** S4 for nested map artifacts. */
  def storeMap(m: Map[String, Map[String, String]], path: String): Unit = {
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (k, inner) =>
      val innerNode = node.putObject(k)
      inner.toSeq.sortBy(_._1).foreach { case (ik, iv) => innerNode.put(ik, iv) }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValue(new java.io.File(path), node)
  }

  /** S5 for nested map artifacts (same shape as
    * `cache/translated-map.json`).
    */
  def loadMap(path: String): Map[String, Map[String, String]] = {
    val root = new ObjectMapper().readTree(new java.io.File(path))
    root.properties().asScala.map { e =>
      e.getKey -> e.getValue.properties().asScala
        .map(f => f.getKey -> f.getValue.asText()).toMap
    }.toMap
  }
}

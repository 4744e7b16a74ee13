package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed by
  * per-partition batch operators.
  *
  * The Spark-side contract is the real deliverable here — schema shape,
  * partition-level batching, operator signatures — while the actual codec
  * work is STUBBED behind [[Multimodal.Decoder]] with a deterministic fake
  * (media libraries are unavailable in this environment, and a real
  * decoder drops into the same seam). This mirrors how a production
  * pipeline hosts decode/feature-extract/resize/frame-sample stages: a
  * `mapPartitions` over an iterator of payload batches, so per-partition
  * setup (codec contexts, model weights) amortizes across rows — the Scala
  * analogue of Python's `mapInPandas` batch shape.
  *
  * Scale notes: payloads never shuffle (all stages are map-only
  * projections/partitions); metadata-only plans (schema, counts, byte
  * sizes) prune the binary column away entirely at the parquet scan.
  */
object Multimodal {

  /** Canonical multimodal row schema: opaque payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("format", StringType, nullable = false), // png | wav | mp4 ...
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Decoded frame/sample features: fixed-width vector + shape metadata. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      feature: Array[Float], feature_dim: Int)

  /** The codec seam. Implementations must be deterministic per payload. */
  trait Decoder extends Serializable {
    /** Decode one payload into a fixed-width feature vector. */
    def decode(kind: String, format: String, payload: Array[Byte]): Array[Float]
    def featureDim: Int
  }

  /** Deterministic fake standing in for a real image/audio decoder:
    * features are byte-histogram statistics of the payload (stable across
    * runs and machines; a real codec — javacv, a JNI libav binding —
    * replaces this object only).
    */
  final class StubDecoder(val featureDim: Int = 8) extends Decoder {
    override def decode(kind: String, format: String, payload: Array[Byte]): Array[Float] = {
      val f = new Array[Float](featureDim)
      if (payload != null && payload.nonEmpty) {
        var i = 0
        while (i < payload.length) {
          f(math.floorMod(payload(i).toInt, featureDim)) += 1.0f
          i += 1
        }
        var k = 0
        while (k < featureDim) { f(k) /= payload.length.toFloat; k += 1 }
      }
      f
    }
  }

  /** Build a deterministic synthetic media table from the driver's
    * documents table (payload = utf-8 text bytes posing as media) — the
    * plumbing fixture used by queries and tests.
    */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.t(spark, dir, "documents")
    d.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      element_at(typedlit(Seq("png", "wav", "mp4")),
        (col("doc_id") % 3).cast("int") + 1).as("format"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, (col("n_chars") % 1920).cast("int")).as("width"),
      when(col("doc_id") % 3 === 0, (col("n_chars") % 1080).cast("int")).as("height"),
      when(col("doc_id") % 3 =!= 0, col("n_chars") * 10).as("duration_ms"))
  }

  /** Feature extraction: mapPartitions batch over payloads — decoder
    * instantiated once per partition, payload column pruned from the
    * output.
    */
  def extractFeatures(media: DataFrame, decoder: Decoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val pruned = media.select("media_id", "kind", "format", "payload")
    pruned.mapPartitions { rows =>
      // per-partition setup happens here (codec contexts etc.)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        MediaFeatures(
          r.getAs[Long]("media_id"), r.getAs[String]("kind"),
          if (payload == null) 0L else payload.length.toLong,
          decoder.decode(r.getAs[String]("kind"), r.getAs[String]("format"), payload),
          decoder.featureDim)
      }
    }
  }

  /** Metadata-only profile: never touches the payload bytes — the parquet
    * scan prunes the binary column (asserted in MultimodalSpec).
    */
  def metadataProfile(media: DataFrame): DataFrame =
    media.groupBy("kind", "format")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("duration_ms"), lit(0L))).as("total_duration_ms"))
      .orderBy("kind", "format")

  /** Oracle query: metadata profile over the synthetic media table. */
  def mediaProfile(spark: SparkSession, dir: String): DataFrame =
    metadataProfile(syntheticMedia(spark, dir))

  /** Oracle query: feature extraction through the stub decoder, aggregated
    * per kind (feature vectors summarized so the oracle can recompute the
    * byte-histogram semantics in SQL).
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    extractFeatures(syntheticMedia(spark, dir), new StubDecoder(8))
      .groupBy($"kind")
      .agg(count(lit(1)).as("n"),
        round(sum(element_at($"feature", 1)).cast("double"), 4).as("f0_sum"),
        sum($"n_bytes").as("total_bytes"))
      .orderBy($"kind")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_profile" -> mediaProfile,
    "mm2_media_features" -> mediaFeatures
  )

  val oracle: Map[String, String] = Map(
    "mm1_media_profile" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN n_chars * 10 ELSE 0 END) AS BIGINT) AS total_duration_ms
        |FROM documents
        |GROUP BY 1, 2
        |ORDER BY kind, format""".stripMargin
    // mm2_media_features: rows-only (float32 histogram accumulation order
    // inside the stub decoder is not replicable in DuckDB SQL); semantics
    // pinned by MultimodalSpec on inline payloads instead.
  )
}

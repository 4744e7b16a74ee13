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
    * features are byte-histogram COUNTS of the payload (stable across runs
    * and machines; a real codec — javacv, a JNI libav binding — replaces
    * this object only). Counts are exact integers (a float is exact up to
    * 2^24), so any normalization happens in double at the aggregation —
    * which is what makes the mm2 gate SQL-replicable: a float32
    * frequency-histogram's accumulation order is engine-dependent, integer
    * counts are not.
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
      // Payload bytes are the ASCII-sanitized text (one byte per char by
      // construction), so byte-level stub features are recomputable from
      // the text column by any SQL engine — the driver corpus is pure
      // ASCII anyway (verified), the strip just pins the invariant.
      encode(regexp_replace(col("text"), "[^\\x20-\\x7E]", ""), "UTF-8").as("payload"),
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
    * per kind. Feature-0 counts sum exactly (integers), and the normalized
    * share is ONE double division per output row at the very end — the
    * order-insensitive arithmetic that lets DuckDB recompute the
    * byte-histogram semantics bit-for-bit.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    extractFeatures(syntheticMedia(spark, dir), new StubDecoder(8))
      .groupBy($"kind")
      .agg(count(lit(1)).as("n"),
        sum(element_at($"feature", 1).cast("long")).as("f0_total"),
        sum($"n_bytes").as("total_bytes"))
      .select($"kind", $"n", $"f0_total", $"total_bytes",
        round($"f0_total".cast("double") / $"total_bytes", 6).as("f0_share"))
      .orderBy($"kind")
  }

  /** Fixed-size frame window for [[frameSample]]. A real video pipeline
    * samples keyframes via the codec; the stub samples fixed-width byte
    * windows — the PLUMBING under test is the 1→N generator shape.
    */
  val FrameBytes = 256

  /** Frame sampling: each video payload explodes into ceil(n/256)-many
    * fixed-width byte windows — the canonical one-row-to-many-frames stage
    * of a video pipeline, map-only (explode, no shuffle), with the payload
    * pruned from the output in favor of per-frame size + fingerprint.
    * Because the synthetic payload is ASCII text bytes, DuckDB recomputes
    * the identical frames (and md5 fingerprints) from character substrings,
    * making the generator fully oracle-checked.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val v = syntheticMedia(spark, dir)
      .filter(col("kind") === "video")
      .select(col("media_id"), col("payload"), length(col("payload")).cast("long").as("nb"))
      .filter(col("nb") > 0)
    v.select(col("media_id"), col("payload"),
        explode(sequence(lit(0L), expr(s"(nb - 1) div $FrameBytes"))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(payload, cast(frame_idx * $FrameBytes + 1 as int), $FrameBytes)").as("frame"))
      .select(col("media_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_fp"))
      .orderBy("media_id", "frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_profile" -> mediaProfile,
    "mm2_media_features" -> mediaFeatures,
    "mm3_frame_sample" -> frameSample
  )

  val oracle: Map[String, String] = Map(
    "mm1_media_profile" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN n_chars * 10 ELSE 0 END) AS BIGINT) AS total_duration_ms
        |FROM documents
        |GROUP BY 1, 2
        |ORDER BY kind, format""".stripMargin,
    // The stub decoder's byte-histogram counts, recomputed from the text
    // column: the ASCII-sanitized payload has one byte per character, so
    // feature bucket 0 = count of characters with codepoint % 8 = 0.
    "mm2_media_features" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    regexp_replace(text, '[^\x20-\x7E]', '', 'g') AS st
        |  FROM documents),
        | h AS (
        |  SELECT doc_id, kind, length(st) AS nb,
        |    len(list_filter(range(1, length(st) + 1), i -> ord(st[i]) % 8 = 0)) AS f0
        |  FROM s)
        |SELECT kind, count(*) AS n, CAST(sum(f0) AS BIGINT) AS f0_total,
        |  CAST(sum(nb) AS BIGINT) AS total_bytes,
        |  round(CAST(sum(f0) AS DOUBLE) / sum(nb), 6) AS f0_share
        |FROM h
        |GROUP BY kind
        |ORDER BY kind""".stripMargin,
    // Frames recomputed from the text column: the ASCII-sanitized payload
    // is one byte per character, so a byte window == a character substring
    // and the md5 fingerprints agree byte-for-byte.
    "mm3_frame_sample" ->
      """WITH s AS (
        |  SELECT doc_id AS media_id,
        |    regexp_replace(text, '[^\x20-\x7E]', '', 'g') AS st
        |  FROM documents WHERE doc_id % 3 = 2),
        | f AS (SELECT media_id, st, length(st) AS nb FROM s WHERE length(st) > 0),
        | fr AS (SELECT media_id, st,
        |   unnest(range(0, (nb - 1) // 256 + 1)) AS frame_idx FROM f)
        |SELECT media_id, frame_idx,
        |  CAST(length(substr(st, CAST(frame_idx * 256 + 1 AS BIGINT), 256)) AS BIGINT) AS frame_bytes,
        |  md5(substr(st, CAST(frame_idx * 256 + 1 AS BIGINT), 256)) AS frame_fp
        |FROM fr
        |ORDER BY media_id, frame_idx""".stripMargin
  )
}

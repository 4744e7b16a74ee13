package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodecs, Multimodal}
import graft.operators.MediaCodecs.{Pnm, Wav}
import graft.operators.Multimodal.MediaDecoder

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  // ---- PNM codec -----------------------------------------------------

  test("P6 parser: header with comment, pixels byte-for-byte") {
    val pixels = (0 until 12).map(_.toByte).toArray
    val img = Pnm.parse(ascii("P6\n# planted comment\n2 2\n255\n") ++ pixels)
    assert(img.magic == "P6")
    assert(img.width == 2 && img.height == 2)
    assert(img.maxVal == 255 && img.channels == 3)
    assert(img.pixels.toSeq == pixels.toSeq) // exact raster recovery
  }

  test("P5 parser: grayscale, space-separated header, maxval < 255") {
    val img = Pnm.parse(ascii("P5 3 1 17\n") ++ Array[Byte](5, 9, 13))
    assert(img.magic == "P5" && img.channels == 1)
    assert(img.width == 3 && img.height == 1 && img.maxVal == 17)
    assert(img.pixels.toSeq == Seq[Byte](5, 9, 13))
  }

  test("PNM parser rejects malformed payloads loudly") {
    // bad magic
    intercept[IllegalArgumentException](Pnm.parse(ascii("P7\n1 1\n255\n") ++ Array[Byte](1)))
    // truncated raster: 2x2 RGB needs 12 bytes, give 5
    intercept[IllegalArgumentException](
      Pnm.parse(ascii("P6\n2 2\n255\n") ++ Array[Byte](1, 2, 3, 4, 5)))
    // 2-byte-sample maxval unsupported, must not be misread as 1-byte
    intercept[IllegalArgumentException](
      Pnm.parse(ascii("P6\n1 1\n65535\n") ++ Array.fill[Byte](6)(0)))
    // trailing garbage after a single-image parse
    intercept[IllegalArgumentException](
      Pnm.parse(ascii("P6\n1 1\n255\n") ++ Array[Byte](1, 2, 3, 4)))
    // truncated header
    intercept[IllegalArgumentException](Pnm.parse(ascii("P6\n2 ")))
  }

  test("parseAll walks concatenated frames and zero-length payloads") {
    val f0 = ascii("P6\n1 2\n255\n") ++ Array[Byte](1, 2, 3, 4, 5, 6)
    val f1 = ascii("P6\n2 1\n255\n") ++ Array[Byte](7, 8, 9, 10, 11, 12)
    val frames = Pnm.parseAll(f0 ++ f1)
    assert(frames.length == 2)
    assert(frames(0).pixels.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    assert(frames(1).width == 2 && frames(1).height == 1)
    assert(frames(1).pixels.toSeq == Seq[Byte](7, 8, 9, 10, 11, 12))
    assert(Pnm.parseAll(Array.emptyByteArray).isEmpty)
    assert(Pnm.parseAll(null).isEmpty)
  }

  // ---- WAV codec -----------------------------------------------------

  /** Hand-build a RIFF/WAVE payload with java.nio (independent of the
    * operator's own header builder): optional unknown odd-sized chunk
    * before fmt/data to exercise chunk skipping + pad-byte handling.
    */
  private def wavBytes(data: Array[Byte], oddChunk: Boolean): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(512)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(ascii("RIFF")).putInt(0).put(ascii("WAVE")) // size patched below
    if (oddChunk) { // 3-byte unknown chunk -> 1 pad byte per RIFF rule
      bb.put(ascii("junk")).putInt(3).put(Array[Byte](1, 2, 3)).put(0.toByte)
    }
    bb.put(ascii("fmt ")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    bb.put(ascii("data")).putInt(data.length).put(data)
    if (data.length % 2 == 1) bb.put(0.toByte)
    val out = java.util.Arrays.copyOf(bb.array(), bb.position())
    val size = out.length - 8
    out(4) = (size & 0xff).toByte
    out(5) = ((size >> 8) & 0xff).toByte
    out(6) = ((size >> 16) & 0xff).toByte
    out(7) = ((size >> 24) & 0xff).toByte
    out
  }

  test("WAV parser: chunk walk, unknown odd chunk skipped, data exact") {
    val data = Array[Byte](10, 20, 30, 40, 50)
    val w = Wav.parse(wavBytes(data, oddChunk = true))
    assert(w.audioFormat == 1 && w.channels == 1)
    assert(w.sampleRate == 8000 && w.bitsPerSample == 8)
    assert(w.data.toSeq == data.toSeq)
    assert(w.nSamples == 5L)
    assert(w.durationMs == 5000L / 8000L)
  }

  test("WAV parser rejects malformed payloads loudly") {
    intercept[IllegalArgumentException](Wav.parse(ascii("RIFX    WAVE")))
    intercept[IllegalArgumentException](Wav.parse(ascii("RIF")))
    // fmt present but no data chunk
    val noData = wavBytes(Array.emptyByteArray, oddChunk = false)
      .dropRight(8) // strip the empty data chunk header
    intercept[IllegalArgumentException](Wav.parse(noData))
  }

  // ---- MediaDecoder --------------------------------------------------

  test("decoder histograms SAMPLE bytes only — container excluded") {
    val d = new MediaDecoder(8)
    // 'P' = 80 and '6' = 54 would pollute buckets 0 and 6 if the header
    // leaked into the histogram; pixels are six bytes all = 8 -> bucket 0
    val img = ascii("P6\n2 1\n255\n") ++ Array.fill[Byte](6)(8)
    val f = d.decode("image", "ppm", img)
    assert(f(0) == 6.0f && f.sum == 6.0f)
    // WAV: data bytes 1,1,2 -> bucket1=2, bucket2=1; header excluded
    val fw = d.decode("audio", "wav", wavBytes(Array[Byte](1, 1, 2), oddChunk = false))
    assert(fw(1) == 2.0f && fw(2) == 1.0f && fw.sum == 3.0f)
    assert(d.decodeSamples("video", "ppms", Array.emptyByteArray).isEmpty)
    assert(d.decodeSamples("video", "ppms", null).isEmpty)
    intercept[IllegalArgumentException](d.decodeSamples("image", "gif", Array[Byte](1)))
  }

  // ---- planted media table round-trips -------------------------------

  test("planted image payloads are real PPMs agreeing with metadata") {
    val rows = Multimodal.syntheticMedia(spark, sf)
      .filter(org.apache.spark.sql.functions.col("kind") === "image")
      .select("media_id", "payload", "width", "height").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val img = Pnm.parse(r.getAs[Array[Byte]]("payload"))
      assert(img.width == r.getAs[Int]("width"), s"media ${r.get(0)}")
      assert(img.height == r.getAs[Int]("height"), s"media ${r.get(0)}")
      assert(img.channels == 3 && img.maxVal == 255)
      assert(img.pixels.length == 3 * img.width * img.height)
    }
  }

  test("planted audio payloads are real WAVs agreeing with metadata") {
    val rows = Multimodal.syntheticMedia(spark, sf)
      .filter(org.apache.spark.sql.functions.col("kind") === "audio")
      .select("media_id", "payload", "duration_ms").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      val w = Wav.parse(payload)
      assert(w.audioFormat == 1 && w.channels == 1 && w.sampleRate == 8000)
      assert(w.bitsPerSample == 8)
      assert(payload.length == 44 + w.data.length) // canonical header
      assert(w.durationMs == r.getAs[Long]("duration_ms"))
      // PCM samples are the ASCII text bytes: all printable
      assert(w.data.forall(b => b >= 0x20 && b <= 0x7e))
    }
  }

  test("planted video payloads are concatenated 16x4 P6 frames") {
    val rows = Multimodal.syntheticMedia(spark, sf)
      .filter(org.apache.spark.sql.functions.col("kind") === "video")
      .select("media_id", "payload", "duration_ms").collect()
    assert(rows.nonEmpty)
    var sawFrames = false
    rows.foreach { r =>
      val frames = Pnm.parseAll(r.getAs[Array[Byte]]("payload"))
      assert(frames.length * 40L == r.getAs[Long]("duration_ms"))
      frames.foreach { f =>
        assert(f.width == 16 && f.height == 4 && f.channels == 3)
      }
      sawFrames |= frames.nonEmpty
    }
    assert(sawFrames)
  }

  test("feature extraction preserves ids, drops payload, fixed dim") {
    val media = Multimodal.syntheticMedia(spark, sf)
    val feats = Multimodal.extractFeatures(media, new MediaDecoder(8))
    assert(!feats.columns.contains("payload"))
    val rows = feats.collect()
    assert(rows.length == media.count())
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(_.feature_dim == 8))
    // container framing is strictly positive for image/audio payloads
    assert(rows.forall(r => r.n_bytes >= r.n_decoded))
    assert(rows.filter(r => r.kind != "video").forall(r => r.n_bytes > r.n_decoded))
    // histogram mass equals the decoded byte count exactly
    assert(rows.forall(r => r.feature.sum.toLong == r.n_decoded))
  }

  test("media schema: payload binary, typed metadata") {
    val media = Multimodal.syntheticMedia(spark, sf)
    val types = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("payload") == "binary")
    assert(types("media_id") == "long")
    assert(types("duration_ms") == "long")
    assert(types("width") == "integer" && types("height") == "integer")
  }

  test("metadata profile never reads the payload column") {
    val prof = Multimodal.metadataProfile(Multimodal.syntheticMedia(spark, sf))
    val scan = prof.queryExecution.executedPlan.toString
    assert(!scan.contains("payload"), scan.take(1500))
    assert(prof.collect().nonEmpty)
  }

  test("audioStats reads fmt fields out of the RIFF chunks; duration matches metadata") {
    import org.apache.spark.sql.functions.col
    val meta = Multimodal.syntheticMedia(spark, sf)
      .filter(col("kind") === "audio")
      .select(col("media_id"), col("duration_ms")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stats = Multimodal.audioStats(spark, sf).collect()
    assert(stats.nonEmpty && stats.length == meta.size)
    stats.foreach { r =>
      assert(r.getAs[Int]("audio_format") == 1) // PCM, parsed not assumed
      assert(r.getAs[Int]("channels") == 1 && r.getAs[Int]("sample_rate") == 8000)
      assert(r.getAs[Int]("bits_per_sample") == 8)
      // header-derived duration agrees with the planted metadata column
      assert(r.getAs[Long]("duration_ms") == meta(r.getAs[Long]("media_id")))
      // 8-bit ASCII payload: mean in [32,126], rms deviation bounded by 128
      val mean = r.getAs[Double]("mean_sample")
      assert(mean >= 32.0 && mean <= 126.0, mean)
      assert(r.getAs[Double]("rms_dev") >= 0.0 && r.getAs[Double]("rms_dev") < 128.0)
    }
  }

  test("imageStats reads dims out of the binary header") {
    val stats = Multimodal.imageStats(spark, sf).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val w = r.getAs[Int]("width")
      assert(w >= 4 && w <= 16) // 4 + doc_id % 13
      assert(r.getAs[Int]("channels") == 3 && r.getAs[Int]("maxval") == 255)
      assert(r.getAs[Long]("n_sample_bytes") == 3L * w * r.getAs[Int]("height"))
    }
  }

  test("resize picks the even-stride pixels; odd dims keep the last row/col") {
    // 3x3 raster with pixel (r,c) = value 10r + c per channel: the 2x2
    // downscale must pick exactly (0,0) (0,2) (2,0) (2,2).
    val pixels = (for (r <- 0 until 3; c <- 0 until 3; _ <- 0 until 3)
      yield (10 * r + c).toByte).toArray
    val payload = ascii("P6\n3 3\n255\n") ++ pixels
    import spark.implicits._
    val media = Seq((5L, "image", "ppm", payload))
      .toDF("media_id", "kind", "format", "payload")
      .withColumn("width", org.apache.spark.sql.functions.lit(3))
      .withColumn("height", org.apache.spark.sql.functions.lit(3))
      .withColumn("duration_ms",
        org.apache.spark.sql.functions.lit(null).cast("long"))
    // run the mapPartitions core by substituting the planted frame
    val r = Multimodal.resizeForTest(media, spark).collect().head
    assert(r.getAs[Int]("r_width") == 2 && r.getAs[Int]("r_height") == 2)
    assert(r.getAs[Long]("n_resized_bytes") == 12L)
    // picked values: 0,2,20,22 each x3 channels -> sum 132
    val expected = Seq(0, 2, 20, 22).map(_ * 3).sum
    assert(r.getAs[Double]("mean_byte") == expected / 12.0)
  }

  test("keyframes: repeated frame is not a keyframe, a hard cut is") {
    import spark.implicits._
    // Planted 3-frame stream A, A, B: frame 0 anchors (always keyframe),
    // frame 1 repeats A exactly (diff 0 → not a keyframe), frame 2 cuts
    // hard (every byte moves by 60 → diff 60 > threshold → keyframe).
    val a = Array.tabulate(192)(i => (32 + i % 64).toByte)
    val b = Array.tabulate(192)(i => (92 + i % 64).toByte)
    val hdr = ascii("P6\n16 4\n255\n")
    val payload = hdr ++ a ++ hdr ++ a ++ hdr ++ b
    val media = Seq((7L, "video", "ppms", payload))
      .toDF("media_id", "kind", "format", "payload")
    val rows = Multimodal.keyframesOf(media, spark).collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Boolean]("is_keyframe") && rows(0).isNullAt(2))
    assert(rows(1).getAs[Double]("mean_abs_diff") == 0.0)
    assert(!rows(1).getAs[Boolean]("is_keyframe"))
    assert(rows(2).getAs[Double]("mean_abs_diff") == 60.0)
    assert(rows(2).getAs[Boolean]("is_keyframe"))
  }

  test("mm8 dHash: clones pair at 0, one-pixel tweak at 1, inverse drops") {
    import spark.implicits._
    // 8x8 horizontal gradient: every right neighbour is brighter -> all
    // 56 comparison bits set. Its inverse clears them all (hamming 56).
    def img(px: (Int, Int) => Int): Array[Byte] =
      ascii("P6\n8 8\n255\n") ++
        (for (r <- 0 until 8; c <- 0 until 8; _ <- 0 until 3)
          yield px(r, c).toByte).toArray
    val grad = img((_, c) => c * 30)
    val clone = img((_, c) => c * 30)
    val tweak = img((r, c) => if (r == 0 && c == 1) 0 else c * 30)
    val inverse = img((_, c) => (7 - c) * 30)
    val media = Seq(
      (1L, "image", grad), (2L, "image", clone),
      (3L, "image", tweak), (4L, "image", inverse),
      (5L, "audio", grad) // wrong kind: must be ignored
    ).toDF("media_id", "kind", "payload")
    val got = Multimodal.imageNearDupsOf(media, spark).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // pairs: (1,2) identical, (1,3)/(2,3) one flipped comparison bit
    assert(got == Map((1L, 2L) -> 0L, (1L, 3L) -> 1L, (2L, 3L) -> 1L), got)
  }

  test("mm10 patchify: 2x2 grid matches the hand-computed patches, edge row truncated") {
    // 4x3 raster, pixel (y,x) = 10y + x on all 3 channels: patch (0,0)
    // holds {0,1,10,11} (mean 5.5, max 11), patch (0,1) {2,3,12,13}
    // (mean 7.5, max 13); the odd third row (y=2) is truncated.
    val pixels = (for (y <- 0 until 3; x <- 0 until 4; _ <- 0 until 3)
      yield (10 * y + x).toByte).toArray
    val payload = ascii("P6\n4 3\n255\n") ++ pixels
    import spark.implicits._
    val media = Seq((9L, "image", payload))
      .toDF("media_id", "kind", "payload")
    val got = Multimodal.patchifyOf(media, spark).collect()
      .map(r => (r.getAs[Long]("patch_row"), r.getAs[Long]("patch_col")) ->
        (r.getAs[Long]("n_bytes"), r.getAs[Double]("mean_byte"),
          r.getAs[Long]("max_byte"))).toMap
    assert(got == Map(
      (0L, 0L) -> ((12L, 5.5, 11L)),
      (0L, 1L) -> ((12L, 7.5, 13L))), got)
  }

  test("mm11 VAD: loud-quiet-loud splits at the quiet island; all-quiet emits nothing") {
    import spark.implicits._
    // Frame = 80 samples. Byte 32 holds rms |32-128| = 96 > 45 (loud);
    // byte 128 holds rms 0 (quiet). Clip 1: frames [loud, loud, quiet,
    // loud] -> segments (0..1) and (3..3). Clip 2: two quiet frames plus
    // a 40-sample loud TAIL that a full-frame walk must truncate -> no
    // rows at all.
    val loud = Array.fill[Byte](80)(32)
    val quiet = Array.fill[Byte](80)(128.toByte)
    val clip1 = loud ++ loud ++ quiet ++ loud
    val clip2 = quiet ++ quiet ++ Array.fill[Byte](40)(32)
    val media = Seq(
      (1L, "audio", wavBytes(clip1, oddChunk = false)),
      (2L, "audio", wavBytes(clip2, oddChunk = false)))
      .toDF("media_id", "kind", "payload")
    val got = Multimodal.vadSegmentsOf(media, spark).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("seg_idx")) ->
        (r.getAs[Long]("start_frame"), r.getAs[Long]("end_frame"),
          r.getAs[Long]("n_frames"), r.getAs[Long]("start_ms"),
          r.getAs[Long]("end_ms"), r.getAs[Double]("mean_rms"))).toMap
    assert(got == Map(
      (1L, 1L) -> ((0L, 1L, 2L, 0L, 20L, 96.0)),
      (1L, 2L) -> ((3L, 3L, 1L, 30L, 40L, 96.0))), got)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.StubDecoder

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("stub decoder is deterministic, integer-exact counts") {
    val d = new StubDecoder(8)
    val payload = "hello multimodal world".getBytes("UTF-8")
    val a = d.decode("image", "png", payload)
    val b = d.decode("image", "png", payload)
    assert(a.toSeq == b.toSeq)
    assert(a.sum == payload.length.toFloat) // histogram of counts, not freqs
    assert(a.forall(v => v == math.rint(v))) // every bucket an exact integer
    // 'h'=104 and 'p'=112 are = 0 mod 8: bucket 0 counts them
    assert(a(0) == payload.count(c => math.floorMod(c.toInt, 8) == 0).toFloat)
    assert(d.decode("audio", "wav", Array.emptyByteArray).forall(_ == 0f))
    assert(d.decode("audio", "wav", null).forall(_ == 0f))
  }

  test("feature extraction preserves ids, drops payload, fixed dim") {
    val media = Multimodal.syntheticMedia(spark, sf)
    val feats = Multimodal.extractFeatures(media, new StubDecoder(8))
    assert(!feats.columns.contains("payload"))
    val rows = feats.collect()
    assert(rows.length == media.count())
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(_.feature_dim == 8))
    assert(rows.forall(r => r.n_bytes > 0))
  }

  test("media schema: payload binary, typed metadata") {
    val media = Multimodal.syntheticMedia(spark, sf)
    val types = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("payload") == "binary")
    assert(types("media_id") == "long")
    assert(types("duration_ms") == "long")
  }

  test("metadata profile never reads the payload column") {
    val prof = Multimodal.metadataProfile(Multimodal.syntheticMedia(spark, sf))
    val scan = prof.queryExecution.executedPlan.toString
    assert(!scan.contains("payload"), scan.take(1500))
    assert(prof.collect().nonEmpty)
  }
}

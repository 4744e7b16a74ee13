package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.StubDecoder

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("stub decoder is deterministic and normalized") {
    val d = new StubDecoder(8)
    val payload = "hello multimodal world".getBytes("UTF-8")
    val a = d.decode("image", "png", payload)
    val b = d.decode("image", "png", payload)
    assert(a.toSeq == b.toSeq)
    assert(math.abs(a.sum - 1.0f) < 1e-5f) // histogram normalized by length
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

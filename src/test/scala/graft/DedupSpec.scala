package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dedup operators on the sf0.001 corpus: structural invariants that hold
  * regardless of data (the oracle pins exact values at sf0.01).
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("exact dedup collapses the planted duplicate of every document") {
    val out = graft.operators.Dedup.exactDedup(spark, sf)
    val rows = out.collect()
    // corpus is dup-free, so after unioning an id-shifted copy every group
    // has exactly 2 members and the canonical id is the original
    assert(rows.forall(_.getAs[Long]("n_copies") == 2L))
    assert(rows.forall(_.getAs[Long]("canonical_doc_id") < 1000000L))
    assert(rows.length == 500)
  }

  test("jaccard pairs: symmetric-free (a<b), threshold respected") {
    val rows = graft.operators.Dedup.jaccardPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.6))
  }

  test("minhash LSH candidates verify against true shingle jaccard") {
    val rows = graft.operators.Dedup.minhashLsh(spark, sf).collect()
    assert(rows.forall(_.getAs[Double]("shingle_jaccard") >= 0.7))
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("simhash: aggregated pair counts at low hamming distance") {
    val rows = graft.operators.Dedup.simhash(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("hamming") <= 8L))
    // hamming values are distinct (grouped)
    val hs = rows.map(_.getAs[Long]("hamming"))
    assert(hs.toSet.size == hs.length)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Linkage

/** The er1 gate hashes the full fixture run; these plants exercise the
  * decision boundary cases the aggregate view cannot isolate.
  */
class LinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("linkage matches the corrupted variant, not neighbours or twins") {
    import spark.implicits._
    // Entity 1: clean + 1-char-corrupted variant, same nation + balance
    //   → MUST match (banding must route it despite the corrupted band).
    // Record 6 is entity 1's near-key neighbour: name 1 edit away but a
    //   different balance → candidate, MUST NOT match.
    // Record 8 is a same-name twin in another nation → blocking must
    //   never even pair it (nation is part of every block key).
    // Record 9 shares entity 3's balance but a far name → candidate via
    //   no band (name differs in every band) or fails edit distance.
    val recs = Seq(
      (2L, "Customer#000000042", 7L, 100.50),
      (3L, "Customer#00000x042", 7L, 100.50), // corrupt band 1 (pos 15)
      (6L, "Customer#000000043", 7L, 999.99), // neighbour, diff balance
      (8L, "Customer#000000042", 3L, 100.50), // other nation
      (9L, "Customer#777777042", 7L, 100.50)  // far name, same balance
    ).toDF("rec_id", "name", "nation", "acctbal")
    val got = Linkage.linkedPairs(recs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))
    assert(got.toSeq == Seq((2L, 3L, 1)))
  }

  test("every corruption position routes through a surviving band") {
    import spark.implicits._
    // One entity per digit position 10..18: the variant corrupts that
    // position; all 9 pairs must link — i.e. no corruption position can
    // escape all three block keys.
    val rows = (0 until 9).flatMap { p =>
      val key = 100L + p
      val name = f"Customer#$key%09d"
      val corrupted = name.updated(9 + p, 'x')
      // distinct balance per entity: neighbours are 1 edit apart by
      // construction, and the strong-field disagreement is what keeps
      // them unlinked (the driver-fixture premise)
      val bal = 50.0 + p
      Seq((key * 2, name, 1L, bal), (key * 2 + 1, corrupted, 1L, bal))
    }
    val got = Linkage.linkedPairs(rows.toDF("rec_id", "name", "nation", "acctbal"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 9)
    assert(got.forall { case (a, b) => b == a + 1 })
  }

  test("er2 golden records: one entity per customer, variants absorbed") {
    import spark.implicits._
    val recs = Seq(
      (2L, "Customer#000000042", 7L, 100.50),
      (3L, "Customer#00000x042", 7L, 100.50), // variant of entity 2
      (6L, "Customer#000000043", 7L, 999.99), // singleton
      (8L, "Customer#000000042", 3L, 100.50)  // other-nation twin, singleton
    ).toDF("rec_id", "name", "nation", "acctbal")
    val got = graft.operators.Linkage.goldenRecords(recs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got.keySet == Set(2L, 6L, 8L))
    assert(got(2L) == ((2L, "Customer#000000042"))) // golden = clean twin
    assert(got(6L) == ((1L, "Customer#000000043")))
    assert(got(8L) == ((1L, "Customer#000000042")))
  }

  test("er1 on the driver corpus links every planted variant exactly once") {
    val got = Linkage.er1RecordLinkage(spark, "/root/testdata/sf0.001")
      .collect()
    // every third customer has a variant; each variant links to exactly
    // its clean twin (rec ids 2k, 2k+1) unless a balance collision with
    // a 1-edit neighbour adds a pair — names 1 edit apart with equal
    // balances are vanishingly rare in the fixture, so the pair set is
    // exactly the planted twins.
    assert(got.nonEmpty)
    val twins = got.filter(r => r.getLong(1) == r.getLong(0) + 1)
    assert(twins.length == got.length, "only planted twins should link")
    assert(got.forall(_.getInt(4) == 1))
  }
}

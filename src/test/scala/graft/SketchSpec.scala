package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Approximate-sketch surface (SURVEY §2.5 aggregations; 100 TB tooling):
  * HLL distinct counts and quantile sketches must land within documented
  * error of the exact answers. Sketch internals are engine-specific (no
  * DuckDB oracle can hash-match them) — the accuracy bound IS the
  * contract, pinned here against exact computations on the same data.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("equiDepthApprox tracks exact bucket depths without a global sort") {
    val ev = Tables.t(spark, sf, "events")
    val exact = graft.operators.Relational.equiDepthExact(ev, "value", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = graft.operators.Relational.equiDepthApprox(ev, "value", 8)
    val got = approx.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (1L to 8L).toSet, got)
    val total = exact.values.sum
    // sketch boundaries shift bucket edges slightly; depths stay near n/8
    (1L to 8L).foreach { b =>
      assert(math.abs(got(b) - exact(b)).toDouble / (total / 8) < 0.10,
        s"bucket $b: approx=${got(b)} exact=${exact(b)}")
    }
    // the corpus is never globally sorted: boundary sketch + scan-local
    // assignment means NO Window operator anywhere in the physical plan
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("drift3 sketch-cut PSI tracks drift1's exact readout without a global sort") {
    import org.apache.spark.sql.functions.{col, unix_millis}
    val exact = graft.operators.Stats.psiDrift(spark, sf)
      .collect().map(_.getAs[Double]("psi_term")).sum
    val src = Tables.t(spark, sf, "events")
      .select(unix_millis(col("ts")).as("ts_ms"), col("value"))
    val sketch = graft.operators.Stats.psiDriftSketchFull(src)
    val got = sketch.collect()
    val sketchPsi = got.map(_.getAs[Double]("psi_term")).sum
    // both monitors look at the SAME stable corpus: total PSI must agree
    // in the only way a threshold alert cares about — small, finite, and
    // close (sketch cut wobble moves boundary-adjacent mass only)
    assert(!sketchPsi.isNaN && !sketchPsi.isInfinite)
    assert(math.abs(sketchPsi - exact) < 0.02,
      s"sketch=$sketchPsi exact=$exact")
    assert(got.map(_.getAs[Long]("bucket")).toSet == (1L to 10L).toSet)
    // the 100 TB claim: no global ntile — no Window operator in the plan
    val plan = sketch.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    // the r18 GATED shape: every bucket present, totals exact, the KLL
    // depth bound holding in-query (the oracle compares against TRUE)
    val gated = graft.operators.Stats.psiDriftSketch(spark, sf).collect()
    assert(gated.map(_.getAs[Long]("bucket")).toSet == (1L to 10L).toSet)
    assert(gated.forall(_.getAs[Boolean]("ref_depth_ok")), gated.mkString("\n"))
    val gatedPlan = graft.operators.Stats.psiDriftSketch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!gatedPlan.contains("Window"), gatedPlan.take(2000))
  }

  test("approx_count_distinct (HLL) lands within 5% of exact on order keys") {
    val l = Tables.t(spark, sf, "lineitem")
    val exact = l.select(countDistinct(col("l_orderkey")).as("n"))
      .collect()(0).getLong(0)
    val approx = l.select(approx_count_distinct(col("l_orderkey"), 0.02).as("n"))
      .collect()(0).getLong(0)
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("profileApprox bounds distinct error and plans without Expand") {
    import spark.implicits._
    // known cardinalities: k has exactly 137 distincts, id 20000, s 500
    val src = spark.range(20000)
      .select(col("id"), (col("id") % 137).as("k"),
        concat(lit("v"), col("id") % 500).as("s"),
        when(col("id") % 10 === 0, lit(null).cast("double"))
          .otherwise(col("id").cast("double") / 7).as("d"))
    val prof = graft.operators.Relational.profileApprox(
      src, Seq("id", "k", "d"), Seq("s"))
    val rows = prof.collect().map(r =>
      r.getAs[String]("column_name") ->
        (r.getAs[Long]("n_distinct"), r.getAs[Long]("n_nulls"))).toMap
    val expected = Map("id" -> 20000L, "k" -> 137L, "s" -> 500L, "d" -> 18000L)
    expected.foreach { case (c, exact) =>
      val got = rows(c)._1
      assert(math.abs(got - exact).toDouble / exact < 0.05,
        s"$c: approx=$got exact=$exact")
    }
    // null accounting stays exact — only the distinct count is sketched
    assert(rows("d")._2 == 2000L)
    // the scale claim: ONE aggregate scan, no Expand row multiplication
    val plan = prof.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(2000))
    // ...which the exact profile (prof1's shape) necessarily pays
    val exactPlan = graft.operators.Relational
      .prof1ColumnProfile(spark, sf).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), exactPlan.take(2000))
  }

  test("prof7 gate: exact columns match prof1, nd_ok holds (r19 partial oracle)") {
    // The gated sketch profile must agree with the exact profile on every
    // EXACT column (same base-aggregate builder — profileBaseAggs — so a
    // divergence here means the shared scaffolding forked), and its HLL
    // bound boolean must hold on the gated corpus, because the DuckDB
    // oracle compares it against literal TRUE every round.
    def key(r: org.apache.spark.sql.Row) = (r.getAs[String]("column_name"),
      r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
      Option(r.getAs[java.lang.Double]("min_num")),
      Option(r.getAs[java.lang.Double]("max_num")),
      Option(r.getAs[String]("min_str")), Option(r.getAs[String]("max_str")))
    val gate = graft.operators.Relational.prof7ProfileSketch(spark, sf).collect()
    val exact = graft.operators.Relational.prof1ColumnProfile(spark, sf).collect()
    assert(gate.map(key).toSeq == exact.map(key).toSeq)
    assert(gate.forall(_.getAs[Boolean]("nd_ok")), gate.mkString("\n"))
  }

  test("seg1 gate: exact metrics match the ntile twin, cuts_ok holds, ties widen") {
    // r19 partial oracle: the gate's (o_custkey, recency_days, frequency,
    // monetary) must be byte-identical to the exact path's non-score
    // columns (the oracle hashes exactly these), and the GK rank bound
    // must hold on the gated corpus.
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("o_custkey"),
      r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
      r.getAs[Double]("monetary"))
    val orders = Tables.t(spark, sf, "orders")
    val gate = graft.operators.Relational.seg1RfmApproxGateCore(orders).collect()
    val exact = graft.operators.Relational.seg1RfmCore(orders).collect()
    assert(gate.map(key).toSeq == exact.map(key).toSeq)
    assert(gate.forall(_.getAs[Boolean]("cuts_ok")), s"cuts_ok false at sf")
    // Tie robustness (the scaladoc claim): a frame where every metric is
    // CONSTANT is the worst tie case — each cut's occupied rank interval
    // is the whole domain, so the intersection test must still pass.
    import spark.implicits._
    val tied = (1 to 40).map(i =>
      (i.toLong, "1997-03-0" + (1 + i % 3), 100.0)).toDF(
      "o_custkey", "o_orderdate", "o_totalprice")
    val tiedGate = graft.operators.Relational.seg1RfmApproxGateCore(tied).collect()
    assert(tiedGate.length == 40)
    assert(tiedGate.forall(_.getAs[Boolean]("cuts_ok")),
      "ties must widen the rank interval, never break the bound")
  }

  test("bloom prefilter: no false negatives, sized FPR, join-equivalent") {
    import graft.functions.Sketches
    // index = keys 0..9999; incoming = 5000..14999 -> 5000 true members,
    // 5000 true non-members with exactly known identities
    val index = spark.range(10000)
      .select(concat(lit("k"), col("id")).as("key"))
    val incoming = spark.range(5000, 15000)
      .select(concat(lit("k"), col("id")).as("key"))
    val kept = Sketches.bloomPrefilter(incoming, index, "key",
      expectedItems = 10000, fpp = 0.03).cache()
    try {
      // every true member survives (bloom has NO false negatives)
      assert(kept.join(index, "key").count() == 5000)
      // false-positive rate on the 5000 true non-members stays near fpp
      val fp = kept.count() - 5000
      assert(fp >= 0 && fp < 500, s"false positives: $fp / 5000")
      // the authoritative join result is unchanged by the prefilter
      val direct = incoming.join(index, "key").count()
      assert(kept.join(index, "key").count() == direct)
    } finally kept.unpersist()
  }

  test("count-min sketch never undercounts and stays within eps * N") {
    import graft.functions.Sketches
    // 20000 rows over 100 keys -> every key's exact count is 200
    val df = spark.range(20000)
      .select(concat(lit("w"), col("id") % 100).as("tok"))
    val cms = Sketches.countMinSketchOf(df, "tok",
      eps = 0.001, confidence = 0.99, seed = 42)
    (0 until 100).foreach { k =>
      val est = cms.estimateCount(s"w$k")
      assert(est >= 200L, s"w$k undercounted: $est")
      assert(est <= 200L + 20L, s"w$k over eps*N: $est") // eps * N = 20
    }
    assert(cms.totalCount() == 20000L)
  }

  test("percentile_approx tracks the exact median of extended price") {
    val l = Tables.t(spark, sf, "lineitem")
    val exact = l.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    val approx = l
      .select(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("m"))
      .collect()(0).getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Experiment/drift statistics on planted data: the oracle pins exact
  * values on the driver corpus; here the STATISTICAL behavior is
  * controlled — effect direction, antisymmetry, and the PSI zero/far
  * separation the monitor thresholds on.
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // user ids pre-sorted into the md5-hash arms so planted effects land
  // in a known arm
  private lazy val (armA, armB) = {
    import spark.implicits._
    val ids = spark.range(0, 400).select(col("id"))
      .withColumn("a", substring(md5(col("id").cast("string")), 1, 1) < "8")
      .collect().partition(_.getBoolean(1))
    (ids._1.map(_.getLong(0)).toSeq, ids._2.map(_.getLong(0)).toSeq)
  }

  test("welch readout: sign follows the planted effect and swapping negates") {
    import spark.implicits._
    assert(armA.size >= 50 && armB.size >= 50) // md5 split is near-even
    def frame(liftA: Double, liftB: Double) =
      (armA.take(50).zipWithIndex.map { case (u, i) =>
        (u, "click", liftA + (i % 7) * 0.1) } ++
        armB.take(50).zipWithIndex.map { case (u, i) =>
          (u, "click", liftB + (i % 7) * 0.1) })
        .toDF("user_id", "event_type", "value")
    def tOf(df: org.apache.spark.sql.DataFrame): Double =
      Stats.abTestCore(df).collect()(0).getAs[Double]("t_stat")
    val up = tOf(frame(11.0, 10.0))
    val down = tOf(frame(10.0, 11.0))
    assert(up > 0 && down < 0)
    assert(math.abs(up + down) < 1e-9, s"$up vs $down") // antisymmetric
    // a bigger effect at equal noise must score a bigger statistic
    assert(tOf(frame(13.0, 10.0)) > up)
  }

  test("ab8 FDR: a planted strong effect is BH-significant, a null metric is not") {
    import spark.implicits._
    // metric "moved": arms separated by ~10 sigma -> |t| huge, p ~ 0.
    // metric "flat": identical arm distributions -> t ~ 0, p ~ 1.
    val df = (armA.take(50).zipWithIndex.flatMap { case (u, i) =>
      Seq((u, "moved", 20.0 + (i % 7) * 0.1), (u, "flat", 5.0 + (i % 7) * 0.1)) } ++
      armB.take(50).zipWithIndex.flatMap { case (u, i) =>
        Seq((u, "moved", 10.0 + (i % 7) * 0.1), (u, "flat", 5.0 + (i % 7) * 0.1)) })
      .toDF("user_id", "event_type", "value")
    val got = Stats.abFdrCore(df).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got("moved").getAs[Boolean]("significant_bh"),
      s"planted 10-sigma effect must survive BH: ${got("moved")}")
    assert(!got("flat").getAs[Boolean]("significant_bh"))
    assert(got("moved").getAs[Double]("p_value") <
      got("flat").getAs[Double]("p_value"))
    // adjusted p never below raw p, Bonferroni never below BH
    got.values.foreach { r =>
      assert(r.getAs[Double]("p_bh") >= r.getAs[Double]("p_value") - 1e-9)
      assert(r.getAs[Double]("p_bonferroni") >=
        r.getAs[Double]("p_bh") - 1e-9)
    }
  }

  test("ab9 mSPRT: planted effect rejects, null keeps, more H1 data shrinks p") {
    import spark.implicits._
    def frame(nPerArm: Int, liftA: Double) =
      (armA.take(nPerArm).zipWithIndex.flatMap { case (u, i) =>
        Seq((u, "moved", liftA + (i % 7) * 0.1),
          (u, "flat", 5.0 + (i % 7) * 0.1)) } ++
        armB.take(nPerArm).zipWithIndex.flatMap { case (u, i) =>
          Seq((u, "moved", 10.0 + (i % 7) * 0.1),
            (u, "flat", 5.0 + (i % 7) * 0.1)) })
        .toDF("user_id", "event_type", "value")
    val got = Stats.abMsprtCore(frame(50, 20.0)).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got("moved").getAs[Boolean]("reject_at_05"),
      s"10-sigma effect must reject: ${got("moved")}")
    assert(got("moved").getAs[Double]("log_lambda") > 0)
    assert(!got("flat").getAs[Boolean]("reject_at_05"),
      s"null metric must keep: ${got("flat")}")
    assert(got("flat").getAs[Double]("p_always_valid") >
      got("moved").getAs[Double]("p_always_valid"))
    // anytime validity direction: under H1 the evidence only accumulates
    val p50 = got("moved").getAs[Double]("p_always_valid")
    val p100 = Stats.abMsprtCore(frame(100, 20.0)).collect()
      .find(_.getAs[String]("event_type") == "moved").get
      .getAs[Double]("p_always_valid")
    assert(p100 <= p50, s"p must shrink with more H1 data: $p50 -> $p100")
  }

  test("welch effect readout: df inside the Satterthwaite envelope, d scale-invariant") {
    import spark.implicits._
    def frame(scale: Double) =
      (armA.take(60).zipWithIndex.map { case (u, i) =>
        (u, "click", (11.0 + (i % 7) * 0.1) * scale) } ++
        armB.take(40).zipWithIndex.map { case (u, i) =>
          (u, "click", (9.0 + (i % 13) * 0.3) * scale) })
        .toDF("user_id", "event_type", "value")
    val r = Stats.abEffectCore(frame(1.0)).collect()(0)
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val df = r.getAs[Double]("df_welch")
    // Welch–Satterthwaite df is bracketed by min(n)-1 and n_a+n_b-2
    assert(df >= math.min(na, nb) - 1 && df <= na + nb - 2, s"df=$df")
    // planted positive effect: t and d agree in sign
    assert(r.getAs[Double]("t_stat") > 0 && r.getAs[Double]("cohen_d") > 0)
    // Cohen's d is unitless: rescaling every value leaves it unchanged
    val r10 = Stats.abEffectCore(frame(10.0)).collect()(0)
    assert(math.abs(r10.getAs[Double]("cohen_d") -
      r.getAs[Double]("cohen_d")) < 1e-5)
    assert(math.abs(r10.getAs[Double]("df_welch") - df) < 1e-3)
  }

  test("chi-square mix test: zero on proportional arms, large on a skewed category") {
    import spark.implicits._
    // identical behavior mix in both arms -> every term ~0
    def rows(skew: Boolean) =
      (armA.take(80).zipWithIndex.map { case (u, i) =>
        (u, if (i % 4 == 0) "buy" else "view") } ++
        armB.take(80).zipWithIndex.map { case (u, i) =>
          // skewed: arm B almost never buys
          (u, if (!skew && i % 4 == 0) "buy" else "view") })
        .toDF("user_id", "event_type")
    val flat = Stats.abChisqCore(rows(skew = false)).collect()
    assert(flat.forall(r => math.abs(r.getAs[Double]("chisq_term")) < 1e-6))
    val skewed = Stats.abChisqCore(rows(skew = true)).collect()
    val total = skewed.map(_.getAs[Double]("chisq_term")).sum
    // K=2 categories -> df=1; 3.84 is the 95% critical value
    assert(total > 3.84, total)
    // observed and expected margins agree per category
    skewed.foreach { r =>
      assert(r.getAs[Double]("expected_a") > 0 &&
        r.getAs[Double]("expected_b") > 0)
    }
  }

  test("categorical psi: near zero on the same mix, far after a mix shift") {
    import spark.implicits._
    val week = 604800000L
    def ev(offsetMs: Long, types: Seq[String]) =
      types.zipWithIndex.flatMap { case (t, j) =>
        (0 until 100).map(i => (offsetMs + (j * 100 + i) * 60000L, t)) }
    // identical 4-way mix on both sides
    val mix = Seq("click", "view", "buy", "scroll")
    val same = (ev(0L, mix) ++ ev(week, mix)).toDF("ts_ms", "event_type")
    val psiSame = Stats.psiCategoricalCore(same).agg(sum("psi_term"))
      .collect()(0).getDouble(0)
    assert(math.abs(psiSame) < 0.01, psiSame)
    // current period collapses to one dominant category
    val shifted = (ev(0L, mix) ++
      ev(week, Seq("click", "click", "click", "click")))
      .toDF("ts_ms", "event_type")
    val psiShift = Stats.psiCategoricalCore(shifted).agg(sum("psi_term"))
      .collect()(0).getDouble(0)
    assert(psiShift > 0.25, psiShift)
    // a category on only ONE side still scores finite, and every
    // observed category emits exactly one row with shares summing to ~1
    val rows = Stats.psiCategoricalCore(shifted).collect()
    assert(rows.map(_.getString(0)).toSeq == mix.sorted)
    assert(rows.forall(r => !r.getDouble(5).isInfinite && !r.getDouble(5).isNaN))
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 0.01)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 0.01)
  }

  test("psi: near zero on identical slices, far from zero after a shift") {
    import spark.implicits._
    val week = 604800000L
    // reference week: values 0..999 cycling; identical current period
    def ev(offsetMs: Long, shift: Double) =
      (0 until 1000).map(i => (offsetMs + i * 60000L, (i % 100) + shift))
    val same = (ev(0L, 0.0) ++ ev(week, 0.0)).toDF("ts_ms", "value")
    val psiSame = Stats.psiDriftCore(same).agg(sum("psi_term"))
      .collect()(0).getDouble(0)
    assert(math.abs(psiSame) < 0.01, psiSame)
    // industry rule of thumb: PSI > 0.25 = action threshold; a 30-unit
    // shift on a 0..99 domain must blow far past it
    val shifted = (ev(0L, 0.0) ++ ev(week, 30.0)).toDF("ts_ms", "value")
    val psiShift = Stats.psiDriftCore(shifted).agg(sum("psi_term"))
      .collect()(0).getDouble(0)
    assert(psiShift > 0.25, psiShift)
    // every reference decile emits a row, shares each sum to ~1
    val rows = Stats.psiDriftCore(shifted).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 0.01)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 0.01)
  }

  test("psi: a tie-heavy reference merges deciles consistently, shares intact") {
    import spark.implicits._
    val week = 604800000L
    // 60% of the reference is one value: several decile cuts coincide,
    // so high bucket ids become unreachable rather than misassigned
    val ref = (0 until 1000).map(i =>
      (i * 60000L, if (i < 600) 5.0 else (i % 50) + 10.0))
    val cur = (0 until 1000).map(i => (week + i * 60000L, (i % 50) + 10.0))
    val rows = Stats.psiDriftCore((ref ++ cur).toDF("ts_ms", "value"))
      .collect()
    val ids = rows.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted && ids.toSet.size == ids.size)
    assert(ids.size < 10, ids) // merged deciles: fewer, not wrong, buckets
    // the tied mass sits in ONE lower bucket and all shares still
    // account for every row on both sides
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 0.02)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 0.02)
  }

  test("ab4 lift CI: zero-in-CI iff not significant, swap negates the bracket") {
    import spark.implicits._
    def frame(liftA: Double, liftB: Double, noise: Double) =
      (armA.take(60).zipWithIndex.map { case (u, i) =>
        (u, "click", liftA + (i % 7) * noise) } ++
        armB.take(60).zipWithIndex.map { case (u, i) =>
          (u, "click", liftB + (i % 7) * noise) })
        .toDF("user_id", "event_type", "value")
    def row(df: org.apache.spark.sql.DataFrame) =
      Stats.abLiftCiCore(df).collect()(0)
    // a large planted effect against small noise: significant, lo > 0
    val strong = row(frame(20.0, 10.0, 0.1))
    assert(strong.getAs[Boolean]("significant"))
    assert(strong.getAs[Double]("ci_lo") > 0.0)
    assert(strong.getAs[Double]("lift") == 10.0)
    // identical arms: CI brackets zero, not significant
    val none = row(frame(10.0, 10.0, 0.1))
    assert(!none.getAs[Boolean]("significant"))
    assert(none.getAs[Double]("ci_lo") <= 0.0 &&
      none.getAs[Double]("ci_hi") >= 0.0)
    // swapping the arms negates lift and mirrors the bracket
    val up = row(frame(12.0, 10.0, 0.5))
    val down = row(frame(10.0, 12.0, 0.5))
    assert(up.getAs[Double]("lift") == -down.getAs[Double]("lift"))
    assert(math.abs(up.getAs[Double]("ci_lo")
      + down.getAs[Double]("ci_hi")) < 1e-9)
  }

  test("signed-zero convention: r2s/r6s normalize round(-eps) to +0.0 bits") {
    import spark.implicits._
    import java.lang.Double.doubleToRawLongBits
    // DuckDB's IEEE round returns -0.0 for these inputs; Spark's r6s/r2s
    // must land on +0.0 (raw bits 0x0) so the driver's hash compare
    // cannot diverge — the oracle side appends `+ 0`, IEEE-guaranteed to
    // map -0.0 to +0.0, so proving the Spark half proves agreement.
    val row = Seq((-1e-9, -0.0))
      .toDF("eps", "negzero")
      .select(
        graft.Tables.r6s(col("eps")).as("a"),
        graft.Tables.r2s(col("eps")).as("b"),
        graft.Tables.r6s(col("negzero")).as("c"),
        (round(col("negzero"), 6)).as("unnormalized"))
      .collect()(0)
    assert(doubleToRawLongBits(row.getDouble(0)) == 0L)
    assert(doubleToRawLongBits(row.getDouble(1)) == 0L)
    assert(doubleToRawLongBits(row.getDouble(2)) == 0L)
  }

  test("prof6 Spearman: monotone-map invariance, reversal, Pearson divergence") {
    import spark.implicits._
    import graft.operators.Relational
    def rho(rows: Seq[(Double, Double)]): Double =
      Relational.spearmanCore(rows.toDF("x", "y")).collect()(0)
        .getAs[Double]("spearman_rho")
    val xs = Seq(1.0, 2.0, 3.0, 5.0, 8.0, 13.0)
    // any strictly increasing map scores exactly 1 — the rank property
    // Pearson does not have (x² is convex: its Pearson r < 1)
    assert(rho(xs.map(v => v -> v * v)) == 1.0)
    assert(rho(xs.map(v => v -> math.exp(v))) == 1.0)
    // order reversal scores exactly -1
    assert(rho(xs.map(v => v -> -v)) == -1.0)
    // ties on both sides stay in [-1, 1] and positive for an aligned mix
    val tied = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 3.0),
      (3.0, 3.0), (3.0, 3.0))
    val r = rho(tied)
    assert(r > 0 && r <= 1.0, r)
  }

  test("prof4 MI: independence scores zero, determinism scores NMI 1, symmetric") {
    import spark.implicits._
    import graft.operators.Relational
    def mi(rows: Seq[(String, String)]) =
      Relational.miProfile(rows.toDF("x", "y"), "x", "y").collect()(0)
    // product distribution: every (x, y) cell equally likely → MI 0
    val indep = mi(for { x <- Seq("a", "b"); y <- Seq("u", "v", "w") }
      yield (x, y))
    assert(indep.getAs[Double]("mi_nats") == 0.0)
    // y is a function of x → MI = H(X) = H(Y), NMI 1
    val det = mi(Seq.fill(3)(("a", "u")) ++ Seq.fill(5)(("b", "v")))
    assert(det.getAs[Double]("nmi") == 1.0)
    assert(det.getAs[Double]("mi_nats") == det.getAs[Double]("h_x"))
    // symmetry: swapping the columns preserves MI and swaps entropies
    val ab = Seq(("a", "u"), ("a", "u"), ("a", "v"), ("b", "v"), ("b", "w"))
    val fwd = mi(ab)
    val rev = mi(ab.map(_.swap))
    assert(fwd.getAs[Double]("mi_nats") == rev.getAs[Double]("mi_nats"))
    assert(fwd.getAs[Double]("h_x") == rev.getAs[Double]("h_y"))
    // MI is bounded by both entropies
    assert(fwd.getAs[Double]("mi_nats") <=
      math.min(fwd.getAs[Double]("h_x"), fwd.getAs[Double]("h_y")))
  }

  test("ab5 SRM: clean 50/50 stays quiet, a starved arm alarms") {
    import spark.implicits._
    // users 1..200 hash-split exactly 100/100 (precomputed); each user
    // fires 2 events so the distinct-unit collapse is exercised
    def events(users: Seq[Long]) =
      users.flatMap(u => Seq((u, "click"), (u, "click")))
        .toDF("user_id", "event_type")
    val all = (1L to 200L)
    val clean = Stats.abSrmCore(events(all)).collect().head
    assert(clean.getAs[Long]("n_units_a") == 100L)
    assert(clean.getAs[Long]("n_units_b") == 100L)
    assert(clean.getAs[Double]("chisq") == 0.0)
    assert(!clean.getAs[Boolean]("srm_alarm"))
    // starve arm B: keep only 2 of 5 B-users -> chisq far over 3.841
    val armB = all.filter(u =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes).head & 0x80) != 0) // hex[0] >= '8'
    val starved = all.filterNot(armB.contains) ++ armB.filter(_ % 5 < 2)
    val bad = Stats.abSrmCore(events(starved)).collect().head
    assert(bad.getAs[Long]("n_units_a") == 100L)
    assert(bad.getAs[Long]("n_units_b") < 60L)
    assert(bad.getAs[Boolean]("srm_alarm"))
    assert(bad.getAs[Double]("chisq") > 3.841)
  }

  test("drift4 KS: identical samples score 0, disjoint score 1") {
    import spark.implicits._
    val week = 604800000L
    // ref window = first 7 days from t0: put ref at ms 0..3, cur after
    def frame(ref: Seq[Double], cur: Seq[Double]) =
      (ref.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
        cur.zipWithIndex.map { case (v, i) => (week + 1 + i.toLong, v) })
        .toDF("ts_ms", "value")
    val same = Stats.ksDriftCore(
      frame(Seq(1.0, 2.0, 3.0, 4.0), Seq(1.0, 2.0, 3.0, 4.0))).collect().head
    assert(same.getDouble(0) == 0.0, same)
    assert(same.getLong(1) == 4L && same.getLong(2) == 4L)
    val disjoint = Stats.ksDriftCore(
      frame(Seq(1.0, 2.0), Seq(10.0, 11.0, 12.0))).collect().head
    assert(disjoint.getDouble(0) == 1.0, disjoint)
    // half-shifted: KS = 0.5 exactly (half the cur mass beyond ref max)
    val half = Stats.ksDriftCore(
      frame(Seq(1.0, 2.0), Seq(1.0, 2.0, 10.0, 11.0))).collect().head
    assert(half.getDouble(0) == 0.5, half)
  }

  test("ab7 power: zero-mean metric yields null n_per_arm, healthy scales") {
    import spark.implicits._
    // "z": symmetric values -> mean exactly 0 -> mde 0 -> no finite n
    // "h": healthy metric -> n matches the z-formula computed locally
    val ev = Seq(
      ("z", 1.0), ("z", -1.0), ("z", 2.0), ("z", -2.0),
      ("h", 10.0), ("h", 12.0), ("h", 14.0), ("h", 16.0)
    ).toDF("event_type", "value")
    val rows = Stats.abPowerCore(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("z").isNullAt(rows("z").fieldIndex("n_per_arm")))
    assert(rows("z").getDouble(rows("z").fieldIndex("mde")) == 0.0)
    val h = rows("h")
    val mean = 13.0
    val varS = Seq(10.0, 12.0, 14.0, 16.0)
      .map(v => (v - mean) * (v - mean)).sum / 3
    val mde = mean * 0.05
    val n = math.ceil(BigDecimal((1.96 + 0.8416) * (1.96 + 0.8416) * 2.0 *
      varS / (mde * mde)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble).toLong
    assert(h.getLong(h.fieldIndex("n_per_arm")) == n, h)
  }

  test("ab6 CUPED: perfect covariate kills all variance, independent none") {
    import spark.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // one pre (ms=0) and one post (ms=1000000) event per user; mid=500000
    def ev(rows: Seq[(Long, Double, Double)]) =
      rows.flatMap { case (u, x, y) =>
        Seq((u, ts(0L), x), (u, ts(1000000L), y)) }
        .toDF("user_id", "ts", "value")
    // y = 2x + 5 exactly: theta = 2, adjusted variance = 0, reduction 100%
    val perfect = Stats.abCupedCore(ev(Seq(
      (1L, 1.0, 7.0), (2L, 2.0, 9.0), (3L, 3.0, 11.0), (4L, 4.0, 13.0)
    ))).collect().head
    assert(perfect.getAs[Long]("n_users") == 4L)
    assert(perfect.getAs[Double]("theta") == 2.0)
    assert(perfect.getAs[Double]("var_cuped") == 0.0)
    assert(perfect.getAs[Double]("var_reduction_pct") == 100.0)
    // x uncorrelated with y: theta = 0, adjusted variance untouched
    val indep = Stats.abCupedCore(ev(Seq(
      (1L, 1.0, 3.0), (2L, 2.0, 3.0), (3L, 1.0, 7.0), (4L, 2.0, 7.0)
    ))).collect().head
    assert(indep.getAs[Double]("theta") == 0.0)
    assert(indep.getAs[Double]("var_cuped") ==
      indep.getAs[Double]("var_post"))
    assert(indep.getAs[Double]("var_reduction_pct") == 0.0)
  }
}

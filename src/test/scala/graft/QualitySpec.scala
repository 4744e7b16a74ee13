package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality

/** The dq1 gate sees only the clean driver corpus (all counts zero), so
  * every violation-counting path is exercised here against a planted
  * corpus carrying exactly one violation of each constraint class.
  */
class QualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("constraint report counts exactly the planted violations") {
    import spark.implicits._
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val cust = Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"))
      .toDF("c_custkey", "c_name") // duplicate key 2
    val ord = Seq(
      (10L, 1L, Some(java.sql.Date.valueOf("2024-01-01"))),
      (11L, 99L, Some(java.sql.Date.valueOf("2024-01-02"))), // orphan cust
      (12L, 3L, None: Option[java.sql.Date])                 // null date
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (10L, 1L, 5.0, 0.05),
      (77L, 2L, 3.0, 0.10),  // orphan order
      (11L, 3L, -1.0, 0.00), // non-positive quantity
      (12L, 4L, 2.0, 1.50)   // discount out of unit range
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    val ev = Seq(
      (1L, ts(0), 1.0), (2L, ts(1), Double.NaN) // NaN value
    ).toDF("event_id", "ts", "value")

    val got = Quality.constraintReport(cust, ord, li, ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "customer_pk_unique" -> 1L,       // key 2 (one duplicated key)
      "events_value_is_number" -> 1L,
      "lineitem_discount_in_unit_range" -> 1L,
      "lineitem_fk_orders" -> 1L,
      "lineitem_quantity_positive" -> 1L,
      "orders_date_not_null" -> 1L,
      "orders_fk_customer" -> 1L), got)
  }

  test("dq1 on the driver corpus is the all-clean baseline") {
    val rows = Quality.dq1ConstraintReport(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 7)
    assert(rows.forall(_.getLong(1) == 0L), rows.mkString(","))
  }

  test("accepted-values and cross-column report counts planted violations") {
    import spark.implicits._
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val ord = Seq(
      (10L, "O", "1-URGENT", 100.0),
      (11L, "X", "2-HIGH", 50.0),        // bad status
      (12L, "F", "6-WHENEVER", 75.0),    // bad priority
      (13L, "P", "5-LOW", -2.0)          // negative total
    ).toDF("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
    val li = Seq(
      (10L, 5.0, 20.0, 0.05, 0.04),
      (11L, 3.0, 30.0, 0.80, 0.40),      // discount+tax > 1
      (12L, 4.0, 2.0, 0.00, 0.00)        // extended price below quantity
    ).toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val ev = Seq(
      (1L, ts(0), "click"), (2L, ts(1), "hover") // unknown event type
    ).toDF("event_id", "ts", "event_type")

    val got = Quality.acceptedAndCrossReport(ord, li, ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "events_type_accepted_values" -> 1L,
      "lineitem_disc_plus_tax_in_unit_range" -> 1L,
      "lineitem_unit_price_at_least_one" -> 1L,
      "orders_priority_accepted_values" -> 1L,
      "orders_status_accepted_values" -> 1L,
      "orders_totalprice_nonnegative" -> 1L), got)
    // a NULL domain column is not an accepted-values violation (dq1's
    // null checks own that class) — consistent with SQL NOT IN semantics
    val nullEv = Seq((3L, ts(2), null.asInstanceOf[String]))
      .toDF("event_id", "ts", "event_type")
    val g2 = Quality.acceptedAndCrossReport(ord, li, nullEv)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g2("events_type_accepted_values") == 0L)
  }

  test("dq2 on the driver corpus is the all-clean baseline") {
    val rows = Quality.dq2AcceptedAndCross(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getLong(1) == 0L), rows.mkString(","))
  }

  test("dq3 flags exactly the planted extreme; a constant group flags none") {
    import spark.implicits._
    // group "g": tight cluster around 10 plus one planted extreme.
    // median 10, MAD 0.1 → threshold 0.4448; 9.9/10.1 stay, 1000 flags.
    val tight = Seq.tabulate(20)(i => ("g", 10.0 + (i % 3 - 1) * 0.1))
    // group "c": all-identical values → MAD 0, zero deviations, 0 outliers
    val const = Seq.fill(10)(("c", 5.0))
    val got = Quality.madOutlierReport(
      (tight ++ Seq(("g", 1000.0)) ++ const).toDF("event_type", "value"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("g").getAs[Long]("n_outliers") == 1L)
    assert(got("g").getAs[Double]("median") == 10.0)
    assert(got("g").getAs[Double]("mad") == 0.1)
    assert(got("c").getAs[Long]("n_outliers") == 0L)
    assert(got("c").getAs[Double]("mad") == 0.0)
  }

  test("dq4 flags exactly the planted dropped day and double-fire day") {
    import spark.implicits._
    // 14 steady days of 100 events, then a 10-event day (drop), a
    // 100-event day (recovery), and a 210-event day (double-fire).
    // Trailing medians stay ~100, so only the two planted days flag;
    // the first 3 days are warm-up (null verdict, never `false`).
    def day(d: Int, n: Int) = Seq.tabulate(n)(i =>
      (d * 1000L + i, new java.sql.Timestamp(1704067200000L + d * 86400000L + i * 1000L)))
    val ev = ((0 until 14).flatMap(d => day(d, 100)) ++
      day(14, 10) ++ day(15, 100) ++ day(16, 210))
      .toDF("event_id", "ts")
    val rows = Quality.volumeAnomalyReport(ev).collect()
    assert(rows.length == 17)
    val flagged = rows.filter(r => !r.isNullAt(4) && r.getBoolean(4))
      .map(_.getAs[java.sql.Date]("day").toString).toSet
    assert(flagged == Set("2024-01-15", "2024-01-17"), rows.mkString("\n"))
    val warmup = rows.take(3)
    assert(warmup.forall(_.isNullAt(4)), "first 3 days are warm-up")
    assert(warmup.map(_.getAs[Long]("n_trailing")).toSeq == Seq(0L, 1L, 2L))
  }

  test("dq6 reconciliation classifies one planted order per band") {
    import spark.implicits._
    // one line each at price 100.00, disc 0.10, tax 0.20 -> calc 108.00
    val ord = Seq((1L, 108.00), (2L, 113.40), (3L, 135.00), (4L, 1000.00),
      (5L, 50.00)).toDF("o_orderkey", "o_totalprice")
    val li = Seq(1L, 2L, 3L, 4L).map(o => (o, 100.00, 0.10, 0.20))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val got = Quality.reconciliationReport(ord, li).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("exact", "within_5pct", "within_25pct",
      "gross", "no_lines"), got.keySet)
    assert(got.values.forall(_.getAs[Long]("n_orders") == 1L))
    assert(got("exact").getAs[Double]("computed_total") == 108.00)
    assert(got("within_5pct").getAs[Double]("listed_total") == 113.40)
    assert(got("gross").getAs[Double]("listed_total") == 1000.00)
    assert(got("no_lines")
      .isNullAt(got("no_lines").fieldIndex("computed_total")))
    assert(got.values.forall(_.getAs[Double]("share") == 0.2))
  }

  test("dq5 reports staleness against the corpus watermark") {
    import spark.implicits._
    val base = 1704067200000L
    val ev = Seq(
      (1L, new java.sql.Timestamp(base), "click"),
      (2L, new java.sql.Timestamp(base + 3600000L * 5), "click"),
      (3L, new java.sql.Timestamp(base + 3600000L * 2), "view"),
      (4L, new java.sql.Timestamp(base + 1800000L), "error")
    ).toDF("event_id", "ts", "event_type")
    val got = Quality.freshnessReport(ev).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("hours_behind")).toMap
    assert(got == Map("click" -> 0.0, "view" -> 3.0, "error" -> 4.5))
  }

  test("dq7 FD discovery: a held dependency is clean, a planted violation counts 1") {
    import spark.implicits._
    // y -> x holds (each y value maps to one x); x -> y is violated by
    // exactly one row (x=2 maps to {q,q,r}: one r must change)
    val tab = Seq(
      (1, "p", 5), (1, "p", 6), (2, "q", 5), (2, "q", 5), (2, "r", 5)
    ).toDF("x", "y", "z")
    val got = Quality.fdDiscoveryCore(tab, Seq(("y", "x"), ("x", "y")))
      .collect().map(r => r.getString(0) -> r).toMap
    val hold = got("y")
    assert(hold.getAs[Boolean]("holds") &&
      hold.getAs[Long]("n_violations") == 0L &&
      hold.getAs[Double]("violation_rate") == 0.0)
    val broken = got("x")
    assert(!broken.getAs[Boolean]("holds") &&
      broken.getAs[Long]("n_rows") == 5L &&
      broken.getAs[Long]("n_violations") == 1L &&
      broken.getAs[Double]("violation_rate") == 0.2)
  }
}

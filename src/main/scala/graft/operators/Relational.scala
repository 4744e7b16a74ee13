package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{t, r2, r2s, r6, r6s}

/** Relational query surface (SURVEY.md §2.5): aggregations, joins, windows,
  * set ops, top-k, grouping sets, scalar functions — the capabilities the
  * reference lacks but the north star requires, expressed as declarative
  * DataFrame plans so Catalyst handles pushdown, join selection, partial
  * aggregation and AQE.
  *
  * Scale notes (100 TB): every query shuffles only on its aggregation or
  * join keys; dimension tables (region/nation/supplier/customer/part) are
  * broadcast-joined — the fact tables (lineitem/orders/events) never shuffle
  * for enrichment joins; fact scans push filters and prune columns into the
  * parquet reader; top-k compiles to TakeOrderedAndProject (no global sort
  * materialization).
  *
  * Determinism conventions for the DuckDB oracle: every result fully
  * ordered on a unique key set; monetary sums rounded to 2 (2-decimal
  * inputs keep true sums ≥ 0.005 from any rounding boundary, so parallel
  * summation error below 1e-9 cannot flip the hash); ratios/averages to 6;
  * integer-valued window/rank/date functions cast to long to match DuckDB's
  * BIGINT; null grouping keys from rollup/grouping sets replaced by
  * sentinels on both sides (sidesteps NULLS FIRST/LAST divergence).
  */
object Relational {

  /** TPC-H Q1-style pricing summary over lineitem: single hash aggregate with
    * map-side partial aggregation; scan prunes to 7 of 11 columns and pushes
    * the shipdate filter (reference has no aggregation — SURVEY §2.5).
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" <= to_timestamp(lit("2001-09-02")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        r2(sum($"l_quantity")).as("sum_qty"),
        r2(sum($"l_extendedprice")).as("sum_base_price"),
        r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_price"),
        r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))).as("sum_charge"),
        r6(avg($"l_quantity")).as("avg_qty"),
        r6(avg($"l_extendedprice")).as("avg_price"),
        r6(avg($"l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q3-style shipping priority: broadcast the filtered customer dim
    * into orders, shuffle-join lineitem on the order key, top-10 by revenue
    * via TakeOrderedAndProject.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = t(spark, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val ord = t(spark, dir, "orders").filter($"o_orderdate" < lit("1998-07-01"))
    val li = t(spark, dir, "lineitem").filter($"l_shipdate" > lit("1998-07-01"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  /** TPC-H Q5-style regional revenue: all four dimension joins broadcast;
    * the only shuffle is lineitem->orders and the final tiny aggregation.
    */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = t(spark, dir, "region").filter($"r_name" === "EUROPE")
    val nation = t(spark, dir, "nation")
    val supp = t(spark, dir, "supplier")
    val cust = t(spark, dir, "customer")
    val ord = t(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1999-01-01"))
    val li = t(spark, dir, "lineitem")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** TPC-H Q10-style: top-20 customers by revenue lost to returned items. */
  def q10ReturnedTop(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = t(spark, dir, "lineitem").filter($"l_returnflag" === "R")
    val ord = t(spark, dir, "orders")
    val cust = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** Ranking window: top-3 orders per customer (row_number over a unique
    * total order) — one shuffle on the partition key.
    */
  def w1TopOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    t(spark, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        row_number().over(w).cast("long").as("rn"))
      .filter($"rn" <= 3)
      .orderBy($"o_custkey", $"rn")
  }

  /** Analytic window: per-user running value total and previous event type
    * over the event stream (frame-based running aggregate + lag).
    */
  def w2RunningTotals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(spark, dir, "events")
      .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"),
        $"event_type", $"value",
        r2(sum($"value").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .as("running_value"),
        lag($"event_type", 1).over(w).as("prev_type"))
      .orderBy($"user_id", $"event_id")
  }

  /** Time-range window frames + the rank-distribution family: per-user
    * 10-minute trailing sums (RANGE frame over epoch-ms — each row's frame
    * is defined by time distance, not row count) plus percent_rank and
    * ntile quartiles over a total per-user value order. One shuffle on the
    * partition key serves all three window specs.
    */
  def w3RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byTime = Window.partitionBy($"user_id").orderBy($"ts_ms")
      .rangeBetween(-600000L, 0L)
    val byValue = Window.partitionBy($"user_id").orderBy($"value", $"event_id")
    t(spark, dir, "events")
      .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"), $"value")
      .select($"user_id", $"event_id", $"ts_ms", $"value",
        r2(sum($"value").over(byTime)).as("value_10m"),
        r6(percent_rank().over(byValue)).as("value_pct_rank"),
        ntile(4).over(byValue).cast("long").as("value_quartile"))
      .orderBy($"user_id", $"event_id")
  }

  /** Value-navigation window family — the remaining analytic surface
    * (cume_dist, first_value, last_value over a running frame, nth_value,
    * lead): each user's event stream annotated with its distribution
    * position and frame-edge values. All five functions ride the SAME
    * (user_id)-keyed exchange as one Window operator stack (PlanSpec pins
    * a single shuffle), so completing the function family costs no
    * additional data movement.
    */
  def w4ValueNavigation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byTime = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
    val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byValue = Window.partitionBy($"user_id").orderBy($"value", $"event_id")
    t(spark, dir, "events")
      .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"), $"value")
      .select($"user_id", $"event_id", $"ts_ms", $"value",
        first($"value").over(running).as("first_value"),
        last($"value").over(running).as("running_last"),
        nth_value($"value", 2).over(running).as("second_value"),
        lead($"value", 1).over(byTime).as("next_value"),
        r6(cume_dist().over(byValue)).as("value_cume_dist"))
      .orderBy($"user_id", $"event_id")
  }

  /** w5 — IGNORE NULLS navigation (gap-fill): the last-observation-
    * carried-forward / next-observation-backward family over a sparse
    * signal, completing w4's respect-nulls navigation. The signal is
    * DETERMINISTICALLY sparsified (values below 100 mask to null — the
    * "sensor only reports above threshold" shape), then each row carries
    * the masked value, the LOCF fill, the backward fill, and the previous
    * non-null observation — on ONE shared (user, time) exchange: all
    * three windows share partitioning and ordering, so the plan sorts
    * once (w2's convention).
    */
  def w5GapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byTime = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
    val back = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = byTime.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prev = byTime.rowsBetween(Window.unboundedPreceding, -1)
    t(spark, dir, "events")
      .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"),
        when($"value" >= 100.0, $"value").as("sparse_value"))
      .select($"user_id", $"event_id", $"ts_ms", $"sparse_value",
        last($"sparse_value", ignoreNulls = true).over(back).as("locf"),
        first($"sparse_value", ignoreNulls = true).over(fwd).as("nocb"),
        last($"sparse_value", ignoreNulls = true).over(prev)
          .as("prev_observed"))
      .orderBy($"user_id", $"event_id")
  }

  /** w6 — distribution ranks: percent_rank, cume_dist and quartile
    * (ntile) of every customer's balance WITHIN its market segment —
    * the relative-standing window family (w1 counts, w2 accumulates, w4
    * navigates; this one positions). The three functions share ONE
    * (segment, balance, custkey) exchange+sort; custkey completes the
    * ordering so ntile's row numbering — and therefore every output —
    * is deterministic under balance ties.
    */
  def w6DistributionRanks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal", $"c_custkey")
    t(spark, dir, "customer")
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal",
        r6(percent_rank().over(w)).as("pct_rank"),
        r6(cume_dist().over(w)).as("cume"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy($"c_mktsegment", $"c_custkey")
  }

  /** Single-pass column profiling — the first-class form of the statistics
    * the cleaning pass (P2/P7) computes internally: per column, row/null/
    * exact-distinct counts and min/max, emitted long-format (numeric and
    * string extrema in separate typed columns). ONE aggregate scan
    * produces every statistic; the per-column rows come from exploding the
    * 1-row result, so no second pass and no per-column jobs. The exact
    * count_distinct is the oracle-checkable choice; at 100 TB the same
    * plan runs with approx_count_distinct (HLL, one pass, no Expand) —
    * SketchSpec pins that estimator's accuracy separately.
    */
  def prof1ColumnProfile(spark: SparkSession, dir: String): DataFrame =
    columnProfile(t(spark, dir, "customer"),
      Seq("c_custkey", "c_nationkey", "c_acctbal"),
      Seq("c_name", "c_mktsegment"), exact = true)

  /** The 100 TB scale path of prof1: the SAME single-scan long-format
    * profile with `approx_count_distinct` (HLL++, relative error `rsd`)
    * in place of exact `count_distinct`. Exact distinct plans through
    * Expand — each input row is replicated once per profiled column ahead
    * of the exchange — while the sketch is one ordinary hash aggregate
    * with map-side partial sketches, so the scan-side data volume does
    * not multiply with profile width. Not oracle-gated (sketch estimates
    * are engine-specific); SketchSpec bounds the estimator's error on
    * known cardinalities and asserts the Expand-free plan.
    */
  def profileApprox(src: DataFrame, numCols: Seq[String], strCols: Seq[String],
      rsd: Double = 0.02): DataFrame =
    columnProfile(src, numCols, strCols, exact = false, rsd)

  /** prof7 — prof1's 100 TB sketch path as a first-class gated query.
    *
    * Partial oracle (r19, finishing the prof8/drift3 graduation from
    * r18): no DuckDB oracle can hash-match HLL++ internals, so the OLD
    * gate was rows-only — the weakest check in the suite. The gated
    * output now carries every EXACT profile column (row/null counts and
    * extrema, hash-checked against DuckDB) plus `nd_ok`, the in-query
    * sketch bound: the HLL++ estimate (rsd 0.02) must land within 5% of
    * the exact distinct count (SketchSpec's bound, now enforced on the
    * gated corpus every round). DuckDB emits literal TRUE, so an
    * estimator drifting out of tolerance hash-FAILS the round instead of
    * passing rows-only. The raw estimate itself stays out of the hash
    * (engine-specific — prof8's convention).
    *
    * The exact count_distinct here is GATE INSTRUMENTATION: it plans
    * through Expand, which is exactly what the sketch path avoids at
    * scale — the VALUE-carrying 100 TB form remains [[profileApprox]]
    * (one ordinary hash aggregate, Expand-free plan asserted by
    * SketchSpec), and the bound check is how the gate proves that form's
    * estimates against the exact twin on the same scan.
    */
  def prof7ProfileSketch(spark: SparkSession, dir: String): DataFrame = {
    val src = t(spark, dir, "customer")
    val numCols = Seq("c_custkey", "c_nationkey", "c_acctbal")
    val strCols = Seq("c_name", "c_mktsegment")
    // TWO 1-row aggregates joined, NOT one: mixing the 5 DISTINCT
    // aggregates with 5 HLL sketches in a single agg trips Spark's
    // RewriteDistinctAggregates into a pathological plan — measured
    // 14.8 s isolated min-of-3 at sf0.1/local[32] vs 0.83 s for prof1's
    // exact-only aggregate and ~0.3 s for the sketch-only one. Keeping
    // each family in its known-good shape (the exact side on prof1's
    // Expand path, the sketch side as one plain hash aggregate — the
    // same Expand-free plan SketchSpec pins for profileApprox) costs one
    // extra scan of the profiled table and runs ~13x faster.
    val exactAggs = profileBaseAggs(numCols, strCols) ++
      (numCols ++ strCols).map(c => count_distinct(col(c)).as(s"ndx_$c"))
    val approxAggs = (numCols ++ strCols)
      .map(c => approx_count_distinct(col(c), 0.02).as(s"nda_$c"))
    // NOT width-pinned (r20 A/B, quiet box, isolated min-of-4 with the
    // prof1 twin pin): prof1 1.114 -> 1.226, prof7 1.351 -> 1.347 —
    // the distinct-rewrite's cost here is planning + the Expand's
    // per-row constant, not task parallelism; the pin's extra exchange
    // only adds wall.
    val one = src.agg(exactAggs.head, exactAggs.tail: _*)
      .crossJoin(broadcast(src.agg(approxAggs.head, approxAggs.tail: _*)))
    profileRows(one, numCols, strCols,
      mid = _ => Seq.empty,
      end = c => Seq((abs(col(s"nda_$c").cast("double") - col(s"ndx_$c")) <=
        greatest(col(s"ndx_$c") * 0.05, lit(1.0))).as("nd_ok")))
  }

  /** prof8 — prof2's 100 TB sketch path as a first-class gated query:
    * [[equiDepthApprox]] over the same events.value, 8 buckets.
    *
    * Partial oracle (r18, upgrading the old rows-only gate): the
    * sketch's cut/lo/hi VALUES are engine-specific (DuckDB's t-digest
    * cuts differ), but the histogram's load-bearing invariants are not —
    * the gated output is `(bucket 1..8, n_total, depth_ok)` where
    * `n_total` is the EXACT non-null row count (hash-checked against
    * DuckDB) and `depth_ok` asserts the sketch's depth contract in-query:
    * every bucket within 10% of n/8 (SketchSpec's bound, now enforced on
    * the gated corpus every round — accuracy 10000 ⇒ rank error ≤
    * n/10000, two orders inside it). DuckDB emits literal TRUE, so a
    * sketch drifting out of tolerance (or a vanished bucket) hash-FAILS
    * instead of passing rows-only. The value-carrying histogram remains
    * [[equiDepthApprox]] (SketchSpec: Window-free plan, error bound vs
    * [[equiDepthExact]]).
    *
    * Tie contract: the bound is a property of the HISTOGRAM, not only
    * the sketch — a column where one value carries more than depth+10%
    * of the mass cannot be equi-depth bucketed by ANY cut placement
    * (exact or sketched), and this gate then fails BY DESIGN: an
    * operator advertising near-equal buckets it cannot deliver on that
    * data should fail its round, not pass rows-only. The gated column
    * (events.value) is continuous; tie-heavy columns belong on the
    * exact prof2 path, whose output is well-defined under ties.
    */
  def prof8EquidepthSketch(spark: SparkSession, dir: String): DataFrame = {
    // Scoped-cached: the 8-row histogram is consumed by TWO subtrees of
    // the one gated action (the total aggregate and the per-bucket
    // check); without the cache each subtree re-runs the two corpus
    // scans underneath equiDepthApprox.
    val h = graft.engine.Caching.scopedPersist(
      equiDepthApprox(t(spark, dir, "events"), "value", 8))
    val tot = h.agg(sum(col("n")).as("n_total"))
    h.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_total"),
        (abs(col("n").cast("double") - col("n_total") / 8.0) <=
          greatest(col("n_total") / 80.0, lit(1.0))).as("depth_ok"))
      .orderBy("bucket")
  }

  private def columnProfile(src: DataFrame, numCols: Seq[String],
      strCols: Seq[String], exact: Boolean, rsd: Double = 0.02): DataFrame = {
    val aggs = profileBaseAggs(numCols, strCols) ++
      (numCols ++ strCols).map(c =>
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"nd_$c"))
    val one = src.agg(aggs.head, aggs.tail: _*)
    profileRows(one, numCols, strCols,
      mid = c => Seq(col(s"nd_$c").as("n_distinct")),
      end = _ => Seq.empty)
  }

  /** The per-column count/min/max aggregate set (+ n_rows) shared by
    * [[columnProfile]] (prof1/prof7's exact side) — ONE definition so a
    * profile-convention change (rounding, null accounting) cannot make
    * prof1 and prof7 silently diverge.
    */
  private def profileBaseAggs(numCols: Seq[String],
      strCols: Seq[String]): Seq[Column] =
    (numCols ++ strCols).flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c")) ++
        (if (numCols.contains(c))
          Seq(round(min(col(c)).cast("double"), 2).as(s"mn_$c"),
            round(max(col(c)).cast("double"), 2).as(s"mx_$c"))
        else Seq(min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c")))
    } :+ count(lit(1)).as("n_rows")

  /** Long-format pivot of the 1-row profile frame (struct → explode →
    * one row per column; no second scan, no per-column jobs). `mid(c)`
    * injects fields after n_nulls (prof1's n_distinct), `end(c)` appends
    * trailing fields (prof7's nd_ok bound boolean).
    */
  private def profileRows(one: DataFrame, numCols: Seq[String],
      strCols: Seq[String], mid: String => Seq[Column],
      end: String => Seq[Column]): DataFrame = {
    val rows = (numCols ++ strCols).map { c =>
      val num = numCols.contains(c)
      val fields = Seq(lit(c).as("column_name"), col("n_rows"),
          (col("n_rows") - col(s"cnt_$c")).as("n_nulls")) ++
        mid(c) ++
        Seq((if (num) col(s"mn_$c") else lit(null).cast("double")).as("min_num"),
          (if (num) col(s"mx_$c") else lit(null).cast("double")).as("max_num"),
          (if (num) lit(null).cast("string") else col(s"mn_$c")).as("min_str"),
          (if (num) lit(null).cast("string") else col(s"mx_$c")).as("max_str")) ++
        end(c)
      struct(fields: _*)
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      .orderBy("column_name")
  }

  /** prof2 — equi-depth histogram of events.value: 8 buckets of (near-)
    * equal row count with each bucket's exact population and value range —
    * the distribution statistic an optimizer's selectivity estimates and
    * a profiler's skew report are built from (prof1 gives extrema only).
    *
    * Exact form (the gate): a global ntile sorts once on a single
    * partition — fine at profile time on a sampled/aggregated frame,
    * deliberately NOT the 100 TB path. Bucket aggregates are
    * tie-insensitive: ntile depends only on sorted position, and any
    * permutation of equal values leaves each bucket's (n, lo, hi)
    * unchanged, so the unqualified ORDER BY is deterministic here.
    * [[equiDepthApprox]] is the scale path (no global sort).
    */
  def prof2EquiDepthHistogram(spark: SparkSession, dir: String): DataFrame =
    equiDepthExact(t(spark, dir, "events"), "value", 8)

  private[graft] def equiDepthExact(src: DataFrame, c: String, nb: Int): DataFrame =
    src.select(col(c).as("v")).filter(col("v").isNotNull)
      .select(ntile(nb).over(Window.orderBy(col("v"))).cast("long").as("bucket"),
        col("v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy("bucket")

  /** The 100 TB form of prof2: boundaries from one `approx_percentile`
    * aggregate (KLL-style mergeable sketch, map-side partials), then a
    * scan-local bucket assignment against the broadcast 1-row boundary
    * frame. The corpus itself never globally sorts — the only
    * single-partition stage merges per-partition boundary sketches into
    * ONE row (SketchSpec asserts no Window operator in the plan and
    * bounds the per-bucket count error against [[equiDepthExact]]).
    * Bucket of v = 1 + #boundaries STRICTLY below v — the one cut-array
    * convention shared with drift1's PSI bucketing, so boundary-tied
    * mass lands in the lower bucket in both and sketch cuts interchange
    * between the two. Buckets partition the domain exactly even when the
    * sketch's boundary values are approximate.
    */
  private[graft] def equiDepthApprox(src: DataFrame, c: String, nb: Int): DataFrame = {
    val vals = src.select(col(c).as("v")).filter(col("v").isNotNull)
    val cuts = vals.agg(approx_percentile(col("v"),
      array((1 until nb).map(i => lit(i.toDouble / nb)): _*), lit(10000))
      .as("cuts"))
    vals.join(broadcast(cuts))
      .select(col("v"),
        aggregate(col("cuts"), lit(1L),
          (acc, cut) => acc + when(col("v") > cut, 1L).otherwise(0L))
          .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy("bucket")
  }

  /** prof3 — pairwise correlation profile: Pearson r and sample
    * covariance for every pair of profiled numeric columns, the
    * "which features are redundant / which move together" readout a
    * feature-engineering pass runs right after prof1's univariate stats.
    * ONE aggregate scan computes every pair's co-moments (corr and
    * covar_samp are ordinary map-side-partial aggregates); the per-pair
    * rows explode out of the single 1-row result — prof1's long-format
    * convention, so the plan cannot re-run the aggregate per pair.
    * Pearson r is dimensionless in [-1, 1] (6-decimal rounding is miles
    * from the co-moment association error); covariance carries the
    * columns' units and scale, so it rounds at 2 like the money columns.
    */
  def prof3CorrelationMatrix(spark: SparkSession, dir: String): DataFrame =
    corrProfile(t(spark, dir, "lineitem"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  private[graft] def corrProfile(src: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.flatMap { case (a, b) =>
      Seq(r6s(corr(col(a), col(b))).as(s"r_${a}_$b"),
        r2s(covar_samp(col(a), col(b))).as(s"c_${a}_$b"))
    }
    src.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("col_x"), lit(b).as("col_y"),
          col(s"r_${a}_$b").as("pearson_r"),
          col(s"c_${a}_$b").as("covariance"))
      }: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("p.pearson_r"),
        col("p.covariance"))
      .orderBy("col_x", "col_y")
  }

  /** prof6 — Spearman rank correlation between two DISCRETE numeric
    * columns (quantity × discount) with textbook average-rank tie
    * handling: the monotone-association complement to prof3's Pearson —
    * what a profiling layer reports when the relationship is nonlinear
    * or outlier-heavy.
    *
    * Scale shape: a global rank would need a corpus sort; instead each
    * column's AVERAGE RANKS are derived on its DISTINCT-VALUE frame
    * (50 × 11 rows here — the single-partition window is over that tiny
    * frame, d5's count-frame convention) as `cum_before + (cnt+1)/2`,
    * then broadcast back onto one fact scan feeding a single corr
    * aggregate. Three column-pruned scans total (two 1-column rank
    * builds + the pair scan); ranks are exact halves of integers, so
    * only corr's co-moment summation needs the 6-decimal grid, and the
    * signed ρ follows the ±0 convention.
    */
  def prof6Spearman(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spearmanCore(t(spark, dir, "lineitem")
      .select($"l_quantity".as("x"), $"l_discount".as("y")))
  }

  /** prof6 over an explicit (x, y) frame — StatsSpec drives the rank
    * axioms: ρ = 1 under any strictly monotone map of x, −1 under an
    * order-reversing map, and tie-stability.
    */
  private[graft] def spearmanCore(li: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def rankMap(c: String): DataFrame =
      li.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .withColumn("cum",
          sum(col("cnt")).over(Window.orderBy(col(c))) - col("cnt"))
        .select(col(c), (col("cum") + (col("cnt") + lit(1)) / 2.0).as(s"r_$c"))
    li.join(broadcast(rankMap("x")), "x")
      .join(broadcast(rankMap("y")), "y")
      .agg(
        r6s(corr(col("r_x"), col("r_y"))).as("spearman_rho"),
        count(lit(1)).as("n"),
        count_distinct(col("x")).as("nx_distinct"),
        count_distinct(col("y")).as("ny_distinct"))
  }

  /** prof5 — equi-WIDTH histogram with the Freedman–Diaconis bin width
    * `2·IQR/∛n` (the robust default every plotting/profiling library
    * reaches for), complementing prof2's equi-DEPTH buckets: equi-depth
    * answers "where are the quantiles", equi-width "what does the shape
    * look like" — a profiling layer needs both.
    *
    * Scale shape: ONE stats aggregate (quartiles, min, max, count — the
    * quartiles swap to approx_percentile at 100 TB, prof2's convention)
    * broadcasts a 1-row cut spec; bin assignment is scan-local
    * arithmetic into an ordinary hash aggregate. Determinism: the width
    * rounds to 4 (the exact-percentile grain) before any division, and
    * `floor((v − min)/w)` on identical doubles is bit-identical on both
    * engines; the max value falls in its own (partial) terminal bin
    * rather than being clamped, so no boundary rule can diverge.
    */
  def prof5FdHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = t(spark, dir, "events").select($"value".as("v"))
      .filter($"v".isNotNull && !isnan($"v"))
    val stats = v.agg(
      round(expr("percentile(v, 0.25)"), 4).as("q1"),
      round(expr("percentile(v, 0.75)"), 4).as("q3"),
      min($"v").as("mn"), max($"v").as("mx"),
      count(lit(1)).as("n"))
    // width guard: a near-constant column rounds the FD width to 0 (or a
    // zero IQR makes it exactly 0), which would emit Inf/NaN bins here
    // and crash DuckDB's floor→BIGINT cast. Fall back to the rounded
    // value span (one terminal-partial bin), then 1.0 for a fully
    // constant column (single bin 0) — same CASE chain in the oracle.
    val w0 = round(lit(2.0) * ($"q3" - $"q1") / cbrt($"n"), 4)
    val span = round($"mx" - $"mn", 4)
    val spec = stats.select($"mn", $"mx",
      when(w0 > 0.0, w0).when(span > 0.0, span).otherwise(lit(1.0)).as("w"))
    v.join(broadcast(spec))
      .groupBy(floor(($"v" - $"mn") / $"w").cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min($"v"), 4).as("lo"), round(max($"v"), 4).as("hi"))
      .orderBy("bin")
  }

  /** prof10 — 2-D joint histogram (hour-of-day × value bin) over events:
    * the heatmap feed behind every "when do which magnitudes happen"
    * dashboard, and the joint-distribution complement to prof2/prof5's
    * marginals (prof4 gives one dependence NUMBER; this gives the
    * surface). Ten equi-width value bins from the global min/max, hour
    * from pure epoch integer arithmetic (`ms div 3600000 mod 24` — no
    * timezone codec on either engine), and each cell's share WITHIN its
    * hour so rows are comparable across traffic volumes.
    *
    * Scale shape: one stats aggregate (min/max — a 1-row broadcast),
    * then ONE fact-table hash aggregate to the ≤ 24×10 cell frame;
    * the share window runs over that tiny frame (prof4's count-frame
    * convention). Bin edges are identical IEEE expressions on both
    * engines; the max value clamps into bin 9 (`least`), and a
    * constant column degenerates to bin 0 (prof5's width-guard stance).
    */
  def prof10JointHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val v = t(spark, dir, "events")
      .select(expr("unix_millis(ts) div 3600000 % 24").as("hour_of_day"),
        $"value".as("v"))
      .filter($"v".isNotNull && !isnan($"v"))
    val bounds = v.agg(min($"v").as("mn"), max($"v").as("mx"))
    v.join(broadcast(bounds))
      .groupBy($"hour_of_day",
        when($"mx" === $"mn", lit(0L))
          .otherwise(least(floor(($"v" - $"mn") / ($"mx" - $"mn") * 10),
            lit(9L))).as("bin"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("share_of_hour", round($"n_events".cast("double") /
        sum($"n_events").over(Window.partitionBy($"hour_of_day")), 6))
      .orderBy("hour_of_day", "bin")
  }

  /** prof9 — Benford first-digit audit over `l_extendedprice`: observed
    * leading-significant-digit frequencies vs Benford's law
    * `log10(1 + 1/d)`, with the per-digit chi-square contribution — the
    * classic fraud/synthetic-data detector a profiling layer ships
    * (here it correctly reports that TPC-H-ish uniform prices are NOT
    * Benford — the operator is the divergence REPORT, not an assertion).
    *
    * Determinism: the leading digit is extracted through exact integer
    * arithmetic, not log10 — prices carry exactly 2 decimals, so
    * `round(v·100)` is an integer cents count and its first decimal
    * digit IS the first significant digit of v; integer→string is
    * engine-portable where double log10 near a power of 10 is a
    * last-ulp coin flip.
    *
    * Scale shape: one scan, digit extraction map-side, hash aggregate
    * onto a 9-row frame; expected counts and chi-square terms ride a
    * window total over those 9 rows.
    */
  def prof9Benford(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val digits = t(spark, dir, "lineitem")
      .select($"l_extendedprice".as("v")).filter($"v" > 0.0)
      .select(substring(round($"v" * 100.0, 0).cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = sum($"n").over(Window.partitionBy())
    val expP = log(10.0, lit(1.0) + lit(1.0) / $"digit")
    val expN = expP * total
    digits.select($"digit", $"n",
        r6($"n" / total).as("observed_p"),
        r6(expP).as("benford_p"),
        r6(($"n" - expN) * ($"n" - expN) / expN).as("chisq_term"))
      .orderBy("digit")
  }

  /** Set operations: customers with both urgent and low-priority orders
    * (INTERSECT), with urgent only (EXCEPT), and all with either (UNION
    * distinct), tagged and unioned.
    */
  def set1PriorityCustomers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = t(spark, dir, "orders")
    val urgent = ord.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct()
    val low = ord.filter($"o_orderpriority" === "5-LOW")
      .select($"o_custkey").distinct()
    val both = urgent.intersect(low).select(lit("both").as("tag"), $"o_custkey")
    val onlyU = urgent.except(low).select(lit("urgent_only").as("tag"), $"o_custkey")
    val either = urgent.union(low).distinct()
      .select(lit("either").as("tag"), $"o_custkey")
    both.unionAll(onlyU).unionAll(either).orderBy($"tag", $"o_custkey")
  }

  /** Multiset (ALL) set operations — the bag-semantics counterpart of
    * set1: per customer, urgent-order slots surviving INTERSECT ALL with
    * low-priority slots (min of the two multiplicities) and EXCEPT ALL
    * (the multiplicity difference), aggregated to (tag, custkey, n) so
    * the multiset cardinalities are what the gate checks. Both compile to
    * Catalyst's count-based multiset rewrites — one shuffle per side on
    * the value, never a row-by-row pairing.
    */
  def set2MultisetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = t(spark, dir, "orders")
    val urgent = ord.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val low = ord.filter($"o_orderpriority" === "5-LOW").select($"o_custkey")
    def counted(df: DataFrame, tag: String): DataFrame =
      df.groupBy($"o_custkey").agg(count(lit(1)).as("n"))
        .select(lit(tag).as("tag"), $"o_custkey", $"n")
    counted(urgent.intersectAll(low), "both_all")
      .unionAll(counted(urgent.exceptAll(low), "urgent_surplus"))
      .orderBy($"tag", $"o_custkey")
  }

  /** Top-k with a broadcast dimension join: 15 best-selling parts.
    * Aggregation runs on the fact side keys first; the sort is
    * TakeOrderedAndProject, never a full global sort.
    */
  def topkPartsByQuantity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .groupBy($"l_partkey")
      .agg(r2(sum($"l_quantity")).as("total_qty"))
      .join(broadcast(t(spark, dir, "part")), $"l_partkey" === $"p_partkey")
      .select($"p_name", $"l_partkey", $"total_qty")
      .orderBy($"total_qty".desc, $"l_partkey")
      .limit(15)
  }

  /** Rollup over nation x market segment with sentinel subtotal labels
    * (no null sort keys — oracle-portable).
    */
  def g1RollupAcctbal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .rollup($"n_name", $"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), r2(sum($"c_acctbal")).as("total_acctbal"))
      .select(coalesce($"n_name", lit("ALL")).as("nation"),
        coalesce($"c_mktsegment", lit("ALL")).as("segment"),
        $"n_customers", $"total_acctbal")
      .orderBy($"nation", $"segment")
  }

  /** Full cube over (status, priority): all four grouping-set levels with
    * sentinel labels — the remaining multi-dimensional aggregate shape
    * (rollup and explicit grouping sets are g1/g2).
    */
  def g3CubeOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), r2(sum($"o_totalprice")).as("total_price"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n_orders", $"total_price")
      .orderBy($"status", $"priority")
  }

  /** Full outer join: per-nation customer and supplier counts, keeping
    * nations present on only one side (zero-filled).
    */
  def j3FullOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = t(spark, dir, "customer")
      .groupBy($"c_nationkey").agg(count(lit(1)).as("n_customers"))
    val s = t(spark, dir, "supplier")
      .groupBy($"s_nationkey").agg(count(lit(1)).as("n_suppliers"))
    c.join(s, $"c_nationkey" === $"s_nationkey", "full_outer")
      .select(coalesce($"c_nationkey", $"s_nationkey").cast("long").as("nationkey"),
        coalesce($"n_customers", lit(0L)).as("n_customers"),
        coalesce($"n_suppliers", lit(0L)).as("n_suppliers"))
      .orderBy("nationkey")
  }

  /** j4 — Bloom-prefiltered fact-to-subset join: revenue of lineitems
    * whose order is URGENT, with the fact side prefiltered through a
    * Bloom filter built over the urgent order keys BEFORE the
    * authoritative equi-join. The RESULT is exactly the plain join's
    * (Bloom has no false negatives; its false positives die in the
    * join), so the DuckDB oracle is the plain join — this gate promotes
    * [[graft.functions.Sketches.bloomPrefilter]] from spec-only to a
    * first-class hash-checked operator.
    *
    * Scale shape: the filter is sketch-sized driver traffic (one small
    * aggregate over the already-filtered dimension side) and the probe
    * is a codegen'd scan-local `might_contain` — at 1000-executor scale
    * the ~95% of fact rows with non-urgent orders never enter the join
    * exchange. This is what AQE's runtime bloom injection does; stating
    * it explicitly makes the prefilter available where the optimizer's
    * heuristics would not fire (PlanSpec pins the might_contain filter
    * below the join). The dimension-side `count()` is the index-side
    * cardinality a real system reads from its metastore.
    */
  def j4BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urgent = t(spark, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_orderdate")
    val li = t(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val pre = graft.functions.Sketches.bloomPrefilter(
      li, urgent.select($"o_orderkey".as("l_orderkey")), "l_orderkey",
      expectedItems = urgent.count())
    // revenue accumulates as EXACT INTEGER CENTS (q11/sql2's convention):
    // the per-date double sums can land on a half-cent tie where the two
    // engines' summation orders round apart
    pre.join(urgent, $"l_orderkey" === $"o_orderkey")
      .select($"o_orderdate",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
      .groupBy($"o_orderdate")
      .agg(count(lit(1)).as("n_lines"),
        r2(sum($"cents") / 100.0).as("revenue"))
      .orderBy("o_orderdate")
  }

  /** Explicit grouping sets over orders: by status, by priority, grand
    * total — Spark's groupingSets API, sentinel-labeled.
    */
  def g2GroupingSetsOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = t(spark, dir, "orders")
    ord.groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq.empty),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), r2(sum($"o_totalprice")).as("total_price"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n_orders", $"total_price")
      .orderBy($"status", $"priority")
  }

  /** Write orders+lineitem as bucketed tables (8 buckets on the order
    * key, sorted within buckets) under session- and sf-scoped names —
    * ONE definition shared by the j5 gate and PlanSpec's shuffle-free
    * assertion. Idempotent per (session, sf): the "write once, join
    * many" lifecycle bucketing exists for.
    */
  private[graft] def bucketedOrderTables(
      spark: SparkSession, dir: String): (String, String) = {
    val tag = (spark.sparkContext.applicationId + "_" +
      new java.io.File(dir).getName).replaceAll("[^a-zA-Z0-9]", "_")
    val (to, tl) = (s"j5_orders_$tag", s"j5_lineitem_$tag")
    // Guards are PER TABLE and the writes are overwrite-mode: a first
    // call interrupted between the two saveAsTable commits must not
    // wedge the session (a single to-only guard would skip the missing
    // lineitem write forever and every later j5 would throw).
    // Repartitioning on the SAME hash the bucketer uses puts each
    // bucket in ONE file (a task holds exactly one bucket).
    if (!spark.catalog.tableExists(to))
      t(spark, dir, "orders")
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable(to)
    if (!spark.catalog.tableExists(tl))
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable(tl)
    (to, tl)
  }

  /** End-of-session hygiene for [[bucketedOrderTables]] (r19, the lake
    * `cleanupScratch` convention applied to the warehouse): each session
    * writes its own app-id-tagged j5 tables and, with Spark's default
    * in-memory catalog, a dead session leaves only the files behind —
    * audited at 110 stranded `spark-warehouse/j5_*` dirs (296 MB) across
    * 19 rounds, the same debris class as the r18 lake-scratch finding
    * (a standing suspect for the official box's "slow Spark-stack
    * mode"). Drops THIS session's tables through the catalog (managed →
    * files go with them), then sweeps j5 dirs of DEAD sessions — with a
    * 2-hour mtime guard so a concurrently-running session's live tables
    * are never deleted (sessions here live minutes). Never fails the
    * run; survivors are reported (Bench.reclaim's visibility rule).
    */
  private[graft] def cleanupBucketScratch(spark: SparkSession): Unit = try {
    spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("j5_"))
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    // Resolve the warehouse the session ACTUALLY writes (r19 ADVICE): the
    // old user.dir/spark-warehouse guess silently missed any session
    // configured with spark.sql.warehouse.dir elsewhere. Non-file
    // schemes (a real metastore warehouse on HDFS/S3) fall through to a
    // File whose listFiles is null — a no-op, correctly: this sweep is
    // local-scratch hygiene, not remote-storage GC.
    val raw = spark.conf.get("spark.sql.warehouse.dir",
      new java.io.File(sys.props("user.dir"), "spark-warehouse")
        .toURI.toString)
    val u = java.net.URI.create(raw.replace(" ", "%20"))
    val wh = if ("file".equals(u.getScheme)) new java.io.File(u.getPath)
      else if (u.getScheme == null) new java.io.File(raw)
      else new java.io.File("/nonexistent")
    val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).toSeq.flatten.foreach(rm)
      f.delete(): Unit
    }
    // Liveness by the NEWEST mtime anywhere in the dir (r19 ADVICE): a
    // long-lived concurrent session keeps writing files inside its table
    // dirs without necessarily touching the top-level dir's mtime, so
    // the old top-level check could reap a >2h-old session's LIVE
    // tables. The recursive max is control-plane cheap (tens of files
    // per j5 dir).
    def newest(f: java.io.File): Long =
      Option(f.listFiles).toSeq.flatten
        .foldLeft(f.lastModified())((m, c) => math.max(m, newest(c)))
    val stale = Option(wh.listFiles).toSeq.flatten
      .filter(f => f.getName.startsWith("j5_") && newest(f) < cutoff)
    stale.foreach(rm)
    val left = Option(wh.listFiles).toSeq.flatten
      .count(_.getName.startsWith("j5_"))
    if (left > 0)
      System.err.println(s"[bucket] warehouse cleanup left $left j5_* dir(s)" +
        " (younger than the 2h live-session guard)")
  } catch { case e: Throwable =>
    System.err.println(s"[bucket] warehouse cleanup failed: ${e.getMessage}")
  }

  /** j5 — bucketed co-located join: revenue per order priority from a
    * lineitem ⋈ orders join over tables BUCKETED on the join key — the
    * storage-layout answer to repeated large-large joins at 100 TB
    * (partitioning prunes scans, bucketing removes join shuffles; the
    * complement to lake1's pruning). Both sides read their matching
    * buckets directly: the join needs NO exchange and no sort
    * (PlanSpec pins the Exchange-free join subtree with broadcast
    * disabled); the only shuffle left is the final
    * priority-dimension-sized aggregate. The gate hashes the result
    * against the oracle's plain join, so the bucketed layout must be
    * CORRECT, not just fast — a row routed to the wrong bucket drops
    * from the join and breaks the hash.
    */
  def j5BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (to, tl) = bucketedOrderTables(spark, dir)
    spark.table(tl)
      .join(spark.table(to), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
          .as("revenue"))
      .orderBy($"o_orderpriority")
  }

  /** q23 — month-over-month revenue growth per nation: the reporting
    * staple layered on the q5-style star join — monthly revenue, the
    * previous month's, and the growth ratio, NULL for each nation's
    * first month (no fabricated 0% growth). Revenue accumulates in
    * EXACT integer 10⁻⁴ units (prices and discounts carry exactly 2
    * decimals, so `cents · (100 − disc_bp)` is an exact long) — this
    * query's (nation × month) grain actually LANDED a monthly sum on a
    * half-cent rounding boundary where the two engines' double
    * accumulation orders disagreed, the failure mode coarser-grained
    * revenue queries dodge by luck; integer sums remove it outright.
    * Growth then divides identical operands, so the 6-decimal ratio
    * cannot drift.
    *
    * Scale shape: the fact scan aggregates straight to the
    * (nation × month) frame (map-side combine; dimension joins
    * broadcast), and the lag window runs over that tiny frame — never
    * over lineitem.
    */
  def q23MomGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(t(spark, dir, "customer")),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(t(spark, dir, "nation")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name",
        date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg((sum(round($"l_extendedprice" * 100.0).cast("long") *
          (lit(100L) - round($"l_discount" * 100.0).cast("long")))
        / lit(10000.0)).as("revenue"))
    val w = Window.partitionBy($"n_name").orderBy($"month")
    monthly
      .withColumn("prev_revenue", lag($"revenue", 1).over(w))
      .select($"n_name", $"month", $"revenue", $"prev_revenue",
        r6s(($"revenue" - $"prev_revenue") / $"prev_revenue")
          .as("mom_growth"))
      .orderBy($"n_name", $"month")
  }

  /** Semi/anti joins as EXISTS / NOT EXISTS counts. */
  def j1SemiAntiCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = t(spark, dir, "customer")
    val ord = t(spark, dir, "orders")
    val supp = t(spark, dir, "supplier")
    val li = t(spark, dir, "lineitem")
    val withOrders = cust.join(ord, $"c_custkey" === $"o_custkey", "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("customers_with_orders").as("k"), $"n")
    val noSales = supp.join(li, $"s_suppkey" === $"l_suppkey", "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("suppliers_without_sales").as("k"), $"n")
    val noOrders = cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("customers_without_orders").as("k"), $"n")
    withOrders.unionAll(noSales).unionAll(noOrders).orderBy($"k")
  }

  /** Scalar function library showcase (string/date/math) — all
    * codegen-friendly builtins, no UDFs.
    */
  def s1ScalarFunctions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .select($"o_orderkey",
        year($"o_orderdate").cast("long").as("y"),
        month($"o_orderdate").cast("long").as("m"),
        // cast to date: Spark's date_trunc yields timestamp where
        // DuckDB's yields date — same VALUE, different arrow kind; the
        // hardened schema gate (tools/check_oracle.py) pins the kind
        date_trunc("month", $"o_orderdate").cast("date").as("month_start"),
        substring($"o_orderpriority", 1, 1).as("pri_digit"),
        concat_ws("|", $"o_orderstatus", $"o_orderpriority").as("tag"),
        lower($"o_orderpriority").as("pri_lower"),
        length($"o_orderpriority").cast("long").as("pri_len"),
        r6(sqrt($"o_totalprice")).as("price_sqrt"),
        r6(log($"o_totalprice")).as("price_ln"))
      .orderBy($"o_orderkey")
  }

  /** s2 — the calendar/datetime scalar surface s1 leaves out: ISO
    * weekday and week, quarter, day-of-year, month-end, month
    * arithmetic with end-of-month clamping, day differences against an
    * epoch anchor, and formatting. Engine-portability notes are the
    * point of this gate: Spark's `weekday` (0 = Monday) maps to
    * DuckDB's `isodow` via +1, `add_months` and `date + INTERVAL n
    * MONTH` share the same end-of-month clamp, and `weekofyear`/`week`
    * are both ISO. Scan-local projection, pushed column pruning, fully
    * codegen'd — the gate pins the SEMANTICS, not the plan.
    */
  def s2DatetimeFunctions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = to_date($"o_orderdate")
    t(spark, dir, "orders")
      .select($"o_orderkey",
        (weekday(d) + 1).cast("long").as("iso_dow"),
        weekofyear(d).cast("long").as("iso_week"),
        quarter(d).cast("long").as("qtr"),
        dayofyear(d).cast("long").as("doy"),
        last_day(d).as("month_end"),
        add_months(d, 3).as("plus_3m"),
        datediff(d, lit("1995-01-01").cast("date")).cast("long")
          .as("days_since_anchor"),
        date_format(d, "yyyy-MM").as("ym"))
      .orderBy($"o_orderkey")
  }

  /** Semi-structured extraction: parse the events.props JSON payload and
    * aggregate by a derived bucket (from_json is codegen'd; the whole plan
    * is scan -> project -> partial agg -> final agg).
    */
  def j2EventsJson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "events")
      .select(
        from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"),
        $"value")
      // sentinel for missing/malformed props (nullable sort keys order
      // differently across engines — module convention)
      .groupBy(coalesce(($"k" % 10).cast("long"), lit(-1L)).as("k_bucket"))
      .agg(count(lit(1)).as("n"), r2(sum($"value")).as("total_value"))
      .orderBy($"k_bucket")
  }

  /** TPC-H Q4-style: correlated EXISTS with an inequality — orders having
    * at least one line shipped more than 60 days after order date, counted
    * per priority. The EXISTS compiles to a left-semi join with the extra
    * non-equi condition attached; only the order key shuffles.
    */
  def q4LatePriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = t(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1998-01-01"))
    val li = t(spark, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
    ord.join(li,
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** TPC-H Q12-style conditional aggregation: priority mix per return
    * flag — CASE inside sums, single shuffle.
    */
  def q12PriorityMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hi = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    t(spark, dir, "lineitem").select($"l_orderkey", $"l_returnflag")
      .join(t(spark, dir, "orders").select($"o_orderkey", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  /** TPC-H Q14-style ratio aggregate: share of revenue from PROMO parts. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part").select($"p_partkey", $"p_type")),
        $"l_partkey" === $"p_partkey")
      .agg(round(lit(100.0) *
        sum(when($"p_type" === "PROMO", rev).otherwise(lit(0.0))) / sum(rev), 4)
        .as("promo_revenue_pct"))
  }

  /** TPC-H Q17-style correlated scalar subquery (per-part average),
    * expressed as aggregate + self-join: lines far below their part's
    * average quantity.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = t(spark, dir, "lineitem")
    val avgQty = li.groupBy($"l_partkey".as("ak"))
      .agg(avg($"l_quantity").as("aq"))
    li.join(avgQty, $"l_partkey" === $"ak")
      .filter($"l_quantity" < lit(0.5) * $"aq")
      .agg(r2(sum($"l_extendedprice") / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q6-style forecast-revenue: the pure scan-filter-aggregate probe
    * — every predicate pushes to the parquet scan (PushedFilters on
    * l_shipdate/l_discount/l_quantity), zero joins, one partial-then-final
    * aggregate of a single double. The canonical "is the scan path fast"
    * benchmark query.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01") && $"l_shipdate" < lit("1997-01-01") &&
        $"l_discount" >= 0.04 && $"l_discount" <= 0.06 && $"l_quantity" < 24)
      .agg(r2(sum($"l_extendedprice" * $"l_discount")).as("revenue"))
  }

  /** TPC-H Q18-style large-volume customers: orders whose total quantity
    * exceeds a threshold, with their customer. The per-order quantity
    * aggregate runs FIRST (one hash aggregate on l_orderkey, map-side
    * combine), the >threshold filter shrinks it to the few large orders,
    * and only then do orders and customer join — both joins are then
    * small-side broadcastable under AQE. The naive shape (join first,
    * aggregate the joined width) would shuffle customer columns through
    * the lineitem-sized exchange.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qty = t(spark, dir, "lineitem")
      .groupBy($"l_orderkey").agg(r2(sum($"l_quantity")).as("total_qty"))
      .filter($"total_qty" > 250.0)
    qty.join(t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(t(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey",
        // o_orderdate reads as TIMESTAMP_NTZ (ms parquet); the UTC-session
        // cast makes unix_millis applicable and matches the oracle's
        // epoch_ms of the naive value
        unix_millis($"o_orderdate".cast("timestamp")).as("o_orderdate_ms"),
        $"o_totalprice", $"total_qty")
      .orderBy($"total_qty".desc, $"o_orderkey")
  }

  /** TPC-H Q19-style disjunctive predicate join: revenue from three
    * brand/size/quantity bands OR-ed together. The p_partkey equi-join
    * stays an equi-join (broadcast of the 2k-row part dim) with the
    * disjunction as a post-join filter — Catalyst additionally derives
    * the OR-of-ANDs' common constraints for scan pruning. The
    * anti-pattern is a theta-join carrying the whole disjunction into
    * the join condition, which blocks broadcast-hash planning.
    */
  def q19BrandRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands =
      ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) && $"l_quantity".between(1, 20)) ||
      ($"p_brand" === "Brand#13" && $"p_size".between(10, 30) && $"l_quantity".between(10, 30)) ||
      ($"p_brand" === "Brand#23" && $"p_size".between(20, 50) && $"l_quantity".between(20, 50))
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part").select($"p_partkey", $"p_brand", $"p_size")),
        $"l_partkey" === $"p_partkey")
      .filter(bands)
      .agg(r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q7-style volume shipping between two nations: the nation dim
    * joins BOTH fact sides under different roles (supplier nation,
    * customer nation). The nation filter is pushed into each dimension
    * subtree BEFORE the fact joins — supplier and customer shrink to the
    * two nations' members and broadcast, so lineitem rows from all other
    * nations drop at the (broadcast) join instead of surviving to a
    * post-join disjunction over the full fact table; only the
    * cross-direction pair predicate remains post-join, over two tiny
    * string columns.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nations = Seq("NATION_7", "NATION_12")
    val nat = t(spark, dir, "nation").filter($"n_name".isin(nations: _*))
    val supp = t(spark, dir, "supplier")
      .join(broadcast(nat.select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"snk")
      .select($"s_suppkey", $"supp_nation")
    val cust = t(spark, dir, "customer")
      .join(broadcast(nat.select($"n_nationkey".as("cnk"), $"n_name".as("cust_nation"))),
        $"c_nationkey" === $"cnk")
      .select($"c_custkey", $"cust_nation")
    t(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01") && $"l_shipdate" < lit("1998-01-01"))
      .join(t(spark, dir, "orders").select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** TPC-H Q8-style market share: of the AMERICA-region customers' ECONOMY
    * part revenue, the share supplied by one nation, per order year — a
    * conditional-sum ratio over a 5-way join where every dimension side
    * (part filter, region-filtered customer ids, nation-labeled
    * suppliers) broadcasts and only lineitem↔orders shuffles.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val amerCust = t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(spark, dir, "region").filter($"r_name" === "AMERICA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey")
    val suppNation = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")
          .select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"snk")
      .select($"s_suppkey", $"supp_nation")
    val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part").filter($"p_type" === "ECONOMY")
        .select($"p_partkey")), $"l_partkey" === $"p_partkey")
      .join(t(spark, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1998-01-01")),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(amerCust), $"o_custkey" === $"c_custkey")
      .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(round(
        sum(when($"supp_nation" === "NATION_5", rev).otherwise(lit(0.0))) / sum(rev), 6)
        .as("mkt_share"))
      .orderBy($"o_year")
  }

  /** TPC-H Q9-style product-type profit by supplier nation and year.
    * The testdata has no partsupp, so unit cost is proxied by the part's
    * retail price (2-decimal × integral quantity keeps every term exactly
    * 2-decimal, preserving the module's rounding-safety convention).
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val profit = $"l_extendedprice" * (lit(1.0) - $"l_discount") -
      $"p_retailprice" * $"l_quantity"
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part").filter($"p_name".like("%bolt%"))
        .select($"p_partkey", $"p_retailprice")), $"l_partkey" === $"p_partkey")
      .join(broadcast(t(spark, dir, "supplier").select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(t(spark, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), year($"l_shipdate").cast("long").as("l_year"))
      .agg(r2(sum(profit)).as("profit"))
      .orderBy($"nation", $"l_year".desc)
  }

  /** TPC-H Q15-style top supplier: quarterly revenue per supplier, then
    * the supplier(s) achieving the maximum — the aggregate-vs-its-own-max
    * shape. The max is a 1-row aggregate broadcast back against the
    * per-supplier frame (never a global sort), and ties all surface (TPC-H
    * semantics). Comparison happens on the 2-rounded revenue so both
    * engines pick identical winners.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val revPerSupp = t(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01") && $"l_shipdate" < lit("1996-04-01"))
      .groupBy($"l_suppkey")
      .agg(r2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("total_revenue"))
    val mx = revPerSupp.agg(max($"total_revenue").as("max_revenue"))
    revPerSupp.join(broadcast(mx), $"total_revenue" === $"max_revenue")
      .join(broadcast(t(spark, dir, "supplier").select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  /** TPC-H Q16-style supplier relationship counts: distinct suppliers able
    * to supply each retained (brand, type, size) combination — the
    * count-distinct-over-join shape. The part filter broadcasts into
    * lineitem (the supplier-part bridge here — no partsupp in the
    * testdata); suppliers with negative balance are excluded via a
    * broadcast anti join (the complaints-exclusion analog). The distinct
    * aggregate shuffles once on the grouping keys with partial distinct
    * map-side.
    */
  def q16SupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sizes = Seq(1, 5, 10, 15, 20, 25, 30, 35)
    val parts = t(spark, dir, "part")
      .filter($"p_brand" =!= "Brand#5" && $"p_size".isin(sizes: _*))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val badSupp = t(spark, dir, "supplier").filter($"s_acctbal" < 0)
      .select($"s_suppkey".as("bad_suppkey"))
    t(spark, dir, "lineitem").select($"l_partkey", $"l_suppkey")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(badSupp), $"l_suppkey" === $"bad_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(count_distinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  /** TPC-H Q22-style idle rich customers: customers above the global
    * average positive balance with no orders at all, summarized per market
    * segment — scalar aggregate subquery (1-row broadcast) + anti join.
    */
  def q22IdleBalance(spark: SparkSession, dir: String): DataFrame =
    q22Core(t(spark, dir, "customer"), t(spark, dir, "orders"))

  /** q22's logic over explicit frames — at the driver's gated scale
    * factors every above-average customer happens to have orders (the
    * oracle match is real but the output empty), so InvariantSpec drives
    * this core with a planted corpus that exercises both verdict paths.
    */
  private[graft] def q22Core(customer: DataFrame, orders: DataFrame): DataFrame = {
    import customer.sparkSession.implicits._
    // threshold rounded per the module convention (Tables.r6): the filter
    // then compares 2-decimal balances against an identical 6-decimal
    // constant on both engines, instead of an unrounded double aggregate
    // whose partition-order summation error could flip a boundary customer
    val avgBal = customer.filter($"c_acctbal" > 0.0)
      .agg(r6(avg($"c_acctbal")).as("avg_bal"))
    customer
      .join(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(orders.select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_custs"), r2(sum($"c_acctbal")).as("total_bal"))
      .orderBy($"c_mktsegment")
  }

  /** TPC-H Q21-style dual correlated existentials: suppliers who were the
    * SOLE supplier of a multi-line order — the oracle states it as
    * EXISTS (another line of the same order) AND NOT EXISTS (a line from
    * a different supplier), the classic double-correlated self-reference
    * on the fact table.
    *
    * Spark-first form: both existentials collapse into a two-level
    * aggregate with NO distinct-aggregate anywhere — a naive
    * `agg(count_distinct(linenumber), count_distinct(suppkey))` makes
    * Catalyst insert an Expand that triples every fact row entering the
    * first aggregate (measured ~4× the family median at sf0.1). Instead:
    * (1) dedup the (orderkey, linenumber, suppkey) triple — a plain
    * hash aggregate whose map-side combine ships only distinct triples;
    * (2) per order, `min(suppkey)==max(suppkey)` decides sole-supplier
    * (keys are non-null in the fact table), and GIVEN one supplier the
    * triple count IS the distinct-linenumber count, so "multi-line"
    * (>= 2 DISTINCT line numbers — the synthetic data repeats line
    * numbers) is just `count > 1`. One fact scan, never self-joined, no
    * Expand (PlanSpec pins both); a literal EXISTS/NOT-EXISTS
    * translation would plan two extra corpus-sized semi/anti joins. The
    * per-order frame (one row per order) then broadcast-joins the
    * supplier dimension, so the closing count per supplier needs no
    * distinct either.
    */
  def q21SoleSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perOrder = t(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_suppkey")
      .distinct()
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        min($"l_suppkey").as("the_supp"),
        max($"l_suppkey").as("max_supp"))
      .filter($"n_lines" > 1 && $"the_supp" === $"max_supp")
    perOrder
      .join(broadcast(t(spark, dir, "supplier")), $"the_supp" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("n_sole_orders"))
      .orderBy($"n_sole_orders".desc, $"s_name")
  }

  /** TPC-H Q2-style minimum-cost supplier: for each qualifying part, the
    * EUROPE supplier offering it at the lowest unit cost — the
    * aggregate-vs-its-own-min-per-group shape (Q2's correlated MIN
    * subquery). No partsupp table exists in the testdata, so as in q16
    * the lineitem fact is the supplier↔part bridge: a (part, supplier)
    * unit cost is the average observed `l_extendedprice / l_quantity`.
    *
    * Scale shape: both dimension filters broadcast INTO the fact scan
    * (region-filtered suppliers, size/type-filtered parts), so the hash
    * aggregate only sees qualifying lines; the per-part MIN then
    * self-joins the (part × supplier)-sized cost frame on p_partkey —
    * co-partitioned, never a global sort. Winners compare on the
    * 6-rounded cost so both engines pick identical suppliers; ties all
    * surface (Q2 semantics). The final sort appends s_suppkey after
    * p_partkey — within one part, tied winners differ only by supplier —
    * so the LIMIT-100 prefix is unique BY CONSTRUCTION (both engines),
    * not by accident of unique s_name in the testdata; the key is
    * dropped from the projection after the TakeOrdered.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame =
    q2Core(t(spark, dir, "lineitem"), t(spark, dir, "part"),
      t(spark, dir, "supplier"), t(spark, dir, "nation"),
      t(spark, dir, "region"))

  /** q2 over explicit frames — InvariantSpec plants a cost tie and
    * asserts BOTH min-cost suppliers surface (Q2 semantics), and that a
    * cheaper supplier OUTSIDE the region never wins.
    */
  private[graft] def q2Core(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    import lineitem.sparkSession.implicits._
    val europeSupp = supplier
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region.filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val parts = part
      .filter($"p_type" === "STANDARD" && $"p_size" <= 15)
      .select($"p_partkey", $"p_name")
    val costs = lineitem
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice", $"l_quantity")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(europeSupp), $"l_suppkey" === $"s_suppkey")
      .groupBy($"p_partkey", $"p_name", $"s_suppkey", $"s_name",
        $"s_acctbal", $"n_name")
      .agg(r6(avg($"l_extendedprice" / $"l_quantity")).as("supp_cost"))
    val minCost = costs.groupBy($"p_partkey".as("mc_partkey"))
      .agg(min($"supp_cost").as("min_cost"))
    costs
      .join(minCost,
        $"p_partkey" === $"mc_partkey" && $"supp_cost" === $"min_cost")
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey",
        $"s_suppkey")
      .limit(100)
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_name",
        $"supp_cost")
  }

  /** TPC-H Q11-style important stock: parts whose value supplied from one
    * nation exceeds a fixed fraction of that nation's total supplied
    * value — the global-fraction threshold shape (Q11's HAVING against a
    * scalar subquery). Lineitem is the supplier↔part bridge (no
    * partsupp), part value = discounted revenue supplied by the nation's
    * suppliers.
    *
    * Determinism: values accumulate as EXACT INTEGER CENTS (per-line
    * `round(price·(1−disc)·100)` — sql2's convention), so per-part sums,
    * the grand total, and the threshold comparison
    * `value_cents · 1000 > total_cents` (value > 0.1% of total, stated
    * multiplicatively) are order-independent integer arithmetic on both
    * engines — no float summation near the HAVING boundary.
    *
    * Scale shape: nation's suppliers broadcast into the fact scan; ONE
    * hash aggregate keyed by part; the grand total re-aggregates the
    * per-part frame (map-side combine) into a 1-row broadcast. The
    * per-part frame is scope-persisted: the total's HAVING threshold and
    * the probe side both consume it, and exchange reuse does NOT fire
    * across a global-aggregate branch (measured — the unpersisted plan
    * scans lineitem twice), so the cache is what keeps the fact table
    * single-scan.
    */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame =
    q11Core(t(spark, dir, "lineitem"), t(spark, dir, "supplier"),
      t(spark, dir, "nation"))

  /** q11 over explicit frames — InvariantSpec plants a part EXACTLY on
    * the 0.1% threshold (must be excluded: strictly greater) and one a
    * cent above it (must be included).
    */
  private[graft] def q11Core(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame): DataFrame = {
    import lineitem.sparkSession.implicits._
    val natSupp = supplier
      .join(broadcast(nation.filter($"n_name" === "NATION_7")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val partValue = graft.engine.Caching.scopedPersist(
      lineitem
        .select($"l_partkey", $"l_suppkey",
          round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
            .cast("long").as("cents"))
        .join(broadcast(natSupp), $"l_suppkey" === $"s_suppkey")
        .groupBy($"l_partkey")
        .agg(sum($"cents").as("value_cents")))
    val total = partValue.agg(sum($"value_cents").as("total_cents"))
    partValue
      .join(broadcast(total))
      .filter($"value_cents" * 1000 > $"total_cents")
      .select($"l_partkey".as("p_partkey"),
        r2($"value_cents" / 100.0).as("part_value"))
      .orderBy($"part_value".desc, $"p_partkey")
  }

  /** TPC-H Q20-style excess suppliers: suppliers who in one year shipped
    * MORE THAN HALF of some red part's total shipped quantity — Q20's
    * nested correlated-threshold IN chain, restated as one per-(part,
    * supplier) aggregate joined against its own per-part total. The
    * dominance test `2·qty > total_qty` is stated multiplicatively:
    * l_quantity is integral, so both sums are exact integer-valued
    * doubles and the comparison is order-independent on both engines.
    *
    * Scale shape: the name-filtered part dimension broadcasts into the
    * year-pruned fact scan; the per-part total REUSES the per-(part,
    * supplier) partial aggregate (a second map-side-combined hash
    * aggregate over the already-small frame, not a second fact scan);
    * the threshold join is co-partitioned on l_partkey. The distinct
    * supplier set then broadcast-joins the supplier dimension.
    */
  def q20ExcessSuppliers(spark: SparkSession, dir: String): DataFrame =
    q20Core(t(spark, dir, "lineitem"), t(spark, dir, "part"),
      t(spark, dir, "supplier"))

  /** q20 over explicit frames — InvariantSpec plants the three edges the
    * gated corpus may never hit: exactly half the part's volume (strict >
    * excludes), a SOLE supplier of a part (n_suppliers > 1 excludes — a
    * monopoly is not "excess"), and a dominant share of a non-matching
    * part (name filter excludes).
    */
  private[graft] def q20Core(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame): DataFrame = {
    import lineitem.sparkSession.implicits._
    val redParts = part
      .filter($"p_name".like("%red%")).select($"p_partkey")
    val perSuppPart = lineitem
      .filter($"l_shipdate" >= lit("1996-01-01") && $"l_shipdate" < lit("1997-01-01"))
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
      .join(broadcast(redParts), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity").as("qty"))
    val perPart = perSuppPart.groupBy($"l_partkey".as("pp_partkey"))
      .agg(sum($"qty").as("total_qty"), count(lit(1)).as("n_suppliers"))
    perSuppPart
      .join(perPart, $"l_partkey" === $"pp_partkey")
      .filter($"qty" * 2 > $"total_qty" && $"n_suppliers" > 1)
      .select($"l_suppkey").distinct()
      .join(broadcast(supplier), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal")
      .orderBy($"s_suppkey")
  }

  /** prof4 — mutual information between two categorical columns (order
    * status × order priority): the feature-relevance / redundancy readout
    * a feature-engineering pass runs on categorical pairs, completing
    * prof3's numeric co-movement picture. Reports MI in nats, both
    * marginal entropies, and the normalized MI `mi / sqrt(h_x·h_y)`.
    *
    * ONE fact-table hash aggregate produces the |X|·|Y|-sized contingency
    * frame; marginals are window sums OVER THAT TINY FRAME (d5's
    * count-frame convention — the fact table is never re-scanned), and
    * the entropies fold into the same single pass via
    * Σ_xy p(x,y)·ln p(x) = Σ_x p(x)·ln p(x). All probabilities are IEEE
    * divisions of exact integer counts, identical on both engines; ln
    * differs by ≤1 ulp (absorbed by 6-decimal rounding, t14's note). MI
    * and NMI are signed expressions that can round to zero → r6s. A
    * single-valued column has zero marginal entropy, making NMI's
    * denominator 0 and the readout 0/0 → NaN; NMI is null in that case
    * (mirrored in the oracle) — MI is still 0 and the entropies still
    * report, so the degenerate profile stays informative.
    */
  def prof4MutualInformation(spark: SparkSession, dir: String): DataFrame =
    miProfile(t(spark, dir, "orders"), "o_orderstatus", "o_orderpriority")

  /** prof4 over an explicit frame — PropertySpec drives the MI axioms
    * (independence → 0, determinism → NMI 1, symmetry) on planted
    * contingencies.
    */
  private[graft] def miProfile(src: DataFrame, xc: String, yc: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import src.sparkSession.implicits._
    val joint = src
      .groupBy(col(xc), col(yc))
      .agg(count(lit(1)).as("nxy"))
    // contingency-frame windows: |X|·|Y| rows, single partition by design
    val nx = sum($"nxy").over(Window.partitionBy(col(xc)))
    val ny = sum($"nxy").over(Window.partitionBy(col(yc)))
    val n = sum($"nxy").over(Window.partitionBy())
    joint
      .select(
        ($"nxy".cast("double") / n).as("p"),
        (nx.cast("double") / n).as("px"),
        (ny.cast("double") / n).as("py"),
        n.as("n"))
      .agg(
        max($"n").as("n_rows"),
        r6s(sum($"p" * log($"p" / ($"px" * $"py")))).as("mi_nats"),
        r6(-sum($"p" * log($"px"))).as("h_x"),
        r6(-sum($"p" * log($"py"))).as("h_y"),
        // zero-entropy guard: ln(px) ≤ 0 so the marginal sum is 0 iff the
        // column is single-valued; either side degenerate → null, not NaN
        r6s(when(sum($"p" * log($"px")) < 0.0 && sum($"p" * log($"py")) < 0.0,
          sum($"p" * log($"p" / ($"px" * $"py"))) /
            sqrt(sum($"p" * log($"px")) * sum($"p" * log($"py"))))).as("nmi"))
  }

  /** LIKE-pattern filter with aggregation (string predicate pushdown). */
  def q13NamePattern(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "part")
      .filter($"p_name".like("%blue%") || $"p_name".like("%red%"))
      .groupBy($"p_type")
      .agg(count(lit(1)).as("n_parts"),
        // r6, not r2: averages of 2-decimal values land ON the .xx5
        // boundary often enough that engines' differing half-up
        // resolutions diverge (sql2's measured failure); 6 decimals moves
        // the boundary to the 7th place, the module's average convention
        r6(avg($"p_retailprice")).as("avg_price"))
      .orderBy($"p_type")
  }

  /** Pivot: account balance per nation pivoted across market segments
    * (explicit value list keeps columns deterministic; compiles to one
    * hash aggregate with CASE projections — no extra shuffle vs groupBy).
    */
  def p1PivotSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .pivot("c_mktsegment", segs)
      .agg(r2(sum($"c_acctbal")))
      .orderBy($"n_name")
  }

  /** m1 — unpivot/melt: the wide→long reshape completing p1's pivot
    * (long→wide) — how a metrics table becomes the (entity, measure,
    * value) long format every generic profiler/monitor consumes.
    * Compiles to a Generate(stack) projection — per-row expansion inside
    * whole-stage codegen, NO shuffle and NO join; the deterministic
    * keyed sample keeps the gate dump bounded while exercising the full
    * expansion.
    */
  def m1Unpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_orderkey" % 50 === 0)
      .select($"l_orderkey", $"l_linenumber",
        expr("""stack(4,
          'discount', l_discount,
          'extendedprice', l_extendedprice,
          'quantity', l_quantity,
          'tax', l_tax) AS (measure, value)"""))
      // value joins the sort keys: the synthetic data repeats
      // (orderkey, linenumber) pairs, so the measure alone is not a
      // total order across the duplicates
      .orderBy("l_orderkey", "l_linenumber", "measure", "value")
  }

  /** Array function library over the embedding vectors: size, min/max,
    * indexing, slices, sorted prefix — the ArrayType scalar surface.
    */
  def a1ArrayFunctions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "embeddings")
      .select($"vec_id",
        size($"embedding").cast("long").as("dim"),
        // embedding components are signed and can round to zero → the
        // ±0 normalization convention (SURVEY §8) on every rounded value
        (round(array_min($"embedding").cast("double"), 4) + lit(0)).as("v_min"),
        (round(array_max($"embedding").cast("double"), 4) + lit(0)).as("v_max"),
        (round(element_at($"embedding", 1).cast("double"), 4) + lit(0)).as("v_first"),
        (round(element_at(slice($"embedding", 1, 4), 4).cast("double"), 4) + lit(0)).as("v4"),
        (round(element_at(sort_array($"embedding"), 1).cast("double"), 4) + lit(0)).as("sorted_first"))
      .orderBy($"vec_id")
  }

  /** Exact percentiles (linear interpolation) per market segment — the
    * sort-based aggregate family.
    */
  def pct1Percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer")
      .groupBy($"c_mktsegment")
      .agg(
        round(expr("percentile(c_acctbal, 0.5)"), 4).as("median_acctbal"),
        round(expr("percentile(c_acctbal, 0.9)"), 4).as("p90_acctbal"),
        count(lit(1)).as("n"))
      .orderBy($"c_mktsegment")
  }

  /** One ANSI-SQL text shared VERBATIM by both engines: Spark runs it via
    * `spark.sql` over temp views, DuckDB runs the identical string as the
    * oracle — demonstrating the SQL facade next to the DataFrame surface.
    */
  private[operators] val SharedRevenueSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  def sql1RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "nation")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(SharedRevenueSql)
  }

  /** Correlated scalar subqueries in the SELECT list, shared VERBATIM with
    * the oracle like sql1 — the shape that exercises Catalyst's subquery
    * DECORRELATION: the per-row subqueries must rewrite to aggregate-then-
    * join (PlanSpec asserts no per-row subquery survives into the physical
    * plan), because a literal per-row execution is the O(rows × table)
    * anti-pattern that cannot run at scale. count(*) over an empty
    * correlation is 0 on both engines; the average is null for uncovered
    * keys and both engines emit it as a null cell.
    *
    * The average is computed in CENTS as exact integer arithmetic (the
    * sim7/sim8 micro-unit convention, in SQL): `round(avg(double), 2)`
    * FAILED the sf0.001 gate — an average of 2-decimal values lands on
    * the .xx5 boundary whenever the group count divides the cent sum that
    * way (with n=2, half the time), and Spark's BigDecimal HALF_UP and
    * DuckDB's `std::round(x*100)/100` resolve that boundary differently.
    * Per-value `round(x*100)` is unambiguous (inputs are within 1e-10 of
    * integers), the integer sum is exact, and both engines then round the
    * IDENTICAL quotient double with the same half-away-from-zero rule.
    */
  private[operators] val SharedScalarSubquerySql: String =
    """SELECT n_name,
      |  (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey)
      |    AS n_suppliers,
      |  (SELECT CAST(round(sum(CAST(round(c_acctbal * 100) AS BIGINT))
      |                     / count(*)) AS BIGINT)
      |   FROM customer
      |   WHERE c_nationkey = n_nationkey) AS avg_cust_bal_cents
      |FROM nation
      |ORDER BY n_name""".stripMargin

  def sql2CorrelatedScalar(spark: SparkSession, dir: String): DataFrame = {
    Seq("nation", "supplier", "customer")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(SharedScalarSubquerySql)
  }

  /** Window functions inside the verbatim-shared SQL facade (sql1/sql2's
    * third leg): rank, share-of-total and running share from one
    * aggregate + window text both engines parse and execute IDENTICALLY
    * — the dialect-portability claim extended to the window clause.
    */
  private[operators] val SharedWindowSql: String =
    """SELECT o_orderpriority, n, rnk,
      |  round(share, 6) AS share,
      |  round(cum_share, 6) AS cum_share
      |FROM (
      |  SELECT o_orderpriority, n,
      |    row_number() OVER (ORDER BY n DESC, o_orderpriority) AS rnk,
      |    n / CAST(sum(n) OVER () AS DOUBLE) AS share,
      |    sum(n) OVER (ORDER BY n DESC, o_orderpriority
      |      ROWS UNBOUNDED PRECEDING)
      |      / CAST(sum(n) OVER () AS DOUBLE) AS cum_share
      |  FROM (
      |    SELECT o_orderpriority, count(*) AS n
      |    FROM orders GROUP BY o_orderpriority) a) b
      |ORDER BY rnk""".stripMargin

  def sql3WindowFacade(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(SharedWindowSql)
  }

  /** sql4's verbatim-shared text — the FOURTH facade, and the first to
    * exercise `WITH RECURSIVE` (Spark 4.1 and DuckDB both run this exact
    * string): the region→nation→customer hierarchy walked as a
    * parent-child edge list from each region root, rolling up node
    * counts and account-balance mass per depth. The recursion is
    * structurally ACYCLIC (edges only descend the 3-level star), so the
    * UNION ALL recursion terminates at depth 2 with no cycle guard —
    * the shape every org-chart / BOM / category-tree rollup takes.
    * Balance accumulates as exact integer cents (dq6's convention)
    * inside the recursion; the single division lands on the 2-grid.
    *
    * Scale shape: each recursive step is one equi-join of the frontier
    * against the edge list plus a union — exactly the iterated-join plan
    * gr5/pr1 unroll by hand, here delegated to the engine's recursion
    * operator (Spark plans it as a UnionLoop). Frontier rows carry only
    * (root, node, depth, cents); the edge list would be broadcast or
    * bucketed at scale.
    */
  private[operators] val SharedRecursiveSql: String =
    """WITH RECURSIVE
      | edges AS (
      |  SELECT 'R' || r_regionkey AS parent, 'N' || n_nationkey AS child,
      |    CAST(0 AS BIGINT) AS cents
      |  FROM nation JOIN region ON n_regionkey = r_regionkey
      |  UNION ALL
      |  SELECT 'N' || c_nationkey, 'C' || c_custkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT)
      |  FROM customer),
      | walk(root, node, depth, cents) AS (
      |  SELECT 'R' || r_regionkey, 'R' || r_regionkey, CAST(0 AS BIGINT),
      |    CAST(0 AS BIGINT)
      |  FROM region
      |  UNION ALL
      |  SELECT w.root, e.child, w.depth + 1, e.cents
      |  FROM walk w JOIN edges e ON e.parent = w.node)
      |SELECT root, depth, count(*) AS n_nodes,
      |  round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS balance
      |FROM walk GROUP BY root, depth
      |ORDER BY root, depth""".stripMargin

  /** Bench budget: 1.0 s at sf0.1 local[32] (r13 box, in-suite
    * min-of-3; normalize cross-box via the r14+ bench probe) — UnionLoop
    * over the 3-level region→nation→customer walk; cost is the loop's
    * fixed per-iteration planning, not data.
    */
  def sql4RecursiveRollup(spark: SparkSession, dir: String): DataFrame = {
    Seq("region", "nation", "customer")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(SharedRecursiveSql)
  }

  /** seg1 — RFM customer segmentation: per customer the recency (days
    * since last order at the corpus watermark), frequency (order count)
    * and monetary value (lifetime spend), each scored into quintiles by
    * `ntile(5)` over a TOTAL order (metric + custkey tiebreak — ntile's
    * bucket boundaries are deterministic only under a total order, the
    * ab8 nulls lesson applied to ranking), plus the classic segment
    * labels the lifecycle-marketing playbook keys campaigns on
    * (champion / loyal / new / at-risk / hibernating). The north-star
    * reading: the same recency-frequency-volume triage, applied to data
    * SOURCES, prioritizes which feeds a crawl scheduler revisits.
    *
    * Scale shape: one shuffle on o_custkey (hash aggregate with map-side
    * combine), then three window ranks over the CUSTOMER-domain frame.
    * This exact form is the ORACLE-SEMANTICS twin: its three global
    * ntile sorts are single-partition by definition, so the deployable
    * path is [[seg1RfmApproxCore]] — percentile_approx cuts broadcast
    * into scan-local CASE scoring, no global sort anywhere (the
    * prof2/prof8 exact-vs-sketch convention; InvariantSpec pins
    * tie-free agreement).
    * Recency counts exact integer days in pure DATE arithmetic (no
    * timezone codec on either engine — the orders column is NTZ);
    * spend accumulates exact integer cents (dq6's convention).
    */
  /** Per-customer RFM metric frame shared by the exact ([[seg1Rfm]]) and
    * production ([[seg1RfmApproxCore]]) paths: ONE shuffle on o_custkey
    * (hash aggregate, map-side combine), recency against a BROADCAST
    * one-row watermark — no partition-less Window (the old global-max
    * window moved the whole customer frame to one partition before a
    * single ntile even ran). Scoped-persisted: the watermark aggregate
    * and the scoring pass both consume it, and either path's cut/rank
    * stage reads it again.
    */
  private[graft] def rfmPerCustomer(orders: DataFrame): DataFrame = {
    val per = graft.engine.Caching.scopedPersist(orders
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_custkey")
      .agg(max(col("d")).as("last_d"), count(lit(1)).as("frequency"),
        sum(col("cents")).as("sum_cents")))
    val wm = per.agg(max(col("last_d")).as("wm"))
    per.crossJoin(broadcast(wm))
      .withColumn("recency_days",
        datediff(col("wm"), col("last_d")).cast("long"))
      .drop("wm")
  }

  /** The lifecycle-marketing segment rulebook, shared verbatim by both
    * scoring paths so they cannot drift.
    */
  private def rfmSegment(r: Column, f: Column, m: Column): Column =
    when(r >= 4 && f >= 4 && m >= 4, "champion")
      .when(f >= 4, "loyal")
      .when(r >= 4 && f <= 2, "new")
      .when(r <= 2 && f >= 3, "at_risk")
      .when(r <= 2, "hibernating")
      .otherwise("regular")

  def seg1Rfm(spark: SparkSession, dir: String): DataFrame =
    seg1RfmCore(t(spark, dir, "orders"))

  /** seg1 over an explicit orders-shaped frame — InvariantSpec plants a
    * tie-free 10-customer frame and pins exact-vs-approx agreement.
    */
  private[graft] def seg1RfmCore(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = rfmPerCustomer(orders)
    val scored = per
      .withColumn("r_score", ntile(5).over(Window.orderBy(
        col("recency_days").desc, col("o_custkey").desc)).cast("long"))
      .withColumn("f_score", ntile(5).over(Window.orderBy(
        col("frequency").asc, col("o_custkey").asc)).cast("long"))
      .withColumn("m_score", ntile(5).over(Window.orderBy(
        col("sum_cents").asc, col("o_custkey").asc)).cast("long"))
    scored
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        r2(col("sum_cents") / 100.0).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        rfmSegment(col("r_score"), col("f_score"), col("m_score"))
          .as("segment"))
      .orderBy("o_custkey")
  }

  /** seg1's PRODUCTION scale path — the prof2-vs-prof8 exact-vs-sketch
    * twin convention applied to quintile scoring: instead of three
    * partition-less `ntile(5)` windows (each a single-partition sort of
    * the ENTIRE customer domain — fine at sf0.1, three serialized
    * global sorts at 100 TB), derive the 4 quintile cut values per
    * metric from ONE `percentile_approx` aggregate, broadcast the
    * 1-row cut frame, and score scan-locally by counting cuts below
    * each value (`size(filter(cuts, c => x > c))` — codegen'd array
    * scan over 4 elements). Shuffles: the o_custkey aggregate and the
    * two customer-frame passes the broadcast serves — nothing ever
    * leaves hash partitioning, no global sort anywhere.
    *
    * Divergence contract vs the exact path: `percentile_approx` returns
    * ACTUAL data values at each quantile rank, so on a frame with
    * distinct metric values and n divisible by 5 the scores agree
    * EXACTLY (InvariantSpec pins this on a planted 10-customer frame);
    * under heavy ties the rank-based ntile splits tied customers across
    * buckets by the custkey tiebreak while the value-based CASE keeps
    * ties together — the usual sketch-vs-exact trade, documented not
    * hidden. The driver gate is [[seg1RfmApproxGate]] (r19): the scores'
    * cut placement has no cross-engine mirror, so the gate hash-checks
    * the exact metric columns plus the GK rank-error bound as an
    * in-query boolean; this value-carrying form stays the API surface,
    * pinned against its exact twin in InvariantSpec.
    */
  def seg1RfmApprox(spark: SparkSession, dir: String): DataFrame =
    seg1RfmApproxCore(t(spark, dir, "orders"))

  private[graft] def seg1RfmApproxCore(orders: DataFrame): DataFrame = {
    val per = rfmPerCustomer(orders)
    val qs = array(lit(0.2), lit(0.4), lit(0.6), lit(0.8))
    val acc = lit(RfmSketchAccuracy)
    val cuts = per.agg(
      percentile_approx(col("recency_days"), qs, acc).as("rc"),
      percentile_approx(col("frequency"), qs, acc).as("fc"),
      percentile_approx(col("sum_cents"), qs, acc).as("mc"))
    // ascending score: 1 + number of cuts strictly below the value
    def asc(x: Column, c: Column): Column =
      (size(filter(c, cut => x > cut)) + lit(1)).cast("long")
    val scored = per.crossJoin(broadcast(cuts))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        r2(col("sum_cents") / 100.0).as("monetary"),
        // recency ranks DESCENDING in the exact path (stalest = 1)
        (lit(6) - asc(col("recency_days"), col("rc"))).as("r_score"),
        asc(col("frequency"), col("fc")).as("f_score"),
        asc(col("sum_cents"), col("mc")).as("m_score"))
    scored
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        rfmSegment(col("r_score"), col("f_score"), col("m_score"))
          .as("segment"))
      .orderBy("o_custkey")
  }

  /** seg1_rfm_approx's PARTIAL-oracle gate (r19, the prof8/drift3
    * graduation pattern, closing the last rows-only row): the gated
    * output is the per-customer EXACT metric frame `(o_custkey,
    * recency_days, frequency, monetary)` — hash-checked against DuckDB,
    * byte-identical to seg1_rfm's non-score columns — plus `cuts_ok`,
    * the in-query GK rank-error bound on all 12 quintile cuts: each
    * returned cut is an actual data value whose occupied rank interval
    * `[count(< cut) + 1, count(<= cut)]` must intersect the target rank
    * `q·n` within `n/accuracy + 2` ranks (percentile_approx's published
    * guarantee at accuracy 100000 is rank error ≤ n·1e-5, i.e. < 1 rank
    * at gated scale; +2 absorbs the ceil/floor convention). DuckDB emits
    * literal TRUE, so a sketch whose cut placement drifts out of its
    * rank contract hash-FAILS the round instead of passing rows-only.
    * Tie robustness: tied values WIDEN the occupied rank interval, so
    * heavy ties (frequency's small-int domain) make the bound easier,
    * never spuriously tight. The engine-specific quintile SCORES stay
    * out of the hash — [[seg1RfmApproxCore]] carries them and
    * InvariantSpec pins them against the exact ntile twin.
    *
    * Plan shape: the scoped-persisted per-customer frame feeds the cut
    * sketch, ONE rank-stat aggregate (24 conditional sums + n against
    * the broadcast 1-row cut frame — scan-local, no extra shuffle), and
    * the output projection; nothing sorts globally.
    */
  def seg1RfmApproxGate(spark: SparkSession, dir: String): DataFrame =
    seg1RfmApproxGateCore(t(spark, dir, "orders"))

  /** The ONE GK accuracy shared by the production scorer and its gate —
    * the gate's rank tolerance derives from it, so tuning the sketch
    * cannot silently detach the bound from the sketch's actual error.
    */
  private val RfmSketchAccuracy = 100000

  private[graft] def seg1RfmApproxGateCore(orders: DataFrame): DataFrame = {
    val per = rfmPerCustomer(orders)
    val qs = array(lit(0.2), lit(0.4), lit(0.6), lit(0.8))
    val acc = lit(RfmSketchAccuracy)
    val cuts = per.agg(
      percentile_approx(col("recency_days"), qs, acc).as("rc"),
      percentile_approx(col("frequency"), qs, acc).as("fc"),
      percentile_approx(col("sum_cents"), qs, acc).as("mc"))
    val metrics = Seq("recency_days" -> "rc", "frequency" -> "fc",
      "sum_cents" -> "mc")
    val rankAggs = metrics.flatMap { case (m, cn) =>
      (1 to 4).flatMap { i =>
        val cut = element_at(col(cn), i)
        Seq(sum(when(col(m) < cut, 1L).otherwise(0L)).as(s"lt_${cn}_$i"),
          sum(when(col(m) <= cut, 1L).otherwise(0L)).as(s"le_${cn}_$i"))
      }
    } :+ count(lit(1)).as("n")
    val stats = per.crossJoin(broadcast(cuts))
      .agg(rankAggs.head, rankAggs.tail: _*)
    val tol = col("n") / RfmSketchAccuracy.toDouble + lit(2.0)
    val ok = metrics.flatMap { case (_, cn) =>
      (1 to 4).map { i =>
        val target = col("n") * (i / 5.0)
        (col(s"lt_${cn}_$i") + 1 <= target + tol) &&
          (col(s"le_${cn}_$i") >= target - tol)
      }
    }.reduce(_ && _)
    per.crossJoin(broadcast(stats.select(ok.as("cuts_ok"))))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        r2(col("sum_cents") / 100.0).as("monetary"), col("cuts_ok"))
      .orderBy("o_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "seg1_rfm" -> seg1Rfm,
    "seg1_rfm_approx" -> seg1RfmApproxGate,
    "sql4_recursive_rollup" -> sql4RecursiveRollup,
    "sql3_window_facade" -> sql3WindowFacade,
    "sql1_revenue_by_nation" -> sql1RevenueByNation,
    "sql2_correlated_scalar" -> sql2CorrelatedScalar,
    "p1_pivot_segments" -> p1PivotSegments,
    "a1_array_functions" -> a1ArrayFunctions,
    "pct1_percentiles" -> pct1Percentiles,
    "q4_late_priority" -> q4LatePriority,
    "q12_priority_mix" -> q12PriorityMix,
    "q14_promo_share" -> q14PromoShare,
    "q17_small_quantity" -> q17SmallQuantity,
    "q13_name_pattern" -> q13NamePattern,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "q7_volume_shipping" -> q7VolumeShipping,
    "q8_market_share" -> q8MarketShare,
    "q9_product_profit" -> q9ProductProfit,
    "q15_top_supplier" -> q15TopSupplier,
    "q16_supplier_counts" -> q16SupplierCounts,
    "q21_sole_supplier" -> q21SoleSupplier,
    "q22_idle_balance" -> q22IdleBalance,
    "q23_mom_growth" -> q23MomGrowth,
    "q2_min_cost_supplier" -> q2MinCostSupplier,
    "q11_important_parts" -> q11ImportantParts,
    "q20_excess_suppliers" -> q20ExcessSuppliers,
    "prof4_mutual_information" -> prof4MutualInformation,
    "prof5_fd_histogram" -> prof5FdHistogram,
    "prof10_joint_histogram" -> prof10JointHistogram,
    "prof6_spearman" -> prof6Spearman,
    "prof7_profile_sketch" -> prof7ProfileSketch,
    "prof8_equidepth_sketch" -> prof8EquidepthSketch,
    "prof9_benford" -> prof9Benford,
    "m1_unpivot" -> m1Unpivot,
    "w5_gap_fill" -> w5GapFill,
    "w6_distribution_ranks" -> w6DistributionRanks,
    "q18_large_orders" -> q18LargeOrders,
    "q19_brand_revenue" -> q19BrandRevenue,
    "q1_pricing_summary" -> q1PricingSummary,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q5_region_revenue" -> q5RegionRevenue,
    "q10_returned_top" -> q10ReturnedTop,
    "w1_top_orders_per_customer" -> w1TopOrdersPerCustomer,
    "w2_running_totals" -> w2RunningTotals,
    "w3_range_frame" -> w3RangeFrame,
    "w4_value_navigation" -> w4ValueNavigation,
    "prof1_column_profile" -> prof1ColumnProfile,
    "prof2_equidepth_histogram" -> prof2EquiDepthHistogram,
    "prof3_correlation_matrix" -> prof3CorrelationMatrix,
    "set1_priority_customers" -> set1PriorityCustomers,
    "set2_multiset_ops" -> set2MultisetOps,
    "topk_parts_by_quantity" -> topkPartsByQuantity,
    "g1_rollup_acctbal" -> g1RollupAcctbal,
    "g2_grouping_sets_orders" -> g2GroupingSetsOrders,
    "g3_cube_orders" -> g3CubeOrders,
    "j1_semi_anti_counts" -> j1SemiAntiCounts,
    "j4_bloom_join" -> j4BloomJoin,
    "j5_bucketed_join" -> j5BucketedJoin,
    "j3_full_outer" -> j3FullOuter,
    "s1_scalar_functions" -> s1ScalarFunctions,
    "s2_datetime_functions" -> s2DatetimeFunctions,
    "j2_events_json" -> j2EventsJson
  )

  val oracle: Map[String, String] = Map(
    // prof8's PARTIAL oracle (r18): exact total hash-gates the carve;
    // depth_ok is Spark's in-query sketch-depth bound, TRUE by contract
    // (see prof8EquidepthSketch's scaladoc) — DuckDB emits the literal,
    // so an out-of-tolerance sketch hash-FAILS.
    "prof8_equidepth_sketch" ->
      """WITH tot AS (
        |  SELECT CAST(count(value) AS BIGINT) AS n_total FROM events)
        |SELECT bucket, n_total, TRUE AS depth_ok
        |FROM (SELECT unnest(generate_series(1, 8)) AS bucket) b
        |CROSS JOIN tot
        |ORDER BY bucket""".stripMargin,
    // prof7's PARTIAL oracle (r19): every exact profile column
    // hash-gates; nd_ok is Spark's in-query HLL-vs-exact bound, TRUE by
    // contract (see prof7ProfileSketch's scaladoc) — DuckDB emits the
    // literal, so an out-of-tolerance estimate hash-FAILS.
    "prof7_profile_sketch" ->
      """WITH s AS (SELECT * FROM customer)
        |SELECT * FROM (
        |  SELECT 'c_custkey' AS column_name, count(*) AS n_rows,
        |    count(*) - count(c_custkey) AS n_nulls,
        |    round(CAST(min(c_custkey) AS DOUBLE), 2) AS min_num,
        |    round(CAST(max(c_custkey) AS DOUBLE), 2) AS max_num,
        |    NULL AS min_str, NULL AS max_str, TRUE AS nd_ok FROM s
        |  UNION ALL
        |  SELECT 'c_nationkey', count(*), count(*) - count(c_nationkey),
        |    round(CAST(min(c_nationkey) AS DOUBLE), 2),
        |    round(CAST(max(c_nationkey) AS DOUBLE), 2), NULL, NULL, TRUE
        |  FROM s
        |  UNION ALL
        |  SELECT 'c_acctbal', count(*), count(*) - count(c_acctbal),
        |    round(CAST(min(c_acctbal) AS DOUBLE), 2),
        |    round(CAST(max(c_acctbal) AS DOUBLE), 2), NULL, NULL, TRUE
        |  FROM s
        |  UNION ALL
        |  SELECT 'c_name', count(*), count(*) - count(c_name),
        |    NULL, NULL, min(c_name), max(c_name), TRUE FROM s
        |  UNION ALL
        |  SELECT 'c_mktsegment', count(*), count(*) - count(c_mktsegment),
        |    NULL, NULL, min(c_mktsegment), max(c_mktsegment), TRUE FROM s)
        |ORDER BY column_name""".stripMargin,
    // seg1_rfm_approx's PARTIAL oracle (r19): the exact per-customer
    // metric frame hash-gates (identical to seg1_rfm minus the scores);
    // cuts_ok is Spark's in-query GK rank-error bound, TRUE by contract
    // (see seg1RfmApproxGate's scaladoc).
    "seg1_rfm_approx" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    max(CAST(o_orderdate AS DATE)) AS last_d,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_cents
        |  FROM orders GROUP BY 1)
        |SELECT o_custkey,
        |  CAST(date_diff('day', last_d, (SELECT max(last_d) FROM per))
        |    AS BIGINT) AS recency_days,
        |  frequency,
        |  round(sum_cents / 100.0, 2) AS monetary,
        |  TRUE AS cuts_ok
        |FROM per
        |ORDER BY o_custkey""".stripMargin,
    "seg1_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    max(CAST(o_orderdate AS DATE)) AS last_d,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_cents
        |  FROM orders GROUP BY 1),
        | rec AS (
        |  SELECT *, CAST(date_diff('day', last_d, max(last_d) OVER ())
        |    AS BIGINT) AS recency_days
        |  FROM per),
        | sc AS (
        |  SELECT *,
        |    CAST(ntile(5) OVER (
        |      ORDER BY recency_days DESC, o_custkey DESC) AS BIGINT)
        |      AS r_score,
        |    CAST(ntile(5) OVER (
        |      ORDER BY frequency ASC, o_custkey ASC) AS BIGINT) AS f_score,
        |    CAST(ntile(5) OVER (
        |      ORDER BY sum_cents ASC, o_custkey ASC) AS BIGINT) AS m_score
        |  FROM rec)
        |SELECT o_custkey, recency_days, frequency,
        |  round(sum_cents / 100.0, 2) AS monetary,
        |  r_score, f_score, m_score,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
        |      THEN 'champion'
        |    WHEN f_score >= 4 THEN 'loyal'
        |    WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
        |    WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
        |    WHEN r_score <= 2 THEN 'hibernating'
        |    ELSE 'regular' END AS segment
        |FROM sc
        |ORDER BY o_custkey""".stripMargin,
    "sql4_recursive_rollup" -> SharedRecursiveSql,
    "sql3_window_facade" -> SharedWindowSql,
    "q23_mom_growth" ->
      """WITH m AS (
        |  SELECT n_name, strftime(o_orderdate::DATE, '%Y-%m') AS month,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100.0) AS BIGINT)))
        |      / 10000.0 AS revenue
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_name, month, revenue,
        |  lag(revenue) OVER w AS prev_revenue,
        |  round((revenue - lag(revenue) OVER w)
        |    / lag(revenue) OVER w, 6) + 0 AS mom_growth
        |FROM m
        |WINDOW w AS (PARTITION BY n_name ORDER BY month)
        |ORDER BY n_name, month""".stripMargin,
    "j5_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "s2_datetime_functions" ->
      """SELECT o_orderkey,
        |  CAST(isodow(o_orderdate::DATE) AS BIGINT) AS iso_dow,
        |  CAST(week(o_orderdate::DATE) AS BIGINT) AS iso_week,
        |  CAST(quarter(o_orderdate::DATE) AS BIGINT) AS qtr,
        |  CAST(dayofyear(o_orderdate::DATE) AS BIGINT) AS doy,
        |  last_day(o_orderdate::DATE) AS month_end,
        |  (o_orderdate::DATE + INTERVAL 3 MONTH)::DATE AS plus_3m,
        |  CAST(o_orderdate::DATE - DATE '1995-01-01' AS BIGINT)
        |    AS days_since_anchor,
        |  strftime(o_orderdate::DATE, '%Y-%m') AS ym
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "w6_distribution_ranks" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "prof9_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100.0, 0)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM lineitem WHERE l_extendedprice > 0),
        | c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
        |SELECT digit, n,
        |  round(n / sum(n) OVER (), 6) AS observed_p,
        |  round(log10(1.0 + 1.0 / digit), 6) AS benford_p,
        |  round((n - log10(1.0 + 1.0 / digit) * sum(n) OVER ())
        |      * (n - log10(1.0 + 1.0 / digit) * sum(n) OVER ())
        |      / (log10(1.0 + 1.0 / digit) * sum(n) OVER ()), 6) AS chisq_term
        |FROM c
        |ORDER BY digit""".stripMargin,
    "sql1_revenue_by_nation" -> SharedRevenueSql,
    "sql2_correlated_scalar" -> SharedScalarSubquerySql,
    "p1_pivot_segments" ->
      """SELECT n_name,
        |  round(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal END), 2) AS "AUTOMOBILE",
        |  round(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END), 2) AS "BUILDING",
        |  round(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN c_acctbal END), 2) AS "FURNITURE",
        |  round(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN c_acctbal END), 2) AS "HOUSEHOLD",
        |  round(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN c_acctbal END), 2) AS "MACHINERY"
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "a1_array_functions" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  round(CAST(list_min(embedding) AS DOUBLE), 4) + 0 AS v_min,
        |  round(CAST(list_max(embedding) AS DOUBLE), 4) + 0 AS v_max,
        |  round(CAST(list_element(embedding, 1) AS DOUBLE), 4) + 0 AS v_first,
        |  round(CAST(list_element(list_slice(embedding, 1, 4), 4) AS DOUBLE), 4) + 0 AS v4,
        |  round(CAST(list_element(list_sort(embedding), 1) AS DOUBLE), 4) + 0 AS sorted_first
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,
    "pct1_percentiles" ->
      """SELECT c_mktsegment,
        |  round(quantile_cont(c_acctbal, 0.5), 4) AS median_acctbal,
        |  round(quantile_cont(c_acctbal, 0.9), 4) AS p90_acctbal,
        |  count(*) AS n
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q4_late_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q12_priority_mix" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q14_promo_share" ->
      """SELECT round(100.0 *
        |  sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) /
        |  sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "q17_small_quantity" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l, (SELECT l_partkey AS ak, avg(l_quantity) AS aq
        |                  FROM lineitem GROUP BY l_partkey) a
        |WHERE l.l_partkey = a.ak AND l.l_quantity < 0.5 * a.aq""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.04 AND 0.06
        |  AND l_quantity < 24""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_7', 'NATION_12')
        |  AND n2.n_name IN ('NATION_7', 'NATION_12')
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(sum(CASE WHEN n1.n_name = 'NATION_5'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) /
        |    sum(l_extendedprice * (1.0 - l_discount)), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1
        |ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  round(sum(l_extendedprice * (1.0 - l_discount)
        |    - p_retailprice * l_quantity), 2) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY 1, 2
        |ORDER BY nation, l_year DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q21_sole_supplier" ->
      """SELECT s_name, count(DISTINCT l1.l_orderkey) AS n_sole_orders
        |FROM supplier
        |JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_linenumber <> l1.l_linenumber)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY n_sole_orders DESC, s_name""".stripMargin,
    "q22_idle_balance" ->
      """SELECT c_mktsegment, count(*) AS n_custs,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q18_large_orders" ->
      """WITH q AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING round(sum(l_quantity), 2) > 250.0)
        |SELECT c_custkey, c_name, o_orderkey,
        |  epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_ms,
        |  o_totalprice, total_qty
        |FROM q
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,
    "q19_brand_revenue" ->
      """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin,
    "q13_name_pattern" ->
      """SELECT p_type, count(*) AS n_parts,
        |  round(avg(p_retailprice), 6) AS avg_price
        |FROM part
        |WHERE p_name LIKE '%blue%' OR p_name LIKE '%red%'
        |GROUP BY p_type
        |ORDER BY p_type""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT o_orderkey, o_orderdate,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q10_returned_top" ->
      """SELECT c_custkey, c_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem, orders, customer, nation
        |WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
        |  AND o_custkey = c_custkey AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "w1_top_orders_per_customer" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "w2_running_totals" ->
      """SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
        |  event_type, value,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
        |  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,
    "w5_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
        |    CASE WHEN value >= 100.0 THEN value END AS sparse_value
        |  FROM events)
        |SELECT user_id, event_id, ts_ms, sparse_value,
        |  last_value(sparse_value IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts_ms, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
        |  first_value(sparse_value IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts_ms, event_id
        |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nocb,
        |  last_value(sparse_value IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts_ms, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS prev_observed
        |FROM e
        |ORDER BY user_id, event_id""".stripMargin,
    "w4_value_navigation" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, value
        |  FROM events)
        |SELECT user_id, event_id, ts_ms, value,
        |  first_value(value) OVER wt AS first_value,
        |  last_value(value) OVER wt AS running_last,
        |  nth_value(value, 2) OVER wt AS second_value,
        |  lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
        |    AS next_value,
        |  round(cume_dist() OVER (PARTITION BY user_id ORDER BY value, event_id), 6)
        |    AS value_cume_dist
        |FROM e
        |WINDOW wt AS (PARTITION BY user_id ORDER BY ts_ms, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "w3_range_frame" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, value
        |  FROM events)
        |SELECT user_id, event_id, ts_ms, value,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_ms
        |    RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW), 2) AS value_10m,
        |  round(percent_rank() OVER (PARTITION BY user_id
        |    ORDER BY value, event_id), 6) AS value_pct_rank,
        |  CAST(ntile(4) OVER (PARTITION BY user_id
        |    ORDER BY value, event_id) AS BIGINT) AS value_quartile
        |FROM e
        |ORDER BY user_id, event_id""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH costs AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
        |    round(avg(l_extendedprice / l_quantity), 6) AS supp_cost
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |    AND p_type = 'STANDARD' AND p_size <= 15
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        | mc AS (
        |  SELECT p_partkey AS mc_partkey, min(supp_cost) AS min_cost
        |  FROM costs GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supp_cost
        |FROM costs JOIN mc
        |  ON p_partkey = mc_partkey AND supp_cost = min_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
        |LIMIT 100""".stripMargin,
    "q11_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |        AS BIGINT)) AS value_cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
        |  GROUP BY 1),
        | tot AS (SELECT sum(value_cents) AS total_cents FROM pv)
        |SELECT l_partkey AS p_partkey,
        |  round(value_cents / 100.0, 2) AS part_value
        |FROM pv, tot
        |WHERE value_cents * 1000 > total_cents
        |ORDER BY part_value DESC, p_partkey""".stripMargin,
    "q20_excess_suppliers" ->
      """WITH psp AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  GROUP BY 1, 2),
        | pp AS (
        |  SELECT l_partkey AS pp_partkey, sum(qty) AS total_qty,
        |    count(*) AS n_suppliers
        |  FROM psp GROUP BY 1)
        |SELECT DISTINCT s_suppkey, s_name, s_acctbal
        |FROM psp
        |JOIN pp ON l_partkey = pp_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE qty * 2 > total_qty AND n_suppliers > 1
        |ORDER BY s_suppkey""".stripMargin,
    "m1_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    'discount' AS measure, l_discount AS value
        |  FROM lineitem WHERE l_orderkey % 50 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
        |  FROM lineitem WHERE l_orderkey % 50 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'quantity', l_quantity
        |  FROM lineitem WHERE l_orderkey % 50 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'tax', l_tax
        |  FROM lineitem WHERE l_orderkey % 50 = 0)
        |ORDER BY l_orderkey, l_linenumber, measure, value""".stripMargin,
    "prof6_spearman" ->
      """WITH li AS (SELECT l_quantity AS x, l_discount AS y FROM lineitem),
        | rx AS (
        |  SELECT x, cum + (cnt + 1) / 2.0 AS r_x FROM (
        |   SELECT x, count(*) AS cnt,
        |     sum(count(*)) OVER (ORDER BY x) - count(*) AS cum
        |   FROM li GROUP BY x)),
        | ry AS (
        |  SELECT y, cum + (cnt + 1) / 2.0 AS r_y FROM (
        |   SELECT y, count(*) AS cnt,
        |     sum(count(*)) OVER (ORDER BY y) - count(*) AS cum
        |   FROM li GROUP BY y))
        |SELECT round(corr(r_x, r_y), 6) + 0 AS spearman_rho,
        |  count(*) AS n,
        |  CAST(count(DISTINCT x) AS BIGINT) AS nx_distinct,
        |  CAST(count(DISTINCT y) AS BIGINT) AS ny_distinct
        |FROM li JOIN rx USING (x) JOIN ry USING (y)""".stripMargin,
    "prof10_joint_histogram" ->
      """WITH v AS (
        |  SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000) % 24
        |      AS hour_of_day,
        |    value AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value)),
        | bounds AS (SELECT min(v) AS mn, max(v) AS mx FROM v),
        | cells AS (
        |  SELECT hour_of_day,
        |    CASE WHEN mx = mn THEN 0
        |      ELSE least(CAST(floor((v - mn) / (mx - mn) * 10) AS BIGINT),
        |        9) END AS bin,
        |    count(*) AS n_events
        |  FROM v CROSS JOIN bounds
        |  GROUP BY 1, 2)
        |SELECT hour_of_day, bin, n_events,
        |  round(n_events::DOUBLE /
        |    sum(n_events) OVER (PARTITION BY hour_of_day), 6)
        |    AS share_of_hour
        |FROM cells
        |ORDER BY hour_of_day, bin""".stripMargin,
    "prof5_fd_histogram" ->
      """WITH v AS (
        |  SELECT value AS v FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value)),
        | stats AS (
        |  SELECT round(quantile_cont(v, 0.25), 4) AS q1,
        |    round(quantile_cont(v, 0.75), 4) AS q3,
        |    min(v) AS mn, max(v) AS mx, count(*) AS n
        |  FROM v),
        | spec AS (
        |  SELECT mn, mx,
        |    CASE WHEN round(2.0 * (q3 - q1) / cbrt(n), 4) > 0
        |         THEN round(2.0 * (q3 - q1) / cbrt(n), 4)
        |         WHEN round(mx - mn, 4) > 0 THEN round(mx - mn, 4)
        |         ELSE 1.0 END AS w
        |  FROM stats)
        |SELECT CAST(floor((v - mn) / w) AS BIGINT) AS bin,
        |  count(*) AS n, round(min(v), 4) AS lo, round(max(v), 4) AS hi
        |FROM v, spec
        |GROUP BY 1
        |ORDER BY bin""".stripMargin,
    "prof4_mutual_information" ->
      """WITH joint AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS nxy
        |  FROM orders GROUP BY 1, 2),
        | probs AS (
        |  SELECT
        |    nxy * 1.0 / (sum(nxy) OVER ()) AS p,
        |    (sum(nxy) OVER (PARTITION BY o_orderstatus)) * 1.0
        |      / (sum(nxy) OVER ()) AS px,
        |    (sum(nxy) OVER (PARTITION BY o_orderpriority)) * 1.0
        |      / (sum(nxy) OVER ()) AS py,
        |    sum(nxy) OVER () AS n
        |  FROM joint)
        |SELECT CAST(max(n) AS BIGINT) AS n_rows,
        |  round(sum(p * ln(p / (px * py))), 6) + 0 AS mi_nats,
        |  round(-sum(p * ln(px)), 6) AS h_x,
        |  round(-sum(p * ln(py)), 6) AS h_y,
        |  round(CASE WHEN sum(p * ln(px)) < 0 AND sum(p * ln(py)) < 0
        |    THEN sum(p * ln(p / (px * py))) /
        |      sqrt(sum(p * ln(px)) * sum(p * ln(py)))
        |    END, 6) + 0 AS nmi
        |FROM probs""".stripMargin,
    "prof3_correlation_matrix" ->
      """WITH a AS (
        |  SELECT
        |    round(corr(l_quantity, l_extendedprice), 6) + 0 AS r_qe,
        |    round(covar_samp(l_quantity, l_extendedprice), 2) + 0 AS c_qe,
        |    round(corr(l_quantity, l_discount), 6) + 0 AS r_qd,
        |    round(covar_samp(l_quantity, l_discount), 2) + 0 AS c_qd,
        |    round(corr(l_quantity, l_tax), 6) + 0 AS r_qt,
        |    round(covar_samp(l_quantity, l_tax), 2) + 0 AS c_qt,
        |    round(corr(l_extendedprice, l_discount), 6) + 0 AS r_ed,
        |    round(covar_samp(l_extendedprice, l_discount), 2) + 0 AS c_ed,
        |    round(corr(l_extendedprice, l_tax), 6) + 0 AS r_et,
        |    round(covar_samp(l_extendedprice, l_tax), 2) + 0 AS c_et,
        |    round(corr(l_discount, l_tax), 6) + 0 AS r_dt,
        |    round(covar_samp(l_discount, l_tax), 2) + 0 AS c_dt
        |  FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
        |    r_qe AS pearson_r, c_qe AS covariance FROM a
        |  UNION ALL SELECT 'l_quantity', 'l_discount', r_qd, c_qd FROM a
        |  UNION ALL SELECT 'l_quantity', 'l_tax', r_qt, c_qt FROM a
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', r_ed, c_ed FROM a
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', r_et, c_et FROM a
        |  UNION ALL SELECT 'l_discount', 'l_tax', r_dt, c_dt FROM a)
        |ORDER BY col_x, col_y""".stripMargin,
    "prof2_equidepth_histogram" ->
      """SELECT bucket, count(*) AS n, min(v) AS lo, max(v) AS hi
        |FROM (
        |  SELECT CAST(ntile(8) OVER (ORDER BY value) AS BIGINT) AS bucket,
        |    value AS v
        |  FROM events WHERE value IS NOT NULL)
        |GROUP BY bucket
        |ORDER BY bucket""".stripMargin,
    "prof1_column_profile" ->
      """WITH s AS (SELECT * FROM customer)
        |SELECT * FROM (
        |  SELECT 'c_custkey' AS column_name, count(*) AS n_rows,
        |    count(*) - count(c_custkey) AS n_nulls,
        |    count(DISTINCT c_custkey) AS n_distinct,
        |    round(CAST(min(c_custkey) AS DOUBLE), 2) AS min_num,
        |    round(CAST(max(c_custkey) AS DOUBLE), 2) AS max_num,
        |    NULL AS min_str, NULL AS max_str FROM s
        |  UNION ALL
        |  SELECT 'c_nationkey', count(*), count(*) - count(c_nationkey),
        |    count(DISTINCT c_nationkey),
        |    round(CAST(min(c_nationkey) AS DOUBLE), 2),
        |    round(CAST(max(c_nationkey) AS DOUBLE), 2), NULL, NULL FROM s
        |  UNION ALL
        |  SELECT 'c_acctbal', count(*), count(*) - count(c_acctbal),
        |    count(DISTINCT c_acctbal),
        |    round(CAST(min(c_acctbal) AS DOUBLE), 2),
        |    round(CAST(max(c_acctbal) AS DOUBLE), 2), NULL, NULL FROM s
        |  UNION ALL
        |  SELECT 'c_name', count(*), count(*) - count(c_name),
        |    count(DISTINCT c_name), NULL, NULL,
        |    min(c_name), max(c_name) FROM s
        |  UNION ALL
        |  SELECT 'c_mktsegment', count(*), count(*) - count(c_mktsegment),
        |    count(DISTINCT c_mktsegment), NULL, NULL,
        |    min(c_mktsegment), max(c_mktsegment) FROM s)
        |ORDER BY column_name""".stripMargin,
    "set1_priority_customers" ->
      """SELECT * FROM (
        |  SELECT 'both' AS tag, o_custkey FROM (
        |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |    INTERSECT
        |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
        |  UNION ALL
        |  SELECT 'urgent_only', o_custkey FROM (
        |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |    EXCEPT
        |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
        |  UNION ALL
        |  SELECT 'either', o_custkey FROM (
        |    SELECT DISTINCT o_custkey FROM orders
        |    WHERE o_orderpriority IN ('1-URGENT', '5-LOW')))
        |ORDER BY tag, o_custkey""".stripMargin,
    "set2_multiset_ops" ->
      """SELECT * FROM (
        |  SELECT 'both_all' AS tag, o_custkey, count(*) AS n FROM (
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |    INTERSECT ALL
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
        |  GROUP BY o_custkey
        |  UNION ALL
        |  SELECT 'urgent_surplus', o_custkey, count(*) FROM (
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |    EXCEPT ALL
        |    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
        |  GROUP BY o_custkey)
        |ORDER BY tag, o_custkey""".stripMargin,
    "topk_parts_by_quantity" ->
      """SELECT p_name, l_partkey, round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_name, l_partkey
        |ORDER BY total_qty DESC, l_partkey
        |LIMIT 15""".stripMargin,
    "g1_rollup_acctbal" ->
      """SELECT coalesce(n_name, 'ALL') AS nation,
        |  coalesce(c_mktsegment, 'ALL') AS segment,
        |  count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY nation, segment""".stripMargin,
    "g2_grouping_sets_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "g3_cube_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "j4_bloom_join" ->
      """SELECT o_orderdate, count(*) AS n_lines,
        |  round(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) / 100.0, 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderdate
        |ORDER BY o_orderdate""".stripMargin,
    "j3_full_outer" ->
      """SELECT CAST(coalesce(c_nationkey, s_nationkey) AS BIGINT) AS nationkey,
        |  coalesce(n_customers, 0) AS n_customers,
        |  coalesce(n_suppliers, 0) AS n_suppliers
        |FROM (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
        |  ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "j1_semi_anti_counts" ->
      """SELECT * FROM (
        |  SELECT 'customers_with_orders' AS k, count(*) AS n FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  UNION ALL
        |  SELECT 'suppliers_without_sales', count(*) FROM supplier
        |  WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |  UNION ALL
        |  SELECT 'customers_without_orders', count(*) FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
        |ORDER BY k""".stripMargin,
    "s1_scalar_functions" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  substr(o_orderpriority, 1, 1) AS pri_digit,
        |  concat_ws('|', o_orderstatus, o_orderpriority) AS tag,
        |  lower(o_orderpriority) AS pri_lower,
        |  CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
        |  round(sqrt(o_totalprice), 6) AS price_sqrt,
        |  round(ln(o_totalprice), 6) AS price_ln
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "j2_events_json" ->
      """SELECT coalesce(CAST(CAST(props->>'$.k' AS INTEGER) % 10 AS BIGINT), -1) AS k_bucket,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY 1
        |ORDER BY k_bucket""".stripMargin
  )
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the scale properties the queries claim
  * (broadcast dimension joins, parquet filter pushdown + column pruning,
  * top-k as TakeOrderedAndProject, whole-stage codegen presence) must
  * actually appear in the executed plan — not just in Scaladoc.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q5 joins all four dimensions via broadcast, no shuffle on dims") {
    val p = plan("q5_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
  }

  test("j4 probes the bloom filter scan-local, below the join") {
    val p = plan("j4_bloom_join")
    // the prefilter must be a filter on the fact scan (codegen'd
    // might_contain), not a post-join predicate
    assert(p.contains("might_contain"), p.take(3000))
    val joinIdx = p.indexOf("Join")
    val probeIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "probe should sit under (printed after) the join operator")
  }

  test("q1 pushes the shipdate filter and prunes columns at the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p.take(2000))
    // 7 of 11 lineitem columns read
    assert(!p.contains("l_orderkey"), "scan should prune unused key columns")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("whole-stage codegen covers the q1 aggregate (final AQE plan)") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    df.collect() // finalize THIS adaptive plan (count() would plan separately)
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators print as "*(stageId) Op" in the final plan string
    assert(p.contains("isFinalPlan=true") && p.contains("*("), p.take(2000))
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("d14 joins the 256-row log-ratio table via broadcast, never shuffling the token stream on the bucket key") {
    val p = plan("d14_dsir_weights")
    // the lam table is <=256 rows at ANY corpus size; the per-token
    // occurrence stream must probe it broadcast-side — a shuffle join on
    // `b` would exchange the corpus-sized token stream over 256 keys
    assert(p.contains("BroadcastHashJoin [b"), p.take(3000))
    assert(!p.contains("SortMergeJoin [b"), "token stream shuffled on bucket key")
  }

  test("dedup scans prune documents to the columns they need") {
    val p = plan("dd3_minhash_lsh")
    // the minhash pipeline needs doc_id + text only
    assert(!p.contains("n_chars") && !p.contains("source"), p.take(1500))
  }

  test("similarity near-dup reads embeddings without label") {
    val p = plan("sim3_embedding_neardup")
    assert(!p.contains("label"), p.take(1500))
  }

  test("sim3 candidate generation stays an equi-join on (band, bucket)") {
    val p = plan("sim3_embedding_neardup")
    // the pair join must hash/merge on the band+bucket keys — a nested
    // loop or cartesian here is the n² shape the banding exists to avoid
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p.take(2000))
    val equiJoin = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[band".r
    assert(equiJoin.findFirstIn(p).isDefined, p.take(2000))
  }

  test("dd2 candidate generation stays an equi-join on (band, bucket)") {
    val p = plan("dd2_jaccard_pairs")
    // round-3 rewrite: candidates come from MinHash band buckets, never
    // the fixed-cardinality (lang, length) blocks' within-block pair join
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p.take(2000))
    val equiJoin = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[band".r
    assert(equiJoin.findFirstIn(p).isDefined, p.take(2000))
  }

  test("no query in the whole surface plans a CartesianProduct") {
    // The one intentional cross join (single broadcast query row) plans as
    // BroadcastNestedLoopJoin; an actual CartesianProduct anywhere means a
    // blocking/banding bug that would detonate at scale.
    // Caveat: dd5's plan here is its FINAL left join — the iterative
    // propagation rounds execute eagerly inside the constructor and are
    // equi-joins by construction (dst===doc_id, c1===pid), not visible to
    // this sweep.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      plan(name).contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian plans: $offenders")
  }

  test("d1 distinct dictionary reads the source exactly once (long-format explode)") {
    val p = plan("d1_distinct_dictionary")
    assert("FileScan".r.findAllIn(p).size == 1, p.take(1500))
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
  }

  test("stratified sample compiles to a map-side WindowGroupLimit") {
    // the rank<=k filter must become partial WindowGroupLimits BEFORE the
    // stratum exchange — the property that keeps the shuffle at
    // O(strata x k) instead of corpus-sized
    val p = plan("d4_stratified_sample")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("vocabulary top-k ends in TakeOrderedAndProject with partial aggregation") {
    val p = plan("t6_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    // partial + final hash aggregates around each exchange (map-side combine)
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(2000))
    // both frequencies derive from ONE (token, doc_id) pre-aggregate: a
    // count+countDistinct plan would insert Expand, duplicating every
    // exploded token row before the shuffle
    assert(!p.contains("Expand"), p.take(2000))
  }

  test("sim5 cell assignment keeps the rank-1 filter map-side (WindowGroupLimit)") {
    // the inverted-list build must not shuffle all n×K scored rows: the
    // rk=1 filter has to compile to partial WindowGroupLimits so the
    // exchange carries ~one row per vector
    val p = plan("sim5_ivf_ann")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2500))
  }

  test("t10 packing windows per shard — never a single-partition global window") {
    // the prefix sum must partition by the shard key; an empty-partition
    // window spec would funnel the whole corpus through one task
    val p = plan("t10_packing")
    assert(!p.contains("SinglePartition"), p.take(2500))
    assert("hashpartitioning\\(shard".r.findFirstIn(p).isDefined, p.take(2500))
  }

  test("t8 broadcasts the 1-row vocabulary; corpus joins the model on bg, never itself") {
    val p = plan("t8_lm_surprise")
    // vocabulary size arrives via a broadcast nested-loop of ONE row —
    // never a CartesianProduct
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2500))
    // corpus-side scoring is an equi-join on the bigram key (the model is
    // vocab²-bounded; the corpus appears on exactly one side)
    val equi = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[bg".r
    assert(equi.findFirstIn(p).isDefined, p.take(2500))
  }

  test("dd7 caps hot buckets per (band, bucket, SIDE)") {
    // a (band, bucket)-only cap would keep only the low-sorting eval ids
    // in a hot mixed bucket and emit zero cross pairs exactly where
    // contamination concentrates — the side predicate must be IN the
    // window partition spec
    val p = plan("dd7_near_contamination")
    // the side predicate is projected into _w0 below the window; the spec
    // must carry THREE partition keys and _w0 must be the >= IdShift test
    val spec = "windowspecdefinition\\(band#\\d+, bucket#\\d+, _w0#\\d+".r
    assert(spec.findFirstIn(p).isDefined, p.take(3000))
    assert("\\(doc_id#\\d+L? >= 1000000\\) AS _w0".r.findFirstIn(p).isDefined, p.take(3000))
  }

  test("pipe2 fingerprint dedup keeps the rank-1 filter map-side (WindowGroupLimit)") {
    val p = plan("pipe2_ingest_batch")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2500))
  }

  test("dd8 caps hot windows per SIDE and joins on the window hash") {
    val p = plan("dd8_span_contamination")
    // same per-side cap contract as dd7: the side predicate must be a
    // window partition key (projected into _w0), or hot mixed windows
    // would evict one whole corpus side
    assert("\\(doc_id#\\d+L? >= 1000000\\) AS _w0".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p.take(3000))
    val equi = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[wh".r
    assert(equi.findFirstIn(p).isDefined, p.take(3000))
  }

  test("t12 keeps the top-3-per-doc rank map-side and broadcasts the doc count") {
    val p = plan("t12_tfidf_keywords")
    // the per-doc rank<=3 filter must become partial WindowGroupLimits so
    // the final exchange carries <=3 rows per document, not the pair frame
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2500))
    // the corpus-wide doc count is a broadcast 1-row frame (t8 convention)
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2500))
  }

  test("sim7 broadcasts the codebook and keeps the encode rank-1 map-side") {
    val p = plan("sim7_pq_adc")
    // encode join: corpus subvectors x 128-row codebook must broadcast the
    // codebook — the corpus never shuffles to be encoded
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
    // nearest-codeword rank-1 per (vec_id, m) compiles to map-side
    // WindowGroupLimits (the exchange carries one row per vector-subspace)
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2500))
  }

  test("d7 weighted sample compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("d7_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("pipe1 composes on one documents scan: final plan reads no parquet") {
    // The cleaned+scored corpus is checkpointed once; every downstream
    // stage (label propagation, keep-list join, stratified sample) must
    // consume those blocks. A parquet scan in the final plan means some
    // stage silently re-read (and re-scored) the corpus.
    val p = plan("pipe1_training_corpus")
    assert(!p.contains("FileScan"), p.take(3000))
    assert(p.contains("WindowGroupLimit"), p.take(3000)) // d4's map-side limit survives composition
  }

  test("q21 collapses both existentials into one fact scan, no self-join") {
    // the EXISTS/NOT-EXISTS pair must become ONE per-order aggregate:
    // exactly one lineitem scan, supplier broadcast, no semi/anti join
    // back onto the fact table
    val p = plan("q21_sole_supplier")
    assert("FileScan parquet".r.findAllIn(p).size <= 2, p.take(3000))
    assert("lineitem".r.findAllIn(p).size <= 2, p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    // the triple-dedup rewrite must keep every aggregate non-distinct:
    // an Expand node means Catalyst fell back to the multi-count_distinct
    // plan that triples the fact rows entering the first aggregate
    assert(!p.contains("Expand"), p.take(3000))
  }

  test("pipe3 composes on one documents scan: final plan reads no parquet") {
    // Same discipline as pipe1: the packing stage must tokenize the
    // CHECKPOINTED survivors, not re-read the corpus from parquet.
    val p = plan("pipe3_packed_corpus")
    assert(!p.contains("FileScan"), p.take(3000))
  }

  test("ev7 latest-state keeps the rank-1 filter map-side (WindowGroupLimit)") {
    // the compaction must pre-dedup per map task — the exchange carries
    // one row per (user, partition), never the event log
    val p = plan("ev7_latest_state")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2500))
  }

  test("t13 top-bigram keeps the per-doc top-1 rank map-side (WindowGroupLimit)") {
    // ≥1, not the former partial+final pair: the tWide pin (r20) already
    // hash-partitions the bigram counts by doc_id, so the rank needs no
    // exchange of its own and Spark plans a single Final group limit —
    // strictly better than partial+final around a shuffle. A rank that
    // shows NO group limit (the full window over every bigram row) is
    // the regression this pin guards.
    val p = plan("t13_top_bigram")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 1, p.take(2500))
  }

  test("d9 token budget windows per domain — never a single-partition global window") {
    // t10's contract: the running sum partitions by source; an empty
    // partition spec funnels the corpus through one task
    val p = plan("d9_token_budget")
    assert(!p.contains("SinglePartition"), p.take(2500))
    assert("hashpartitioning\\(source".r.findFirstIn(p).isDefined, p.take(2500))
  }

  test("d8 quality prune windows per domain and broadcasts the domain counts") {
    val p = plan("d8_quality_prune")
    assert(!p.contains("SinglePartition"), p.take(2500))
    assert("hashpartitioning\\(source".r.findFirstIn(p).isDefined, p.take(2500))
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
  }

  test("q6 pushes every predicate to the parquet scan") {
    val p = plan("q6_forecast_revenue")
    // the PushedFilters list prints truncated, so pin the (stable) prefix
    // and read the complete predicates off the Filter node instead
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), " +
      "IsNotNull(l_quantity), GreaterThanOrEqual"), p.take(2500))
    assert("l_quantity#\\d+ < 24\\.0".r.findFirstIn(p).isDefined, p.take(2500))
    // 4 of 11 lineitem columns read
    assert(!p.contains("l_orderkey") && !p.contains("l_tax"),
      "scan should prune unused columns")
  }

  test("q18 aggregates lineitem BEFORE joining orders and customer") {
    // the per-order quantity aggregate must sit under the joins, so the
    // exchanges after it carry the few large orders, not raw lineitem
    val df = SparkEntry.queries("q18_large_orders")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(1500))
    // under AQE the filtered aggregate is small → both joins go broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("ev8 merge compacts the delta map-side and broadcasts the base key set") {
    val df = SparkEntry.queries("ev8_merge_upsert")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(1500))
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q19 keeps the part join an equi-join with a broadcast dimension") {
    val p = plan("q19_brand_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2500))
  }

  test("q7 broadcasts both nation-filtered dimension roles into the fact join") {
    // supplier and customer each shrink to the two nations' members before
    // touching lineitem/orders: 4 broadcast joins (2 dims × 2 role joins),
    // and the only remaining disjunction is the tiny post-join pair filter
    val p = plan("q7_volume_shipping")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
  }

  test("q8 keeps every dimension side broadcast; only lineitem-orders shuffles") {
    val p = plan("q8_market_share")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q16 excludes flagged suppliers via a broadcast anti join") {
    val p = plan("q16_supplier_counts")
    assert(p.contains("LeftAnti"), p.take(2500))
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
  }

  test("q15 joins the per-supplier aggregate against its own broadcast max") {
    val df = SparkEntry.queries("q15_top_supplier")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(1500))
    // the 1-row max and the supplier dim both broadcast back onto the
    // per-supplier revenue frame — no global sort anywhere
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("ev9 compacts events to user-days before any join") {
    val df = SparkEntry.queries("ev9_retention")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(1500))
    // the cohort frame is user-count-sized → AQE broadcasts the join back
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // no window function over the raw event stream
    assert(!p.contains("WindowGroupLimit") && !p.contains("RunningWindow"),
      p.take(3000))
  }

  test("dd9 caps hot buckets per side and joins candidates on (band, bucket)") {
    val p = plan("dd9_incremental")
    // same per-side cap contract as dd7: the side predicate must be a
    // window partition key (projected into _w0), or a hot mixed bucket
    // would evict the whole index side and hide planted duplicates
    val spec = "windowspecdefinition\\(band#\\d+, bucket#\\d+, _w0#\\d+".r
    assert(spec.findFirstIn(p).isDefined, p.take(3000))
    assert("\\(doc_id#\\d+L? >= 1000000\\) AS _w0".r.findFirstIn(p).isDefined, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    val equiJoin = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[band".r
    assert(equiJoin.findFirstIn(p).isDefined, p.take(3000))
  }

  test("w4 shares one user_id exchange across all five window functions") {
    // first/last/nth over the running frame, lead, and cume_dist all
    // partition on user_id — one hash exchange serves the whole family
    val p = plan("w4_value_navigation")
    assert(!p.contains("SinglePartition"), p.take(2500))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      p.take(2500))
  }

  test("w5 LOCF/NOCB/prev fills ride one user_id exchange") {
    // three ignore-nulls navigations with different frames but the same
    // (user, time) partitioning and ordering — one shuffle, one sort
    val p = plan("w5_gap_fill")
    assert(!p.contains("SinglePartition"), p.take(2500))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      p.take(2500))
  }

  test("ev12 change-detect and interval-close ride one user_id exchange") {
    // lag, the change filter, and lead all partition on user_id; the
    // filter preserves hash partitioning so no second shuffle appears
    val p = plan("ev12_scd2_history")
    assert(!p.contains("SinglePartition"), p.take(2500))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      p.take(2500))
  }

  test("dd10 evaluates the levenshtein DP exactly once, banded") {
    // EvalOnce must hold the DP in its projection: a pushed filter would
    // inline the expression and run the matrix twice per candidate pair
    val p = plan("dd10_edit_distance")
    assert("levenshtein".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("t16 ranks via TakeOrderedAndProject with broadcast stats joins") {
    // the top-10 must be a bounded selection (never a global sort) and
    // the df / corpus-stats sides must broadcast, not shuffle
    val p = plan("t16_bm25_rank")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p.take(2000))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 1, p.take(2000))
  }

  test("w3 shares one user_id exchange across all three window specs") {
    // range-frame sum, percent_rank and ntile partition identically — one
    // hash exchange on user_id must serve all of them (different orderings
    // re-sort within partitions, they must not re-shuffle)
    val p = plan("w3_range_frame")
    assert(!p.contains("SinglePartition"), p.take(2500))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      p.take(2500))
  }

  test("sql2 decorrelates the scalar subqueries into aggregate-then-join") {
    // a per-row subquery execution surviving into the physical plan is the
    // O(rows x table) shape that cannot run at scale — Catalyst must have
    // rewritten both SELECT-list subqueries to aggregates joined back
    val p = plan("sql2_correlated_scalar")
    // Spark renders a surviving scalar subquery as 'scalar-subquery#N'
    // (expression form) or a 'Subquery' exec node — the camel-case class
    // name never appears in plan strings, so matching it would be vacuous
    assert(!p.contains("scalar-subquery") && !p.contains("Subquery"),
      p.take(2500))
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(p).size >= 2, p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2500))
  }

  test("ev11 grid and fill consume the cached daily frame, not the event log") {
    // the span aggregate and the distinct-user subtree must read the
    // users×days cache (InMemoryTableScan), not re-derive from the raw
    // event log. Asserted on an EXECUTED plan: a plan-only audit is the
    // "abandoned plan" case the scoped-cache expiry exists for, so in a
    // shared session the cache can be released between construction and
    // stringification — during a real action it is alive by contract.
    val df = SparkEntry.queries("ev11_resample")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(1500))
    // (no SinglePartition assert here: the 1-row span aggregate's global
    // exchange is legitimate — the WINDOW partitions by user_id)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p.take(3000))
    assert("windowspecdefinition\\(user_id".r.findFirstIn(p).isDefined, p.take(3000))
  }

  test("ev10 anomaly windows partition by user — no single-partition exchange") {
    val p = plan("ev10_anomaly")
    assert(!p.contains("SinglePartition"), p.take(2500))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      p.take(2500))
  }

  test("prof1 profiles every column in one parquet scan") {
    // all row/null/distinct/extrema statistics fold into a single
    // aggregate pass; per-column output rows come from exploding the
    // 1-row result — a per-column job loop would show extra scans
    val p = plan("prof1_column_profile")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(2500))
  }

  test("sim8 assigns scan-local: no per-vector window, no row fan-out") {
    // r20 shape: each Lloyd assignment is an array_min fold over the
    // broadcast 1-row centroid array inside the scan projection — the
    // n×K scored frame, the per-vector exchange, and the rank window no
    // longer exist. A Window or WindowGroupLimit reappearing here means
    // an assignment regressed to the fan-out join; the broadcast of the
    // centroid row must also stay a broadcast (never a cartesian
    // shuffle).
    // (the 64-row seed-prefix window survives — bounded and deliberate;
    // the banned shape is any window keyed per vector)
    val p = plan("sim8_kmeans")
    assert(!p.contains("WindowGroupLimit") &&
      !p.contains("windowspecdefinition(vec_id"), p.take(3500))
    assert(p.contains("array_min(transform(cents"), p.take(3500))
    assert(!p.contains("CartesianProduct"), p.take(3500))
  }

  test("prof3 computes every pair's co-moments in one scan of lineitem") {
    // 12 corr/covar aggregates fold into ONE aggregate pass; the explode
    // of the 1-row result must not replay the aggregate per pair
    val p = plan("prof3_correlation_matrix")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(2500))
  }

  test("t19 broadcasts the vocabulary models; corpus never self-joins") {
    // both unigram attach joins and both 1-row totals are broadcasts —
    // the only exchanges carry vocabulary-sized model frames
    val p = plan("t19_pmi_collocations")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("t18 serves from the index: norms join builds on the posting slice") {
    // the corpus-sized doc-length table must stream through a broadcast
    // hash join whose BUILD side is the |Q|-bounded posting slice —
    // never a shuffle of the norms table against the slice
    val p = plan("t18_bm25_from_index")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("ev13 merges weekly from daily partials: one scan, two hash aggregates") {
    val p = plan("ev13_rollup_merge")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(2500))
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(2500)) // 2 partial+final pairs
    assert(!p.contains("CartesianProduct"), p.take(2500))
  }

  test("q2 broadcasts every dimension into one lineitem scan; min join co-partitioned") {
    val df = SparkEntry.queries("q2_min_cost_supplier")(spark, sf)
    df.collect() // finalize the adaptive plan: reuse decisions are runtime
    val p = df.queryExecution.executedPlan.toString
    // part, supplier, nation, region all build sides of broadcast joins
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(3000))
    // the per-part MIN branch is served from the cost aggregate's own
    // shuffle — the fact table feeds ONE scan pipeline, not two
    assert(p.contains("ReusedExchange"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000)) // LIMIT 100
  }

  test("q11 aggregates integer cents once; threshold is a 1-row broadcast") {
    // the per-part cents frame is scope-persisted (exchange reuse does
    // not fire across the global-aggregate branch), so BOTH the total
    // build and the probe read the cache — the plan's branches hit
    // InMemoryTableScan and only the cached plan itself holds the one
    // parquet scan
    val p = plan("q11_important_parts")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p.take(3000))
    // the grand total re-aggregates the per-part frame and comes back as
    // a broadcast nested loop of ONE row — never a second fact pass
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q20 prunes the year at the scan and reuses the per-(part,supplier) aggregate") {
    val df = SparkEntry.queries("q20_excess_suppliers")(spark, sf)
    df.collect() // finalize the adaptive plan: reuse decisions are runtime
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      p.take(3000))
    // the per-part total's exchange is served from the per-(part,supplier)
    // aggregate's shuffle — the fact table feeds ONE scan pipeline
    assert(p.contains("ReusedExchange"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("prof4 builds the contingency in one orders scan; windows stay on the tiny frame") {
    val p = plan("prof4_mutual_information")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(2500))
  }

  test("sim9 audit: approx pass equi-joins on the probe bucket, queries broadcast") {
    val p = plan("sim9_ann_recall")
    // the approx candidate join must stay the sim4 equi-join on bucket
    assert("BroadcastHashJoin \\[bucket".r.findFirstIn(p).isDefined, p.take(3000))
    // the exact baseline is a |Q|-row broadcast against the corpus scan —
    // a BroadcastNestedLoopJoin, never a CartesianProduct
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("d10 final plan is ONE scan-local clip aggregate: no join, cuts are literals") {
    // r17 rework: the cut points are computed up front from two bounded
    // TakeOrderedAndProject head jobs (not visible in the final plan)
    // and injected as literals, so the clip pass is a single scan with
    // no join at all — the old shape was 2 scans + a 1-row
    // BroadcastNestedLoopJoin for the cuts.
    val p = plan("d10_winsorize")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(2500))
    assert(!p.contains("Join"), p.take(2500))
  }

  test("m1 unpivot is a generator projection: no join, key filter pushed down") {
    val p = plan("m1_unpivot")
    assert(p.contains("Generate stack"), p.take(2500))
    assert(!p.contains("Join"), p.take(2500))
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey)"), p.take(2500))
  }

  test("prof5 broadcasts the 1-row bin spec; assignment is scan-local") {
    val p = plan("prof5_fd_histogram")
    assert("Scan parquet".r.findAllIn(p).size == 2, p.take(2500)) // stats + assign
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2500))
    assert(!p.contains("SortMergeJoin"), p.take(2500))
  }

  test("t20 derives diversity from the vocab frame: one corpus scan, no join") {
    val p = plan("t20_lexical_diversity")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(2500))
    assert(!p.contains("Join"), p.take(2500))
  }

  test("ev20 attribution runs both models on one user exchange, one scan") {
    val p = plan("ev20_attribution")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(2500))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      p.take(2500))
  }

  test("drift4 scans the stream once; KS runs on the value domain") {
    val p = plan("drift4_ks")
    // two scans total: the 1-row t0 bound + the tagged scan (drift1's
    // acknowledged two-pass shape); no join of events against events
    assert("Scan parquet".r.findAllIn(p).size == 2, p.take(2500))
    assert(!p.contains("SortMergeJoin"), p.take(2500))
  }

  test("q23 broadcasts dims; the lag window runs on the monthly frame") {
    val p = plan("q23_mom_growth")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2500))
    // the window's exchange partitions by nation, not by fact keys
    assert(p.contains("hashpartitioning(n_name"), p.take(2500))
  }

  test("j5 bucketed join needs no exchange below the join") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (to, tl) = graft.operators.Relational.bucketedOrderTables(spark, sf)
      val joined = spark.table(tl).join(spark.table(to),
        col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p.take(2500))
      assert(p.contains("SortMergeJoin"), p.take(2500))
      assert(p.contains("Bucketed: true"), p.take(2500))
      // NOTE: per-bucket Sort nodes remain — Spark 3+ no longer
      // propagates bucket sort order (SPARK-32859; legacy flag only).
      // The exchange elimination is the shuffle the layout buys.
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("gr3 excludes existing edges map-side and takes top-20 without a global sort") {
    // r17: the default regime driver-finishes the affinity-sized graph,
    // so the FINAL plan is a top-20 over a local relation (still
    // TakeOrderedAndProject, never a global sort); the distributed
    // regime's plan contract — hash LeftAnti for the existing-edge
    // exclusion, no materialized cross product — is pinned by forcing
    // driverFinishMax = 0 on the same corpus.
    val p = plan("gr3_link_prediction")
    assert(p.contains("TakeOrderedAndProject"), p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2500))
    val dist = graft.operators.Graph.linkPredictionCore(
        graft.Tables.t(spark, sf, "lineitem"), 0L)
      .queryExecution.executedPlan.toString
    assert(dist.contains("TakeOrderedAndProject"), dist.take(2500))
    assert(dist.contains("LeftAnti"), dist.take(2500))
  }

  test("fe1 broadcasts the nation dimension and the 1-row bounds frame") {
    val p = plan("fe1_hashed_features")
    assert("Broadcast".r.findAllIn(p).size >= 2, p.take(2500))
    assert(!p.contains("SortMergeJoin"), p.take(2500))
  }

  test("d13 never windows or sorts the corpus; stats ride a 1-row broadcast") {
    val p = plan("d13_curriculum")
    // the only Sort is the final output ordering; no Window anywhere
    assert(!p.contains("Window"), p.take(2500))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2, p.take(2500))
  }

  test("partition-less window sites match the bounded-frame registry") {
    // A window without partitionBy collapses its whole input onto ONE
    // task: `Window.orderBy(...)` is a single-task global sort and
    // `Window.partitionBy()` (empty) a single-task global frame. Both
    // are legal ONLY on bounded / domain-sized inputs — vocab tables,
    // distinct-value domains, k-sized seed frames, per-event-type
    // p-value lists, already-aggregated share-of-total frames — never
    // on a corpus-scale frame. This registry pins every such site so a
    // future edit cannot silently put the corpus under a global sort:
    // adding/removing one fails here and forces the bounded-frame
    // justification to be re-argued. Per-site rationale:
    //   Similarity.scala    4x orderBy — seed-frame cid assignment (3
    //                       sites, frames are k-seed-sized) + the
    //                       nprobe pick over K centroid scores for one
    //                       query vector
    //   TextAnalysis.scala  2x orderBy — vocab ranks (vocab-sized) and
    //                       a <=10-bucket cumulative frame
    //   Enrichment.scala    1x orderBy (domain caps over per-source
    //                       cap rows) + 4x empty partitionBy (grand
    //                       totals over aggregated domain frames)
    //   Relational.scala    5x orderBy — exact-ntile forms (323,
    //                       RFM triplet; seg1_rfm_approx is the sketch
    //                       twin at scale) and the Spearman rank map
    //                       over DISTINCT values + 2x empty
    //                       partitionBy (share-of-total on aggregates)
    //   Stats.scala         4x orderBy — decile cuts, domain cum-dist,
    //                       BH step-up over per-event-type p-values +
    //                       2x empty partitionBy (same frames)
    //   Quality.scala       1x empty partitionBy (share of an
    //                       aggregated per-nation order count)
    val registry = Map(
      ("operators/Similarity.scala", "orderBy") -> 4,
      ("operators/TextAnalysis.scala", "orderBy") -> 2,
      ("operators/Enrichment.scala", "orderBy") -> 1,
      ("operators/Enrichment.scala", "emptyPartitionBy") -> 4,
      ("operators/Relational.scala", "orderBy") -> 5,
      ("operators/Relational.scala", "emptyPartitionBy") -> 2,
      ("operators/Stats.scala", "orderBy") -> 4,
      ("operators/Stats.scala", "emptyPartitionBy") -> 2,
      ("operators/Quality.scala", "emptyPartitionBy") -> 1
    )
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(root),
      s"expected to run from the repo root; cwd=${System.getProperty("user.dir")}")
    val walked = java.nio.file.Files.walk(root)
    val found = try {
      import scala.jdk.CollectionConverters._
      walked.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap { p =>
          val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          val rel = root.relativize(p).toString
          Seq(
            (rel, "orderBy") ->
              "Window\\.orderBy".r.findAllIn(text).size,
            (rel, "emptyPartitionBy") ->
              "Window\\.partitionBy\\(\\)".r.findAllIn(text).size)
        }
        .filter(_._2 > 0).toMap
    } finally walked.close()
    assert(found == registry,
      "partition-less window sites changed — justify the bounded frame " +
        "and update the registry.\n" +
        s"unexpected: ${(found.toSet -- registry.toSet).toSeq.sorted}\n" +
        s"missing:    ${(registry.toSet -- found.toSet).toSeq.sorted}")
  }
}

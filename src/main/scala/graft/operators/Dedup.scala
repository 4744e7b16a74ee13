package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{t, tWide}
import graft.functions.TextFunctions.{fingerprint, tokenSet}

/** Deduplication operator family over `documents` (north-star extension,
  * SURVEY.md §2.5): exact, blocked n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB): no operator ever builds an unblocked cross join.
  *   - exact: one hash aggregate on the content fingerprint;
  *   - jaccard: candidates routed through unigram MinHash band buckets
  *     (equi-join on (band, bucket), unbounded bucket cardinality), then
  *     verified by exact token-set Jaccard — candidate count tracks
  *     duplicate density, not n²;
  *   - minhash: explode shingles → per-doc signature aggregate → LSH band
  *     buckets → equi-join on (band, bucket). Work is proportional to
  *     corpus size + true-ish candidate count, the standard web-scale dedup
  *     shape;
  *   - simhash: same banding idea on 16-bit fingerprint chunks.
  *
  * MinHash portability trick: a "permutation" is md5(seed || shingle) and
  * the signature entry is the lexicographic MIN of those hex strings — min
  * over strings is engine-portable (identical lowercase-hex md5 on both
  * sides), so the full LSH pipeline has an exact DuckDB oracle with no
  * bespoke hash functions.
  *
  * Caching note: the token/shingle frames are persisted for the duration
  * of ONE consuming action via [[graft.engine.Caching.scopedPersist]] —
  * the `(SparkSession, dir) => DataFrame` contract returns a lazy plan, so
  * an eager unpersist would run before execution; the scoped form instead
  * releases the blocks from a query-completion listener once the caller's
  * action finishes, so a long-lived session does not accumulate storage.
  * The one multi-action cache (dd5's edge frame, consumed by every
  * label-propagation round) keeps an explicit persist/unpersist pair.
  *
  * Per-query budget (round-8 closure, sf0.1 local[32] warm min-of-3 in
  * one session — round-8 BOX; later rounds' boxes run ~1.3-1.4× slower
  * suite-wide, and r14+ bench contract lines carry a calibration probe
  * (see Bench.probe) to normalize any cross-round compare — the
  * convention every absolute budget in this library follows):
  * dd2 1.6 s, dd3 2.4 s, dd4 1.4 s, dd5 3.6 s, dd7 2.3 s,
  * dd8 2.3 s, dd9 0.4 s. r13 note: the session-wide cached-plan
  * re-coalescing (GraftSession) initially moved dd3 1.65 → ~2.4 s in
  * the suite — at sf0.1 the KB-sized candidate frame coalesced below
  * CPU parallelism and the Jaccard-verify stage serialized. Closed by
  * [[spreadVerify]] (explicit numeric repartition before the verify
  * kernels): dd3 1.3 s, dd10 1.1 s in the final r13 suite, with the
  * re-coalescing's suite-wide win kept. A global 64k
  * minPartitionSize floor was A/B'd first and rejected (recovered dd3
  * but cost gr5 3×; the knob remains in Bench for future A/Bs). Each query re-tokenizes/re-signatures because
  * bench queries are deliberately independent; WITHIN each query the
  * token/shingle/signature frames are computed once (scoped persists and
  * the one-pass side emissions above), every persist decision carries its
  * A/B numbers at the call site, and the remaining cost is the banded
  * join + verify work itself, which tracks candidate count. The bench's
  * higher per-query figures (e.g. dd9 ~2 s) are first-touch session costs
  * (file listing, codegen) that amortize in any real deployment. Family
  * closed: further trims need a cross-query signature cache, which the
  * independent-query bench contract forbids.
  */
object Dedup {

  import graft.functions.TextFunctions.tokensOrdered

  /** Distinct word-bigram shingles from an ALREADY-MATERIALIZED token
    * array attribute. The token expression must not be inlined here: Spark
    * does no common-subexpression elimination inside lambda bodies, so an
    * inline split would re-tokenize the whole text for every shingle
    * (measured ~6x slowdown on the LSH pipeline).
    */
  /** Distinct shingle set (see TextFunctions.rawShingles for the
    * preconditions: materialized token attribute, size >= 2 filtered at
    * the row level — a when/otherwise guard around the HOF measurably
    * doubles the projection cost).
    */
  private[graft] def shinglesOf(tokAttr: Column): Column =
    array_distinct(graft.functions.TextFunctions.rawShingles(tokAttr))

  /** (doc_id, text) -> (doc_id, sh): tokenization and shingling as two
    * stacked projections so each runs once per row. Documents with fewer
    * than two tokens shingle to nothing and can never be candidates, so
    * they are filtered out entirely — the oracle's empty `range(1, len)`
    * produces the same absence. Parameterized over the corpus frame so
    * pipelines can shingle a cleaned/filtered corpus, not just the raw
    * table.
    *
    * Width pin BEFORE the expensive projection (r20, the supportPairsPlan
    * precedent): the corpus parquet is a single row group at bench scale,
    * so the scan — and with it the tokenize+shingle+distinct chain, the
    * most expensive per-row work in the dedup family — ran as ONE task
    * while 31 cores idled. The numeric repartition moves only the raw
    * (doc_id, text) rows and is the one form AQE must respect; hashing on
    * doc_id (not round-robin) makes the downstream verify joins'
    * cached-side distribution explicit. At production scale a 100 TB
    * corpus arrives in thousands of splits and the pin is a no-op-shaped
    * rebalance; at toy scale it is the difference between serial and
    * parallel shingling (measured r20 same-box warm min-of-3 together
    * with the scan-local signature fusion below: dd3 2.24 → 1.88 s Prof,
    * 1.42 s bench-isolated; full-width was ALSO tried and lost — 32
    * near-empty tasks per downstream stage cost more than the extra
    * parallelism bought, hence the quarter-width).
    */
  private[graft] def shingledOf(docs: DataFrame): DataFrame =
    graft.Tables.wide(docs, col("doc_id"))
      .select(col("doc_id"), tokensOrdered(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), shinglesOf(col("t")).as("sh"))

  private[graft] def shingled(spark: SparkSession, dir: String): DataFrame =
    shingledOf(t(spark, dir, "documents").select(col("doc_id"), col("text")))

  /** The synthetic train-copy id shift the dd1/dd6/dd7 harness queries use
    * to manufacture duplicate/contamination structure from the dup-free
    * driver corpus. GUARDED: a corpus id at or above the shift would
    * collide with the shifted range — merging two different documents'
    * signatures, landing an "eval" doc on the train side of dd7's
    * predicate — and silently corrupt results, so [[shiftGuardedId]]
    * raises at evaluation time instead. The guard is the identity on any
    * valid corpus, so the oracles need no twin. (Real cross-corpus
    * operators would take two frames with independent id spaces; the
    * shift exists only so ONE test corpus can play both roles.)
    */
  private[graft] val IdShift = 1000000L

  private def shiftGuardedId: Column =
    when(col("doc_id") >= IdShift,
      raise_error(concat(
        lit(s"id-shift harness requires doc_id < $IdShift, got: "),
        col("doc_id").cast("string"))))
      .otherwise(col("doc_id"))

  /** The deterministic eval-split carve shared by dd6, dd7 and pipe1:
    * documents whose md5(id) leads below '4' (~1/4 of the corpus) are the
    * held-out benchmark. ONE definition per engine — a fraction or cast
    * change in a single site would silently desynchronize the train/eval
    * split between the contamination checks and the composed pipeline.
    */
  private[graft] def isEvalSplit(id: Column): Column =
    substring(md5(id.cast("string")), 1, 1) < "4"

  /** [[isEvalSplit]]'s DuckDB twin. */
  private[graft] def sqlIsEvalSplit(id: String): String =
    s"substr(md5($id::VARCHAR), 1, 1) < '4'"

  /** [[isEvalSplit]]'s DRIVER twin (r18) — the same md5-of-decimal-string
    * first-hex-digit rule, for regime-gated tails that compute the
    * contamination carve on a collected assignment
    * ([[graft.engine.Pipelines]]'s curatedSurvivors). First hex digit
    * < '4' ⟺ top nibble of the digest < 4; DedupSpec asserts agreement
    * with the SQL expression over an id range so the three twins cannot
    * drift.
    */
  private[graft] def isEvalSplitLocal(id: Long): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) >> 4) & 0xf) < 4
  }

  /** Exact dedup by content fingerprint: canonical = min doc_id per group.
    * Input is documents unioned with an id-shifted copy of itself so real
    * duplicate groups exist to collapse (the driver corpus is dup-free).
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val copies = docs.select((shiftGuardedId + IdShift).as("doc_id"), col("text"))
    docs.unionAll(copies)
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(min("doc_id").as("canonical_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("canonical_doc_id")
  }

  /** Word-set Jaccard near-dup pairs, MinHash-band routed: candidates are
    * pairs colliding in >= 1 of 4 LSH bands over an 8-entry unigram MinHash
    * signature; collisions are verified with the EXACT hashed-token-set
    * Jaccard and emitted at >= 0.6.
    *
    * This replaces the round-1/2 fixed-cardinality (lang, n_chars DIV 50)
    * blocking, whose within-block pair count grew quadratically with corpus
    * size. Band buckets have unbounded cardinality (md5 of two 16-bit
    * minhash windows), so candidate count tracks DUPLICATE DENSITY, not n²:
    * unrelated documents collide in a band with probability j^2 per band
    * (j = true Jaccard), vanishing for the non-dup mass. Recall at the 0.6
    * threshold is 1-(1-0.36)^4 ~ 0.83 per the standard S-curve and rises
    * steeply above it — the oracle replicates the identical candidate
    * generation, so the gate checks the algorithm, not recall.
    *
    * Hot buckets are CAPPED (same [[HotBucketCap]] rule as dd4): the driver
    * corpus is template-generated — ~60% of ALL doc pairs share unigram
    * Jaccard >= 0.55, so the uncapped ">= 0.6 pair set" itself is quadratic
    * in corpus size (measured 9.7M band candidates over 5000 docs). No
    * candidate scheme outruns a quadratic OUTPUT; the cap bounds each
    * (band, bucket)'s contribution to C·(C-1)/2 deterministically-chosen
    * pairs, which is the standard web-scale mitigation (drop/truncate hot
    * buckets; an all-pairs listing of a 60%-duplicative corpus is not a
    * dedup result anyone consumes — dd1's exact groups and dd5's canonical
    * assignment are).
    */
  def jaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    // Tokenize ONCE, cache, and derive both the signature stream and the
    // verify-side sets from the cached frame (tokenization is the dominant
    // per-doc cost; it must not run once per plan subtree).
    val toks = graft.engine.Caching.scopedPersist(
      tWide(spark, dir, "documents")
        .select(col("doc_id"), tokenSet(col("text")).as("tks")))
    // Token sets are hashed to 60-bit ints (15 hex chars of md5) BEFORE
    // the pairwise stage: array_intersect on primitive longs beats string
    // sets by a wide margin. Portable bit-for-bit — the oracle applies the
    // identical hash, so even a collision (which would merge two tokens)
    // produces the same count on both engines.
    val p = toks.select(col("doc_id"),
      array_distinct(transform(col("tks"),
        x => conv(md5(x).substr(1, 15), 16, 10).cast("long"))).as("ts"))
    // One md5 per distinct token; the 8 "permutations" are its disjoint
    // 4-hex-char windows — the SAME signatures() aggregate dd3 uses on
    // shingles, so the two schemes cannot drift.
    val cand = unigramBandCandidates(toks)
    // Size-ratio prefilter: jaccard <= min/max set sizes, so candidates
    // below the threshold on sizes alone never pay for an intersection.
    // The bound uses the ROUND-ADJUSTED threshold (0.59995): the final
    // filter keeps round(j,4) >= 0.6, i.e. true j >= 0.59995, and since
    // size-ratio >= j the guard can never drop a pair the final filter
    // would keep — the oracle needs no guard.
    val sizeGuard =
      least(size(col("a.ts")), size(col("b.ts"))).cast("double") /
        greatest(size(col("a.ts")), size(col("b.ts"))) >= 0.59995
    cand.join(p.alias("a"), col("doc_a") === col("a.doc_id"))
      .join(p.alias("b"), col("doc_b") === col("b.doc_id"))
      .filter(sizeGuard)
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("a.ts"), col("b.ts"))).as("i"),
        (size(col("a.ts")) + size(col("b.ts"))).as("su"))
      .select(col("doc_a"), col("doc_b"),
        round(col("i").cast("double") / (col("su") - col("i")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .orderBy("doc_a", "doc_b")
  }

  /** Candidate (doc_a < doc_b) pairs from the unigram MinHash band route —
    * the shared front half of dd2 and dd10, which differ only in their
    * verifier (token-set Jaccard vs character edit distance). Input is the
    * tokenized frame `(doc_id, tks)`; bands/caps are dd2's documented
    * scheme (4 bands x 2 of 8 windows, [[HotBucketCap]]).
    */
  private def unigramBandCandidates(toks: DataFrame): DataFrame = {
    val sig = signatures(toks.select(col("doc_id"), col("tks").as("sh")))
    val bb = capHotBuckets(bandBuckets(sig), "band", "bucket")
    bb.alias("x").join(bb.alias("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** dd10 — edit-distance verified near-dup pairs: the dd2 candidate route
    * re-verified at the CHARACTER level. Token-set Jaccard (dd2) is blind
    * to within-token edits and char-level noise that happens to preserve
    * the token multiset; normalized Levenshtein similarity
    * `1 - lev/max(len)` is the record-linkage-standard complement. The
    * corpus is bimodal under it (template near-dups >= 0.99 vs unrelated
    * < 0.5 at sf0.01), so the 0.8 threshold is both non-vacuous and far
    * from the mass on either side.
    *
    * Scale: Levenshtein is O(len_a * len_b) per pair — the expensive
    * verifier — so it runs ONLY on band-routed, hot-capped candidates that
    * ALSO survive a length-ratio prefilter (lev >= |len_a - len_b|, hence
    * sim <= 1 - |diff|/max: pairs failing on lengths alone never pay for
    * the DP matrix; the round-adjusted 0.79995 bound cannot drop a kept
    * pair, so the oracle needs no guard) — and even then through the
    * BANDED `levenshtein(l, r, threshold)` form, whose per-pair threshold
    * provably returns the exact distance for every pair the 0.8 filter
    * can keep (see the inline derivation).
    */
  def editDistancePairs(spark: SparkSession, dir: String): DataFrame =
    editDistanceCore(
      t(spark, dir, "documents").select(col("doc_id"), col("text")))

  /** dd10 over an explicit `(doc_id, text)` frame — DedupSpec drives the
    * character-level paths (typo'd copies, token-preserving noise) on a
    * planted corpus the template-generated driver data cannot cover.
    */
  private[graft] def editDistanceCore(docs: DataFrame): DataFrame = {
    // tokenize once, single consumer (the signature stream) — no persist;
    // spreadVerify: the DP kernel below is the costliest verifier in the
    // family, never let bytes-based coalescing serialize it
    val cand = spreadVerify(unigramBandCandidates(
      docs.select(col("doc_id"), tokenSet(col("text")).as("tks"))))
    val texts = docs.select(col("doc_id"), col("text"),
      length(col("text")).as("len"))
    val ml = greatest(col("a.len"), col("b.len"))
    // Any pair the final filter keeps has d <= 0.20005 * ml (round(sim,4)
    // >= 0.8  <=>  d <= 0.20005 * ml), so banding the DP at that per-pair
    // threshold is exact for every keepable pair: the O(len * threshold)
    // early-exit algorithm replaces the O(len^2) full matrix, returning
    // -1 (dropped below — it would fake sim > 1 in the ratio) only for
    // pairs the threshold proves are below the bar anyway. The oracle
    // needs no threshold: DuckDB's two-arg form computes the same d for
    // every surviving pair. EvalOnce pins the DP in its projection —
    // without it the pushed filter would run the matrix twice per pair.
    val thr = ceil(lit(0.20005) * ml).cast("int")
    cand.join(texts.alias("a"), col("doc_a") === col("a.doc_id"))
      .join(texts.alias("b"), col("doc_b") === col("b.doc_id"))
      .filter(lit(1.0) - abs(col("a.len") - col("b.len")).cast("double") /
        ml >= 0.79995)
      .select(col("doc_a"), col("doc_b"), ml.as("ml"),
        graft.functions.EvalOnce.once(
          call_function("levenshtein", col("a.text"), col("b.text"), thr))
          .as("d"))
      .filter(col("d") >= 0)
      .select(col("doc_a"), col("doc_b"),
        round(lit(1.0) - col("d").cast("double") / col("ml"), 4).as("edit_sim"))
      .filter(col("edit_sim") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  private val NumHashes = 8
  private val BandSize = 2 // 4 bands x 2 rows

  /** Per-doc MinHash signature from an (already shingled) frame: ONE md5
    * per shingle, with the 8 "permutations" taken as the md5's disjoint
    * 4-hex-char windows (16 bits each — plenty against ~10^2
    * shingles/doc). 8x less hashing than md5-per-seed at identical
    * portability: substr windows of the same lowercase hex are independent
    * orderings on both engines.
    *
    * SCAN-LOCAL (r20): the shingle set already lives in one array per
    * row, so the per-window minimum is an `array_min` over a lambda
    * projection — no explode, no groupBy, no shuffle. The r2–r19 form
    * exploded every shingle through a corpus-sized hash aggregate, which
    * charged every banded query (dd3/dd5/dd7/dd9/dd11/pr1/pipe1/pipe3)
    * one full exchange + AQE stage for an aggregation whose groups were
    * exactly the input rows. `array_min` skips nulls like the `min`
    * aggregate, and the md5 array is pinned behind [[graft.functions.EvalOnce]]
    * so CollapseProject cannot inline the hashing 8x into the window
    * minima. Rows with an empty shingle array produced no signature under
    * the explode (and must produce none here — `concat_ws` would
    * otherwise band their all-null signature as md5("")): the size guard
    * reproduces that absence for any input frame.
    */
  private def signatures(sh: DataFrame): DataFrame = {
    val hashed = sh.filter(size(col("sh")) >= 1)
      .select(col("doc_id"),
        graft.functions.EvalOnce.once(
          transform(col("sh"), s => md5(s))).as("hs"))
    val aggs = (0 until NumHashes).map(k =>
      array_min(transform(col("hs"),
        h => substring(h, k * 4 + 1, 4))).as(s"s$k"))
    hashed.select(col("doc_id") +: aggs: _*)
  }

  /** LSH band buckets in long format (doc_id, band, bucket). */
  private def bandBuckets(sig: DataFrame): DataFrame = {
    val bands = (0 until NumHashes / BandSize).map { b =>
      val cols = (b * BandSize until (b + 1) * BandSize).map(k => col(s"s$k"))
      struct(lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("bucket"))
    }
    sig.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** MinHash+LSH near-dup pairs: candidates collide in >= 1 band; verified
    * by exact shingle-Jaccard >= 0.7.
    *
    * The shingle frame is tokenized+shingled ONCE, cached, and feeds all
    * three of its consumers (the signature explode and both verify sides) —
    * round 2 re-ran the full tokenize+shingle projection three times, which
    * tripled dd3's bench cost. MIN is duplicate-insensitive, so the
    * signature path loses nothing by consuming the distinct shingles.
    */
  /** Explicit verify-stage parallelism: candidate pair frames are
    * KB-sized in BYTES but each row costs an expensive kernel
    * (array_intersect over shingle sets, banded Levenshtein), so AQE's
    * bytes-based coalescing serializes exactly the stage that needs
    * every core — measured at sf0.1/local[32] (64k-floor A/B): dd3
    * 2.4 → 1.5 s, dd10 3.2 → 1.2 s once the verify runs wide. A
    * NUMERIC repartition is the one form AQE must respect;
    * `defaultParallelism` scales with the cluster, and a candidate set
    * far larger than it just means more rows per task (the kernel is a
    * streamed projection — no spill surface).
    */
  private def spreadVerify(cand: DataFrame): DataFrame =
    cand.repartition(
      cand.sparkSession.sparkContext.defaultParallelism, col("doc_a"))

  /** Candidate generation + exact-Jaccard verification over an (already
    * cached) shingle frame — the reusable core of dd3, consumed by dd5's
    * edge build and pipe1's dedup stage. Returns the LAZY pair plan:
    * persistence is the CALLER's decision, made at each call site where
    * the consumption shape is visible ([[minhashLsh]], [[clustersOf]]) —
    * not buried here where one policy must fit all consumers.
    */
  private[graft] def verifiedPairsOf(sh: DataFrame): DataFrame = {
    val bb = capHotBuckets(bandBuckets(signatures(sh)), "band", "bucket")
    val cand = spreadVerify(bb.alias("x").join(bb.alias("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct())
    val verified = cand.join(sh.alias("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.alias("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa.sh"), col("sb.sh"))).as("i"),
        (size(col("sa.sh")) + size(col("sb.sh"))).as("su"))
      .select(col("doc_a"), col("doc_b"),
        round(col("i").cast("double") / (col("su") - col("i")), 4).as("shingle_jaccard"))
      .filter(col("shingle_jaccard") >= 0.7)
    verified
  }

  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = graft.engine.Caching.scopedPersist(shingled(spark, dir))
    // The pair set IS persisted here even though the sort is its only
    // consumer — MEASURED, not assumed: single-shot at sf0.1/local[32] on
    // Spark 4.1.2, dd3 runs ~5.8 s with this persist vs 7.6–9.1 s without
    // (three trials each). The cache boundary lets the verify joins
    // finalize adaptively from the materialized pair stats instead of
    // planning against the full join-tree estimates; the barrier it
    // inserts is pair-set-sized and costs less than the re-planned work.
    graft.engine.Caching.scopedPersist(verifiedPairsOf(sh))
      .orderBy("doc_a", "doc_b")
  }

  /** Hot-bucket guard for every banded candidate join: within each
    * (band, bucket) partition only the HotBucketCap lowest ids generate
    * pairs. On a
    * boilerplate-heavy corpus (many near-identical documents sharing every
    * band chunk) the band join is otherwise quadratic in the hot bucket's
    * population; the cap bounds any bucket's contribution at C·(C-1)/2
    * pairs while leaving organically-sized buckets untouched. Deterministic
    * (rank by doc_id), so the oracle applies the identical rule. The ranking
    * shuffles on the SAME (band, chunk) key the join uses — one extra sort
    * within buckets, never a second shuffle exchange.
    */
  private[graft] val HotBucketCap = 64

  /** The cap as a plan transform: keep the HotBucketCap lowest ids per
    * (band, bucket) partition. The ranking shuffles on the SAME key the
    * subsequent pair join uses — one extra in-bucket sort, no second
    * exchange. Shared by EVERY banded candidate join (dd2, dd3, dd4,
    * sim3) so the rule cannot drift between schemes.
    *
    * `sideCols` extends the cap partition for CROSS-corpus joins (dd7):
    * capping a mixed bucket by global id order alone would keep only the
    * side with the smaller ids (the eval side, whose ids sort below every
    * shifted train id) and evict the other side entirely — zero cross
    * pairs from exactly the hottest (most contamination-prone) buckets.
    * Capping per (band, bucket, side) keeps up to HotBucketCap members of
    * EACH side; a bucket's cross-pair contribution stays bounded at Cap².
    */
  private[graft] def capHotBuckets(
      df: DataFrame, bandCol: String, bucketCol: String,
      idCol: String = "doc_id", sideCols: Seq[Column] = Nil): DataFrame =
    df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(bandCol) +: col(bucketCol) +: sideCols: _*)
          .orderBy(idCol)))
      .filter(col("rn") <= HotBucketCap).drop("rn")

  /** [[capHotBuckets]]'s DuckDB mirror, generated from ONE template for
    * every oracle (dd2/dd3/dd4/sim3) so the SQL rule cannot drift from the
    * Spark helper or between schemes. `cols` are the carried output
    * columns; no generated line is margin-prefixed, so interpolating into
    * stripMargin strings is safe.
    */
  private[graft] def sqlCapCte(
      out: String, src: String, cols: Seq[String],
      bandCol: String, bucketCol: String, idCol: String,
      sideCols: Seq[String] = Nil): String = {
    val cl = cols.mkString(", ")
    val part = (Seq(bandCol, bucketCol) ++ sideCols).mkString(", ")
    s"""$out AS (
       |  SELECT $cl FROM (
       |    SELECT $cl,
       |      row_number() OVER (PARTITION BY $part ORDER BY $idCol) AS rn
       |    FROM $src)
       |  WHERE rn <= $HotBucketCap)""".stripMargin
  }

  /** 60-bit SimHash per document plus banded near-dup pair counts. The
    * token hash is the 60-bit md5 prefix (same portable hash as the
    * Jaccard stage), so the ENTIRE pipeline — votes, fingerprint, 15-bit
    * bands, hamming distances — is engine-portable and fully
    * oracle-checked (DuckDB has >>, &, xor, bit_count on BIGINT).
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    // SCAN-LOCAL votes (r20, the dd3 signatures precedent): the per-doc
    // bit votes were an explode through a corpus-sized 60-column hash
    // aggregate whose groups were exactly the input rows. The token set
    // already lives in one array per row, so vote_i = 2·|{h: bit i
    // set}| − |set| is a filter-size fold over the hashed array — no
    // explode, no exchange. EvalOnce pins the md5 array against
    // CollapseProject inlining the hashing 60x; the size ≥ 1 guard
    // reproduces the explode's empty/null-token-set absence. Same-box
    // isolated min-of-4 A/B at sf0.1: 1.468 -> 1.219 s.
    val hs = graft.functions.EvalOnce.once(
      transform(tokenSet(col("text")),
        tok => conv(md5(tok).substr(1, 15), 16, 10).cast("long")))
    val fp = (0 until 60).map(i =>
      when(lit(2) * size(filter(col("hs"),
            h => shiftright(h, i).bitwiseAND(1) === 1)) - size(col("hs")) > 0,
        shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val fps = tWide(spark, dir, "documents")
      .select(col("doc_id"), hs.as("hs"))
      .filter(size(col("hs")) >= 1)
      .select(col("doc_id"), fp.as("fp"))
    val bands = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("fp"), b * 15).bitwiseAND(0x7FFFL).as("chunk")))
    val raw = fps.select(col("doc_id"), col("fp"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("fp"),
        col("bb.band").as("band"), col("bb.chunk").as("chunk"))
    val bb = capHotBuckets(raw, "band", "chunk")
    val ham = bit_count(col("x.fp").bitwiseXOR(col("y.fp")))
    bb.alias("x").join(bb.alias("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        ham.cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("hamming")
  }

  /** Canonical-assignment dedup: every document mapped to the minimum
    * doc_id of its connected component in the dd3 (MinHash-verified)
    * near-dup graph — singletons map to themselves. This is the LINEAR
    * dedup output a training pipeline actually consumes (keep canonical,
    * drop the rest), as opposed to the quadratic-in-cluster-size pair
    * listings of dd2/dd3.
    *
    * Algorithm: min-label propagation with pointer doubling. Each round
    * (a) lowers every node's label to the min over its neighbors' labels
    * (one equi-join + aggregate), then (b) replaces every label by its
    * label's label (one self-join — path halving), so convergence takes
    * O(log(diameter)) distributed rounds rather than O(diameter). Each
    * round is shuffle-bounded by |edges|; the driver only checks a
    * convergence count per round and `localCheckpoint` truncates the
    * iterative lineage. The same loop shape runs unchanged on a
    * 1000-executor cluster (it is the standard large-graph CC recipe).
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    clustersOf(t(spark, dir, "documents").select(col("doc_id"), col("text")))
      .orderBy("doc_id")

  /** The canonical-assignment core over an arbitrary `(doc_id, text)`
    * corpus frame — dd5 runs it on the raw table, pipe1 on the
    * cleaned+quality-filtered corpus. Returns the unordered
    * `(doc_id, canonical_doc_id)` assignment (one row per input doc).
    */
  private[graft] def clustersOf(docs: DataFrame): DataFrame =
    clusterAssignmentOf(docs) match {
      case Right(labels) => labels
      case l @ Left(_) =>
        reassemble(docs.select(col("doc_id")), l)
          .toDF("doc_id", "canonical_doc_id")
    }

  /** [[clustersOf]]'s regime-exposing form (r18): `Left` — the collected
    * active `(doc_id, canonical_doc_id)` pairs (canon ≠ id,
    * broadcast-sized by the [[DriverFinishEdges]] bound); `Right` — the
    * full corpus-sized label frame, exactly [[clustersOf]]'s output.
    * pipe1/pipe3's tail uses the Left regime to replace two
    * corpus-shuffle joins, a distinct, and a corpus-sized scoped cache
    * with one broadcast join and a driver-computed contamination set.
    * The shingle/verify prelude lives ONLY here ([[clustersOf]]
    * delegates), so the pipeline assembly cannot fork between the dd5
    * and pipe1 paths.
    */
  private[graft] def clusterAssignmentOf(
      docs: DataFrame): Either[Seq[(Long, Long)], DataFrame] =
    clusterAssignmentPreShingled(docs.select(col("doc_id")),
      graft.engine.Caching.scopedPersist(shingledOf(docs)))

  /** [[clusterAssignmentOf]] over a PRE-SHINGLED corpus (r20): callers
    * that already materialized `(doc_id, sh)` — pipe1/pipe3's scored
    * checkpoint carries the shingle array so the cleaning pass's one
    * tokenization serves both scoring and dedup — feed it straight into
    * the banded core with no second tokenize pass and no separate shingle
    * cache (the checkpoint blocks serve the signature path and both
    * verify sides). `nodes` must cover ALL corpus ids (including docs too
    * short to shingle); `sh` rows must have non-empty shingle arrays.
    */
  private[graft] def clusterAssignmentPreShingled(
      nodes: DataFrame, sh: DataFrame): Either[Seq[(Long, Long)], DataFrame] =
    componentsAssignment(nodes,
        verifiedPairsOf(sh).select(col("doc_a"), col("doc_b"))) match {
      case l @ Left(_) => l
      case r @ Right(_) =>
        Right(reassemble(nodes, r).toDF("doc_id", "canonical_doc_id"))
    }

  /** Edge-count bound under which [[componentsOf]] finishes on the driver:
    * at or below it the pair list is broadcast-build-side sized (1M long
    * pairs ≈ 16 MB of ids — the regime where Spark itself would collect a
    * join side to the driver), and sequential union-find labels it in
    * O(E·α(E)) — microseconds per edge — replacing O(log diameter)
    * distributed rounds that each cost two shuffle joins, a checkpoint,
    * and a convergence action. Above the bound the distributed loop runs
    * unchanged, so corpus-scale edge lists (a 100 TB corpus's near-dup
    * graph) never route through the driver: this is the broadcast-vs-
    * shuffle join decision applied to connected components, with sim16's
    * driver eigen-solve (MLlib's RowMatrix precedent) as the house
    * precedent for finishing bounded-size tails locally.
    */
  private[graft] val DriverFinishEdges = 1000000L

  /** Generic min-label connected components over an undirected edge list —
    * THE one clustering implementation, shared by dd5/dd11/pipe1/pipe3
    * (shingle near-dup graph over documents) and sim6 (embedding near-dup
    * graph over vectors). `nodes` is a one-column id frame; `pairsIn` a
    * two-column edge frame. Returns the unordered `(id, canon)` assignment
    * under the input's id column name plus `canon` — callers rename.
    *
    * Two regimes, decided by ONE count on the persisted pair frame:
    *
    * - **Driver finish** (≤ `driverFinishMax` edges, all-long id columns):
    *   collect the pairs and run union-find with path halving + union-by-
    *   min, then label `nodes` through a broadcast join against the
    *   resulting assignment. See [[DriverFinishEdges]] for why this is the
    *   broadcast-join regime, not a driver-side anti-pattern.
    * - **Distributed loop** (above the bound, or non-long ids): min-label
    *   propagation with pointer doubling, SEEDED at round 1's state —
    *   from all-self labels the first lower-then-halve round computes
    *   exactly label(v) = min(v, min neighbor id) (path halving is the
    *   identity on self-labels), so one aggregate over the edge frame
    *   replaces a full propagation round. Each subsequent round (a)
    *   lowers every node's label to the min over its neighbors' labels
    *   (one equi-join + aggregate), then (b) replaces every label by its
    *   label's label (one self-join — path halving), converging in
    *   O(log diameter) rounds. Each round is shuffle-bounded by |edges|;
    *   `localCheckpoint(eager = false)` folds block materialization into
    *   the round's ONE action (the convergence count).
    *
    * In both regimes propagation runs only over the ACTIVE subgraph (ids
    * touching at least one edge) — untouched ids are self-canonical by
    * definition and rejoin at the end (left join + coalesce).
    *
    * Cost (the r16 change): the loop's per-round stages are latency-
    * bounded at any toy scale (each exchange is an AQE query stage — a
    * driver re-plan round-trip — and each round adds a count action), so
    * the five call sites paid ~0.5–1.5 s each for graphs of a few
    * thousand edges. Measured same-box back-to-back A/B at sf0.1
    * (bench convention, min-of-2, probes 0.25/0.19 vs 0.26/0.20):
    * dd5 2.89 → 1.96 s, dd11 3.69 → 2.80 s, sim6 1.56 → 1.01 s,
    * pipe1 5.96 → 4.35 s, pipe3 5.63 → 4.36 s — −5.3 s (−27%) across
    * the family, with the distributed loop bit-identical on the same
    * graphs (DedupSpec runs every contract test in both regimes).
    */
  private[graft] def componentsOf(
      nodes: DataFrame, pairsIn: DataFrame,
      driverFinishMax: Long = DriverFinishEdges): DataFrame =
    reassemble(nodes, componentsAssignment(nodes, pairsIn, driverFinishMax))

  /** THE one full-label-frame assembly over an active assignment (r18,
    * per-round review — one copy, so the broadcast-vs-frame rejoin shape
    * cannot drift between [[componentsOf]] and [[clusterAssignmentOf]]):
    * every node not in the active assignment is self-canonical
    * (left join + coalesce); a `Left` ships the collected pairs as a
    * broadcast, a `Right` joins the distributed label frame.
    */
  private def reassemble(
      nodes: DataFrame,
      active: Either[Seq[(Long, Long)], DataFrame]): DataFrame = {
    val idName = nodes.columns.head
    val activeLabels = active match {
      case Left(assign) =>
        val spark = nodes.sparkSession
        import spark.implicits._
        broadcast(assign.toDF("nid", "cmin"))
      case Right(labels) =>
        labels.select(col("nid"), col("canon").as("cmin"))
    }
    nodes
      .join(activeLabels, col(idName) === col("nid"), "left")
      .select(col(idName),
        coalesce(col("cmin"), col(idName)).as("canon"))
  }

  /** [[componentsOf]]'s regime-exposing core (r18): `Left` — the
    * driver-finish ACTIVE assignment as collected `(id, canon)` pairs
    * with `canon != id` (bounded by 2·[[DriverFinishEdges]] entries, so
    * always broadcast-sized); `Right` — the distributed loop's converged
    * active label frame `(nid, canon)`. Exposed so pipeline tails in the
    * driver regime (pipe1/pipe3's contamination carve) can consume the
    * assignment as a broadcast + driver set instead of corpus-shuffle
    * joins against the reconstructed full label frame; [[componentsOf]]
    * assembles the classic full frame from either regime.
    */
  private[graft] def componentsAssignment(
      nodes: DataFrame, pairsIn: DataFrame,
      driverFinishMax: Long = DriverFinishEdges): Either[Seq[(Long, Long)], DataFrame] = {
    // Explicit persist (not scopedPersist): componentsOf runs its own
    // internal actions — the regime-deciding count, then either the
    // collect or the seed checkpoint — and a scoped cache would be
    // released by the FIRST of them, recomputing the (typically
    // expensive) pair plan for the second. Lifecycle is owned here:
    // unpersisted as soon as the surviving regime has materialized what
    // it needs (the union-find arrays, or the adjacency blocks).
    // Null endpoints are dropped up front so the two regimes agree: the
    // distributed loop would silently lose them to join/aggregate null
    // semantics while the driver finish's getLong would NPE — same input
    // must mean the same graph in both. A half-null edge is no edge.
    // Cost adjudication (r17): a full-suite run read dd5 2.41 s vs the
    // official r16 artifact's 1.57 s — exactly at the 1.5x dual-ratio
    // bar — so the guard was A/B'd back-to-back on the same box
    // (min-of-3, spin 0.33 both): 2.171 s WITH the na.drop vs 2.393 s
    // WITHOUT. The guard is exonerated; the 1.57 s reading was that
    // run's box state (today's band on both forms is ~2.2-2.4 s).
    // r18 confirmation: isolated min-of-3 on a quiet box (spin 0.33,
    // load1 1.3) reads dd5 2.27 s — inside the adjudicated band; the
    // r16 official 1.57 s stands as the outlier.
    val pairs = pairsIn.toDF("pa", "pb").na.drop()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val allLong = (pairs.schema.fields.map(_.dataType) :+
      nodes.schema.fields.head.dataType)
      .forall(_ == org.apache.spark.sql.types.LongType)
    if (allLong && pairs.count() <= driverFinishMax) {
      val parent = new scala.collection.mutable.LongMap[Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) {
          val p = parent(r)
          parent(r) = parent.getOrElse(p, p) // path halving
          r = parent(r)
        }
        r
      }
      pairs.collect().foreach { row =>
        val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
        // union-by-min keeps every root at its component's minimum id
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val assign = parent.keys.toSeq.map(k => (k, find(k)))
        .filter { case (k, r) => k != r } // self-rooted rows add nothing
      pairs.unpersist(blocking = false)
      return Left(assign)
    }
    val adj = pairs.union(pairs.select(col("pb"), col("pa")))
      .toDF("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // EAGER seed checkpoint — the lazy form (dd5's trick, folding block
    // materialization into round 1's convergence count to save one
    // scheduler round-trip) was A/B'd in r14 and REJECTED: round 1
    // consumes the seed in two subtrees (neighbor aggregate +
    // path-halving join), and without an eager materialization both
    // compute the edges-sized seed aggregate concurrently before its
    // blocks land — measured same-box min-of-2 at sf0.1/local[32]:
    // sim6 1.89 → 2.37 s, pipe3 6.60 → 7.70 s, pipe1 7.26 → 7.80 s
    // lazy-vs-eager. The saved action is worth less than the duplicated
    // aggregate at every scale (the seed is |edges|-shaped).
    var labels = adj.groupBy(col("src").as("nid"))
      .agg(min(col("dst")).as("m"))
      .select(col("nid"), least(col("nid"), col("m")).as("canon"))
      .localCheckpoint()
    // The eager seed materialized adj's blocks, adj's union was the pair
    // cache's second and last reader — release it before the rounds run.
    pairs.unpersist(blocking = false)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val nbrMin = adj.join(labels, col("dst") === col("nid"))
        .groupBy(col("src")).agg(min(col("canon")).as("nbr"))
      val lowered = labels.join(nbrMin, col("nid") === col("src"), "left")
        .select(col("nid"), col("canon"),
          least(col("canon"), coalesce(col("nbr"), col("canon"))).as("c1"))
      val halved = lowered.alias("l")
        .join(labels.select(col("nid").as("pid"), col("canon").as("pcanon")),
          col("c1") === col("pid"))
        .select(col("l.nid").as("nid"), col("l.canon").as("prev"),
          least(col("c1"), col("pcanon")).as("canon"))
        .localCheckpoint(eager = false)
      changed = halved.filter(col("canon") < col("prev")).count()
      labels = halved.select(col("nid"), col("canon"))
      rounds += 1
    }
    // Unconverged labels are WRONG labels (not component minima) — a
    // pathological component that outlives the round cap must fail loudly,
    // never return a plausible-looking misassignment.
    if (changed > 0) throw new IllegalStateException(
      s"componentsOf: label propagation did not converge in $rounds rounds")
    adj.unpersist()
    Right(labels.select(col("nid"), col("canon")))
  }

  /** Benchmark-contamination check — the train/eval overlap scan every
    * training pipeline runs before release: which training documents are
    * verbatim (normalized-fingerprint) copies of held-out evaluation
    * documents? The "eval" split is carved deterministically (md5 of the
    * doc_id, first hex digit < '4' — ~1/4 of the corpus) and the
    * "training" corpus is the id-shifted full copy (the driver corpus has
    * no planted cross-set dups, so the copy guarantees every eval doc has
    * exactly one hit to find).
    *
    * Scale shape: one fingerprint projection of each side and a single
    * shuffle equi-join on the fingerprint — the contaminated-pair output
    * is eval-hit sized. No windows, no bands; exact containment needs
    * nothing fancier (near-dup contamination is dd2/dd3's machinery
    * pointed across corpora).
    */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val fps = t(spark, dir, "documents")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
    val evalSet = fps
      .filter(isEvalSplit(col("doc_id")))
      .select(col("doc_id").as("eval_doc_id"), col("fp"))
    val trainSet = fps.select((shiftGuardedId + IdShift).as("train_doc_id"), col("fp"))
    trainSet.join(evalSet, "fp")
      .select(col("eval_doc_id"), col("train_doc_id"))
      .orderBy("eval_doc_id", "train_doc_id")
  }

  /** NEAR-dup cross-corpus contamination — the realistic form of eval
    * leakage dd6's verbatim check misses: a training document that is a
    * lightly-edited copy of a held-out eval document. This is dd3's
    * machinery pointed ACROSS the train/eval split: one shingle pass over
    * the combined corpus, MinHash band candidates restricted to
    * cross-corpus pairs, exact shingle-Jaccard >= 0.7 verification. The
    * split follows dd6's conventions — eval = the md5-carved ~1/4 of the
    * corpus, train = the id-shifted full copy (every eval doc is
    * guaranteed its verbatim hit at jaccard 1.0; the corpus's organic
    * near-dups supply the lightly-edited ones).
    *
    * Scale shape: identical to dd3 — candidate count tracks cross-corpus
    * duplicate density (band collisions), never |train| x |eval|; hot
    * buckets share the one [[capHotBuckets]] rule; output is
    * eval-hit-sized. The cross-side predicate on the banded equi-join
    * costs nothing extra: eval ids < 1000000 <= train ids, so it is the
    * same "ordered pair" shape with the split point fixed.
    */
  def nearContamination(spark: SparkSession, dir: String): DataFrame = {
    // Shingle ONCE; both corpus sides and both verify sides derive from
    // the cached frame with cheap projections. The signature aggregate
    // deliberately runs over the 1.25x union rather than once + a cached
    // filter/shift split: measured, the extra hashing of the eval quarter
    // is cheaper than the cache materialization barrier that the split
    // inserts before band bucketing (3.0 s vs 4.2 s at sf0.1).
    val base = graft.engine.Caching.scopedPersist(
      shingled(spark, dir).select(shiftGuardedId.as("doc_id"), col("sh")))
    val evalSide = base.filter(isEvalSplit(col("doc_id")))
    val trainSide = base.select((col("doc_id") + IdShift).as("doc_id"), col("sh"))
    val corpus = evalSide.unionAll(trainSide)
    val verified = crossVerifiedPairs(corpus)
      .toDF("eval_doc_id", "train_doc_id", "shingle_jaccard")
    // Persist-before-sort, same measured decision as dd3 (minhashLsh):
    // single-shot at sf0.1/local[32], ~3.4 s with this persist vs
    // 4.3–5.1 s without. The cache boundary lets the verify joins finalize
    // adaptively from the materialized pair stats; the barrier is
    // pair-set-sized. (dd2 was A/B-tested the same way and showed NO
    // benefit — its verify side joins narrow hashed-token arrays, not
    // shingle strings — so it stays unpersisted.)
    graft.engine.Caching.scopedPersist(verified).orderBy("eval_doc_id", "train_doc_id")
  }

  /** The cross-corpus banded candidate + verification core shared by dd7
    * and dd9: over a combined `(doc_id, sh)` shingle frame whose two sides
    * are separated at [[IdShift]] (low side < shift <= high side), emit
    * the verified cross pairs `(lo_id, hi_id, shingle_jaccard >= 0.7)`.
    * Caps per (band, bucket, SIDE) — a global id-order cap would evict the
    * entire high side from hot mixed buckets (all low ids sort first) and
    * produce zero cross pairs exactly where duplication concentrates.
    */
  private[graft] def crossVerifiedPairs(corpus: DataFrame): DataFrame = {
    val bb = capHotBuckets(bandBuckets(signatures(corpus)), "band", "bucket",
      sideCols = Seq(col("doc_id") >= IdShift))
    val cand = bb.alias("x").join(bb.alias("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < lit(IdShift) && col("y.doc_id") >= lit(IdShift))
      .select(col("x.doc_id").as("lo_id"), col("y.doc_id").as("hi_id"))
      .distinct()
    cand.join(corpus.alias("sa"), col("lo_id") === col("sa.doc_id"))
      .join(corpus.alias("sb"), col("hi_id") === col("sb.doc_id"))
      .select(col("lo_id"), col("hi_id"),
        size(array_intersect(col("sa.sh"), col("sb.sh"))).as("i"),
        (size(col("sa.sh")) + size(col("sb.sh"))).as("su"))
      .select(col("lo_id"), col("hi_id"),
        round(col("i").cast("double") / (col("su") - col("i")), 4).as("shingle_jaccard"))
      .filter(col("shingle_jaccard") >= 0.7)
  }

  /** dd9 — INCREMENTAL ingest dedup: the admission decision a streaming
    * corpus service makes per incoming document against the corpus it has
    * already indexed — `exact` (verbatim fingerprint hit), `near`
    * (shingle-Jaccard >= 0.7 hit), or `unique`, with the matched index
    * document's id. dd1–dd8 answer batch questions (pair listings,
    * clusters, contamination reports); this is the per-NEW-DOC verdict
    * frame an ingestion pipeline consumes, and the output every incoming
    * doc appears in exactly once.
    *
    * Harness split (same conventions as dd6/dd7): the incoming batch is
    * the md5-carved quarter; the index is the id-shifted REMAINDER of the
    * corpus plus a planted verbatim copy of half the batch (second md5 hex
    * digit < '8') — so all three verdicts occur organically: planted
    * copies land `exact`, the corpus's organic near-dups land `near`, the
    * rest `unique`. Match ids are reported in the index's ORIGINAL id
    * space (shift removed), -1 for unique.
    *
    * Scale shape: the exact layer is one fingerprint equi-join (batch-hit
    * sized). The near layer is [[crossVerifiedPairs]] — at production
    * scale the index side's signatures and band buckets are PRECOMPUTED
    * and bucketed on (band, bucket), so an incoming batch only hashes
    * itself and probes matching buckets (the equi-join shape is already
    * exactly that); nothing in the plan touches |batch| × |index|. Both
    * layers aggregate min() per batch doc before the final
    * batch-frame-sized left joins.
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    // NOT persisted — A/B-measured like dd2: caching this base frame for
    // the fingerprint sides and the shingle union showed no warm-run
    // benefit at sf0.1 (~2.4-2.6 s either way; the banded candidate join
    // dominates and re-scanning the small parquet is cheaper than the
    // materialization barrier).
    val docs = t(spark, dir, "documents")
      .select(shiftGuardedId.as("doc_id"), col("text"))
    val batch = docs.filter(isEvalSplit(col("doc_id")))
    val planted = batch
      .filter(substring(md5(col("doc_id").cast("string")), 2, 1) < "8")
    val index = docs.filter(!isEvalSplit(col("doc_id"))).unionAll(planted)
      .select((col("doc_id") + IdShift).as("doc_id"), col("text"))
    val exactHits = batch.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .join(index.select(col("doc_id").as("ix_id"), fingerprint(col("text")).as("fp")),
        "fp")
      .select(col("doc_id"), lit(0).as("kind"), col("ix_id").as("mid"))
    // Shingle the combined corpus once (the dd7-measured union decision);
    // short docs (< 2 tokens) have no shingles and can only match exactly.
    val sh = graft.engine.Caching.scopedPersist(
      shingledOf(batch.unionAll(index)))
    val nearHits = crossVerifiedPairs(sh)
      .select(col("lo_id").as("doc_id"), lit(1).as("kind"), col("hi_id").as("mid"))
    // ONE verdict aggregate over the union of both hit layers (r20,
    // replacing a per-layer groupBy + two left joins): min(struct(kind,
    // mid)) orders lexicographically — any exact hit (kind 0) beats every
    // near hit, and within a layer the minimum index id wins — exactly
    // the old coalesce(exact_id, near_id) precedence, one exchange and
    // one broadcast join cheaper.
    val best = exactHits.unionAll(nearHits)
      .groupBy("doc_id")
      .agg(min(struct(col("kind"), col("mid"))).as("b"))
    batch.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("b.kind") === 0, lit("exact"))
          .when(col("b.kind") === 1, lit("near"))
          .otherwise(lit("unique")).as("verdict"),
        (coalesce(col("b.mid"), lit(IdShift - 1)) - IdShift)
          .as("match_doc_id"))
      .orderBy("doc_id")
  }

  private[graft] val SpanTokens = 8
  private[graft] val SpanHits = 3

  /** dd8 — SPAN-level contamination: training documents that contain a
    * verbatim quote of an eval document without being near-dups of it —
    * the leakage mode both dd6 (whole-doc fingerprint) and dd7 (whole-doc
    * Jaccard >= 0.7) miss, and the unit real decontamination passes
    * operate at (the "50-token overlap" rule of the dedup-training-data
    * literature). A document pair is flagged when it shares at least
    * [[SpanHits]] distinct [[SpanTokens]]-consecutive-token windows; a
    * shared run of L >= 8 tokens yields L-7 shared windows, so the
    * threshold corresponds to one >= 10-token verbatim quote (or several
    * 8-token ones).
    *
    * Split conventions follow dd6/dd7: eval = the md5-carved quarter,
    * train = the id-shifted full copy (every eval doc is guaranteed its
    * verbatim full-overlap hit; organic shared spans supply the partial
    * quotes).
    *
    * Scale shape: tokenize once, one explode to DISTINCT window hashes
    * (corpus-token-sized, the same cardinality t6's vocabulary explode
    * handles), one equi-join on the window hash restricted to cross-side
    * pairs, one count aggregate — never |train| x |eval|. Boilerplate
    * windows shared by thousands of documents are capped per (window,
    * SIDE) with the one [[capHotBuckets]] rule (constant band), so a hot
    * window contributes at most Cap² pairs; the reported
    * `n_shared_windows` counts cap-surviving windows, identically on both
    * engines.
    *
    * The eval/train sides come out of ONE window pass: each window row
    * explodes into its shifted train id plus, for eval-split docs, the
    * unshifted eval id — a filter+union of the window frame would instead
    * run the scan+tokenize+md5 subtree once per branch (measured at
    * sf0.1 warm min-of-3: 2.5 s two-subtree vs 2.0 s one-pass, and half
    * the corpus scans — the version that matters at 100 TB).
    *
    * Bench budget: 1.5–1.9 s at sf0.1 local[32] (r13 box, single-query
    * min-of-3; r14 in-suite 2.8 s at suite box factor — within the
    * module header's box convention). BENCH_r12's 4.49 s was re-measured in isolation at
    * 1.74 s with zero code change — full-suite contention, the t1/r11
    * precedent; the 230-query suite runs dd8 amid the heavy t-family
    * tail. Regression above ~3 s in a SINGLE-query run is real.
    */
  def spanContamination(spark: SparkSession, dir: String): DataFrame = {
    val k = SpanTokens
    val toks = tWide(spark, dir, "documents")
      .select(shiftGuardedId.as("doc_id"), tokensOrdered(col("text")).as("tk"))
      .filter(size(col("tk")) >= k)
    // One md5 per window; array_distinct BEFORE the explode so repeated
    // boilerplate inside one document counts once.
    val wins = toks.select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(1), size(col("tk")) - (k - 1)),
        i => md5(concat_ws(" ", slice(col("tk"), i, lit(k))))))).as("wh"))
    val corpus = wins.select(explode(
        when(isEvalSplit(col("doc_id")),
          array(col("doc_id"), col("doc_id") + IdShift))
          .otherwise(array(col("doc_id") + IdShift))).as("doc_id"),
      col("wh"))
    val capped = capHotBuckets(corpus.withColumn("b", lit(0)), "b", "wh",
        sideCols = Seq(col("doc_id") >= IdShift))
      .drop("b")
    capped.alias("e").join(capped.alias("tr"),
        col("e.wh") === col("tr.wh") &&
          col("e.doc_id") < lit(IdShift) && col("tr.doc_id") >= lit(IdShift))
      .groupBy(col("e.doc_id").as("eval_doc_id"),
        col("tr.doc_id").as("train_doc_id"))
      .agg(count(lit(1)).as("n_shared_windows"))
      .filter(col("n_shared_windows") >= SpanHits)
      .orderBy("eval_doc_id", "train_doc_id")
  }

  /** dd11 — quality-aware canonical selection: dd5 assigns every document
    * to its near-dup cluster; this picks the member to KEEP — the
    * highest [[graft.functions.TextFunctions.qualityScore]] in the
    * cluster (min doc_id on ties) — instead of dd5's min-id convention.
    * This is how production dedup actually retires duplicates (Lee et
    * al. 2022 keep-one semantics + a quality prior): deleting by
    * arrival order throws away the best-written copy whenever the spam
    * variant crawled first. Emits the full audit row (cluster, score,
    * keep bit) so the drop set is reviewable before deletion.
    *
    * Scale shape: dd5's banded/bucketed cluster machinery unchanged
    * (shingle → minhash band join with HotBucketCap → label
    * propagation), one scan-local quality projection, and a row_number
    * window partitioned by cluster id — clusters hash-partition evenly
    * (they are near-dup groups, size-bounded in practice by the band
    * cap), so no skew pathologies at 100 TB.
    *
    * Bench budget: 4.3 s at sf0.1 local[32] (r13 box, min-of-3, in
    * suite — the module header's box convention applies) — dd5's
    * cluster build (the dd3 band-route-and-verify machinery) plus one
    * quality pass; tracks dd5's own cost, not a regression signal of
    * its own unless the gap to dd5 grows.
    *
    * r19 A/B verdict on the r18 normalized-only flag (official
    * 1.96→2.67 s, raw 1.36x / norm 1.58x at a 0.86 box factor): NOISE —
    * no code change touched dd11 or dd5 between the rounds. Same-box
    * isolated min-of-4, two runs: dd11 2.55 s with dd5 1.75 (spin
    * 0.324/0.324, the quiet band) and 3.11 with dd5 2.26 (spin_end
    * 0.434 — busier box, BOTH inflated; the dd11/dd5 ratio held at
    * 1.37–1.45 across runs). The r18 official 2.67 sits inside today's
    * isolated band; the r17 official 1.96 came from the artifact
    * compare_bench retro-flags CONTENTION-SUSPECT (load1_start 8.49),
    * whose per-query numbers are not adjudication anchors. Band
    * re-pinned: 2.5–3.1 s isolated, tracking dd5 at ~1.4x.
    *
    * r16 A/B verdict on the r15 artifact's 1.77x suite-vs-isolated gap
    * (6.07 s in-suite vs 3.42 isolated): NOT this query's plan and NOT
    * cache debris from the dd family — it was the bench harness's
    * inter-query reclaim. releaseAll's System.gc() kicks
    * ContextCleaner into an asynchronous drain (block/broadcast
    * removal RPCs + a GC tail) that lands inside the next query's
    * samples, and dd11 pays the most because its in-suite predecessor
    * dd10 generates the family's biggest garbage (DP-kernel self-join).
    * Measured, probes stable: dd11-after-dd10 6.19 s with the bare
    * reclaim; 4.48 with +10 s pause; 3.76 with reclaim skipped; 3.52
    * with gc=false; 3.39 with the shipped fix (gc kept + 1 s
    * post-reclaim settle after >=1 s queries, outside the timed
    * window) vs 3.95 isolated under the old harness — in-suite now at
    * or below isolated. See Bench.scala's settle comment.
    */
  def qualityCanonical(spark: SparkSession, dir: String): DataFrame =
    qualityCanonicalCore(
      t(spark, dir, "documents").select(col("doc_id"), col("text")))

  /** dd11 over an explicit `(doc_id, text)` corpus — DedupSpec plants a
    * near-dup pair where the LATER doc is higher quality (it must win)
    * and a singleton (kept trivially).
    */
  private[graft] def qualityCanonicalCore(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("canonical_doc_id"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    clustersOf(docs)
      .join(docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("quality")),
        "doc_id")
      .withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("canonical_doc_id"), col("quality"),
        (col("rk") === 1).as("keep"))
      .orderBy("doc_id")
  }

  /** dd12 — order-invariant "bag" fingerprint dedup: fingerprint each
    * document by the md5 of its SORTED token list, so copies that merely
    * shuffle sentence/word order (scraped listicles, template
    * re-renderings, column-reordered tables serialized to text) collapse
    * into one group — the gap between dd1's normalized-whitespace exact
    * match and dd2's shingle Jaccard (token-order permutations destroy
    * most shingles, so heavy reorders can slip BELOW the Jaccard
    * threshold while being trivially the same bag of words). Each doc
    * reports its bag-canonical (min id), group size, and whether it is
    * an exact dup (same dd1 fingerprint as the canonical) or a
    * reorder-only dup (same bag, different exact fingerprint).
    *
    * Scale shape: a per-row projection (sort ≤ doc-length tokens in
    * place, one md5) plus ONE window over bag groups — the same
    * hash-partition-by-fingerprint shape as dd1; no candidate
    * generation, no joins.
    */
  def bagFingerprint(spark: SparkSession, dir: String): DataFrame =
    bagFingerprintCore(
      t(spark, dir, "documents").select(col("doc_id"), col("text")))

  /** dd12 over an explicit `(doc_id, text)` frame — DedupSpec plants a
    * word-shuffled copy (reorder-only), a whitespace variant (exact),
    * and a singleton.
    */
  private[graft] def bagFingerprintCore(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.{fingerprint, tokensOrdered}
    val f = docs.select(col("doc_id"),
      fingerprint(col("text")).as("fp"),
      md5(concat_ws(" ", array_sort(tokensOrdered(col("text"))))).as("bag_fp"))
    val w = Window.partitionBy(col("bag_fp"))
    val wOrd = w.orderBy(col("doc_id"))
    f.select(col("doc_id"),
        min(col("doc_id")).over(w).as("bag_canonical_id"),
        count(lit(1)).over(w).as("n_members"),
        col("fp"), first(col("fp")).over(wOrd).as("canon_fp"))
      .select(col("doc_id"), col("bag_canonical_id"), col("n_members"),
        (col("n_members") > 1 && col("doc_id") =!= col("bag_canonical_id") &&
          col("fp") === col("canon_fp")).as("is_exact_dup"),
        (col("n_members") > 1 && col("doc_id") =!= col("bag_canonical_id") &&
          col("fp") =!= col("canon_fp")).as("is_reorder_dup"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd12_bag_fingerprint" -> bagFingerprint,
    "dd11_quality_canonical" -> qualityCanonical,
    "dd1_exact_dedup" -> exactDedup,
    "dd2_jaccard_pairs" -> jaccardPairs,
    "dd3_minhash_lsh" -> minhashLsh,
    "dd4_simhash" -> simhash,
    "dd5_dedup_clusters" -> dedupClusters,
    "dd6_contamination" -> contamination,
    "dd7_near_contamination" -> nearContamination,
    "dd8_span_contamination" -> spanContamination,
    "dd9_incremental" -> incrementalDedup,
    "dd10_edit_distance" -> editDistancePairs
  )

  // Single-line on purpose: this fragment is interpolated into a larger
  // string whose .stripMargin would otherwise eat the first '|' of any
  // line-leading '||' concat operator.
  /** The unigram MinHash band candidate pipeline (tokens → 8-window
    * signature → 4 banded buckets → hot-cap → colliding id-ordered pairs)
    * as a reusable CTE chain — the oracle twin of
    * [[unigramBandCandidates]], shared by dd2 and dd10 so the two
    * verifiers run over provably identical candidates. Exposes CTEs
    * `toks(doc_id, tks)` and `cand(doc_a, doc_b)`.
    */
  private lazy val unigramCandCtes: String =
    s"""toks AS (
       |  SELECT doc_id, list_distinct($sqlToks) AS tks FROM documents),
       | ex AS (SELECT doc_id, md5(unnest(tks)) AS h FROM toks),
       | sig AS (SELECT doc_id,
       |   min(substr(h, 1, 4)) s0, min(substr(h, 5, 4)) s1,
       |   min(substr(h, 9, 4)) s2, min(substr(h, 13, 4)) s3,
       |   min(substr(h, 17, 4)) s4, min(substr(h, 21, 4)) s5,
       |   min(substr(h, 25, 4)) s6, min(substr(h, 29, 4)) s7
       |  FROM ex GROUP BY doc_id),
       | bands AS (
       |  SELECT doc_id, 0 AS band, md5(s0||'|'||s1) AS bucket FROM sig UNION ALL
       |  SELECT doc_id, 1, md5(s2||'|'||s3) FROM sig UNION ALL
       |  SELECT doc_id, 2, md5(s4||'|'||s5) FROM sig UNION ALL
       |  SELECT doc_id, 3, md5(s6||'|'||s7) FROM sig),
       | ${sqlCapCte("capped", "bands", Seq("doc_id", "band", "bucket"), "band", "bucket", "doc_id")},
       | cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM capped x JOIN capped y
       |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id)""".stripMargin

  private val sqlToks =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')"

  /** dd4 oracle, generated from the same 60-bit/15-bit-band loop as the
    * Spark plan so the two can never drift.
    */
  private val dd4Oracle: String = {
    val votes = (0 until 60)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i")
      .mkString(", ")
    val fpExpr = (0 until 60)
      .map(i => s"CASE WHEN v$i > 0 THEN (1::BIGINT << $i) ELSE 0::BIGINT END")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct($sqlToks)) AS tk FROM documents),
       | hx AS (
       |  SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS h FROM tok),
       | v AS (SELECT doc_id, $votes FROM hx GROUP BY doc_id),
       | fps AS (SELECT doc_id, $fpExpr AS fp FROM v),
       | bands AS (
       |  SELECT doc_id, fp, b, (fp >> (b * 15)) & 32767 AS chunk
       |  FROM fps CROSS JOIN (VALUES (0), (1), (2), (3)) AS bs(b)),
       | ${sqlCapCte("capped", "bands", Seq("doc_id", "fp", "b", "chunk"), "b", "chunk", "doc_id")},
       | cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS bd, x.fp AS xf, y.fp AS yf
       |  FROM capped x JOIN capped y
       |    ON x.b = y.b AND x.chunk = y.chunk AND x.doc_id < y.doc_id)
       |SELECT CAST(bit_count(xor(xf, yf)) AS BIGINT) AS hamming,
       |  count(*) AS n_pairs
       |FROM cand
       |WHERE bit_count(xor(xf, yf)) <= 8
       |GROUP BY 1
       |ORDER BY hamming""".stripMargin
  }
  private val sqlShingles =
    s"list_distinct(list_transform(range(1, len($sqlToks)), i -> list_element($sqlToks, i) || ' ' || list_element($sqlToks, i + 1)))"

  /** dd3's shingle→signature→band→candidate pipeline as a reusable CTE
    * chain, parameterized over the source relation (must expose
    * `doc_id, text`) and the candidate-pair predicate — shared by the
    * dd3, dd5 AND dd7 oracles so the pipeline cannot drift between them.
    * dd7 swaps the predicate from "lower id first" to "cross-corpus only".
    * No inner line is margin-prefixed, so interpolating the stripped
    * fragment into a larger SQL string is safe.
    */
  private[graft] def dd3CtesFrom(
      src: String, candPred: String, capSideCols: Seq[String] = Nil): String =
    s"""sh AS (
       |  SELECT doc_id, $sqlShingles AS shingles FROM $src),
       | ex AS (SELECT doc_id, md5(unnest(shingles)) AS h FROM sh),
       | sig AS (SELECT doc_id,
       |   min(substr(h, 1, 4)) s0, min(substr(h, 5, 4)) s1,
       |   min(substr(h, 9, 4)) s2, min(substr(h, 13, 4)) s3,
       |   min(substr(h, 17, 4)) s4, min(substr(h, 21, 4)) s5,
       |   min(substr(h, 25, 4)) s6, min(substr(h, 29, 4)) s7
       |  FROM ex GROUP BY doc_id),
       | bands AS (
       |  SELECT doc_id, 0 AS band, md5(s0||'|'||s1) AS bucket FROM sig UNION ALL
       |  SELECT doc_id, 1, md5(s2||'|'||s3) FROM sig UNION ALL
       |  SELECT doc_id, 2, md5(s4||'|'||s5) FROM sig UNION ALL
       |  SELECT doc_id, 3, md5(s6||'|'||s7) FROM sig),
       | ${sqlCapCte("cappedb", "bands", Seq("doc_id", "band", "bucket"), "band", "bucket", "doc_id", capSideCols)},
       | cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM cappedb x JOIN cappedb y
       |    ON x.band = y.band AND x.bucket = y.bucket AND $candPred)""".stripMargin

  private val dd3Ctes: String = dd3CtesFrom("documents", "x.doc_id < y.doc_id")

  /** dd3's verified-pair SELECT (no ORDER BY — dd5 wraps it as a CTE). */
  private[graft] val dd3PairSelect: String =
    """SELECT doc_a, doc_b,
      |  round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
      |    (len(sa.shingles) + len(sb.shingles)
      |     - len(list_intersect(sa.shingles, sb.shingles))), 4) AS shingle_jaccard
      |FROM cand
      |JOIN sh sa ON doc_a = sa.doc_id
      |JOIN sh sb ON doc_b = sb.doc_id
      |WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
      |    (len(sa.shingles) + len(sb.shingles)
      |     - len(list_intersect(sa.shingles, sb.shingles))), 4) >= 0.7""".stripMargin

  val oracle: Map[String, String] = Map(
    "dd12_bag_fingerprint" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    ${TextAnalysis.sqlFp("text")} AS fp,
         |    md5(array_to_string(list_sort(${TextAnalysis.sqlTokens}), ' '))
         |      AS bag_fp
         |  FROM documents),
         | wdw AS (
         |  SELECT doc_id,
         |    min(doc_id) OVER (PARTITION BY bag_fp) AS bag_canonical_id,
         |    count(*) OVER (PARTITION BY bag_fp) AS n_members,
         |    fp,
         |    first_value(fp) OVER (PARTITION BY bag_fp ORDER BY doc_id)
         |      AS canon_fp
         |  FROM f)
         |SELECT doc_id, bag_canonical_id, n_members,
         |  n_members > 1 AND doc_id <> bag_canonical_id
         |    AND fp = canon_fp AS is_exact_dup,
         |  n_members > 1 AND doc_id <> bag_canonical_id
         |    AND fp <> canon_fp AS is_reorder_dup
         |FROM wdw
         |ORDER BY doc_id""".stripMargin,
    // dd11: dd5's recursive component chain verbatim, then the quality
    // argmax (t4's shared score template) per component.
    "dd11_quality_canonical" ->
      (s"WITH RECURSIVE $dd3Ctes,\n" +
        s" pairs AS ($dd3PairSelect),\n" +
        s""" edges AS (
          |  SELECT doc_a AS src, doc_b AS dst FROM pairs
          |  UNION ALL SELECT doc_b, doc_a FROM pairs),
          | reach(src, dst) AS (
          |  SELECT src, dst FROM edges
          |  UNION
          |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
          | canon AS (
          |  SELECT d.doc_id,
          |    CAST(least(coalesce(min(r.dst), d.doc_id), d.doc_id)
          |      AS BIGINT) AS canonical_doc_id
          |  FROM documents d LEFT JOIN reach r ON d.doc_id = r.src
          |  GROUP BY d.doc_id),
          | q AS (
          |  SELECT doc_id, ${TextAnalysis.sqlQuality("text")} AS quality
          |  FROM documents),
          | rk AS (
          |  SELECT c.doc_id, c.canonical_doc_id, q.quality,
          |    row_number() OVER (PARTITION BY canonical_doc_id
          |      ORDER BY quality DESC, c.doc_id) AS rk
          |  FROM canon c JOIN q USING (doc_id))
          |SELECT doc_id, canonical_doc_id, quality, rk = 1 AS keep
          |FROM rk
          |ORDER BY doc_id""".stripMargin),
    // dd8: identical window construction (1-based k-token slices joined
    // with ' ', md5'd, per-doc distinct) and the shared cap template with
    // a constant band column.
    "dd8_span_contamination" ->
      (s"""WITH tk AS (
          |  SELECT doc_id, $sqlToks AS t FROM documents),
          | wins AS (
          |  SELECT doc_id, unnest(list_distinct(list_transform(
          |    range(1, len(t) - ${SpanTokens - 2}),
          |    i -> md5(array_to_string(list_slice(t, i, i + ${SpanTokens - 1}), ' '))))) AS wh
          |  FROM tk WHERE len(t) >= $SpanTokens),
          | corpus AS (
          |  SELECT doc_id, wh FROM wins WHERE ${sqlIsEvalSplit("doc_id")}
          |  UNION ALL
          |  SELECT doc_id + 1000000 AS doc_id, wh FROM wins),
          | withb AS (SELECT doc_id, wh, 0 AS b FROM corpus),
          | ${sqlCapCte("capped", "withb", Seq("doc_id", "wh"), "b", "wh", "doc_id",
               sideCols = Seq("doc_id >= 1000000"))}
          |SELECT e.doc_id AS eval_doc_id, tr.doc_id AS train_doc_id,
          |  count(*) AS n_shared_windows
          |FROM capped e JOIN capped tr
          |  ON e.wh = tr.wh AND e.doc_id < 1000000 AND tr.doc_id >= 1000000
          |GROUP BY 1, 2
          |HAVING count(*) >= $SpanHits
          |ORDER BY eval_doc_id, train_doc_id""".stripMargin),
    // Concatenated, not s-interpolated: the fingerprint regex '\s+' must
    // not pass through escape processing.
    "dd6_contamination" ->
      ("""WITH fps AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        | ev AS (
        |  SELECT doc_id AS eval_doc_id, fp FROM fps
        |  WHERE """.stripMargin + sqlIsEvalSplit("doc_id") + """),
        | tr AS (SELECT doc_id + 1000000 AS train_doc_id, fp FROM fps)
        |SELECT eval_doc_id, train_doc_id
        |FROM tr JOIN ev USING (fp)
        |ORDER BY eval_doc_id, train_doc_id""".stripMargin),
    "dd4_simhash" -> dd4Oracle,
    "dd1_exact_dedup" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS canonical_doc_id, count(*) AS n_copies
        |FROM (SELECT doc_id, text FROM documents
        |      UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |GROUP BY 1
        |ORDER BY canonical_doc_id""".stripMargin,
    "dd2_jaccard_pairs" ->
      s"""WITH $unigramCandCtes,
        | p AS (
        |  SELECT doc_id, list_distinct(list_transform(tks,
        |      x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS ts
        |  FROM toks)
        |SELECT doc_a, doc_b,
        |  round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |    (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))), 4) AS jaccard
        |FROM cand JOIN p a ON doc_a = a.doc_id JOIN p b ON doc_b = b.doc_id
        |WHERE round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |    (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))), 4) >= 0.6
        |ORDER BY doc_a, doc_b""".stripMargin,
    // dd10: the SHARED candidate CTEs with the verifier swapped to
    // normalized Levenshtein; no length guard here — it is a Spark-side
    // cost prefilter that provably drops no kept pair.
    "dd10_edit_distance" ->
      s"""WITH $unigramCandCtes
        |SELECT doc_a, doc_b,
        |  round(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE) /
        |    greatest(length(a.text), length(b.text)), 4) AS edit_sim
        |FROM cand JOIN documents a ON doc_a = a.doc_id
        |  JOIN documents b ON doc_b = b.doc_id
        |WHERE round(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE) /
        |    greatest(length(a.text), length(b.text)), 4) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dd3_minhash_lsh" ->
      (s"WITH $dd3Ctes\n" +
        s"$dd3PairSelect\nORDER BY doc_a, doc_b"),
    // dd7: the dd3 pipeline over the combined train/eval corpus with the
    // candidate predicate restricted to cross-corpus pairs.
    "dd7_near_contamination" ->
      (s"""WITH corpus AS (
          |  SELECT doc_id, text FROM documents
          |  WHERE ${sqlIsEvalSplit("doc_id")}
          |  UNION ALL
          |  SELECT doc_id + 1000000 AS doc_id, text FROM documents),
          | """.stripMargin +
        dd3CtesFrom("corpus", "x.doc_id < 1000000 AND y.doc_id >= 1000000",
          capSideCols = Seq("doc_id >= 1000000")) +
        s",\n pairs AS ($dd3PairSelect)\n" +
        """SELECT doc_a AS eval_doc_id, doc_b AS train_doc_id, shingle_jaccard
          |FROM pairs
          |ORDER BY eval_doc_id, train_doc_id""".stripMargin),
    // dd9: the dd3 CTE chain over the batch∪index corpus (batch = the
    // md5-carved quarter; index = the shifted remainder + planted verbatim
    // copies of half the batch), aggregated to one verdict row per batch
    // doc. The exact layer shares dd6's fingerprint expression.
    "dd9_incremental" ->
      (s"""WITH corpus AS (
          |  SELECT doc_id, text FROM documents
          |  WHERE ${sqlIsEvalSplit("doc_id")}
          |  UNION ALL
          |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
          |  WHERE NOT ${sqlIsEvalSplit("doc_id")}
          |     OR substr(md5(doc_id::VARCHAR), 2, 1) < '8'),
          | """.stripMargin +
        dd3CtesFrom("corpus", "x.doc_id < 1000000 AND y.doc_id >= 1000000",
          capSideCols = Seq("doc_id >= 1000000")) +
        s",\n pairs AS ($dd3PairSelect),\n" +
        """ near AS (
          |  SELECT doc_a AS doc_id, min(doc_b) AS near_id FROM pairs GROUP BY 1),
          | fps AS (
          |  SELECT doc_id,
          |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          |  FROM corpus),
          | exhit AS (
          |  SELECT b.doc_id, min(ix.doc_id) AS exact_id
          |  FROM fps b JOIN fps ix ON b.fp = ix.fp
          |  WHERE b.doc_id < 1000000 AND ix.doc_id >= 1000000
          |  GROUP BY 1)
          |SELECT b.doc_id,
          |  CASE WHEN e.exact_id IS NOT NULL THEN 'exact'
          |       WHEN n.near_id IS NOT NULL THEN 'near'
          |       ELSE 'unique' END AS verdict,
          |  coalesce(e.exact_id, n.near_id, 999999) - 1000000 AS match_doc_id
          |FROM (SELECT doc_id FROM corpus WHERE doc_id < 1000000) b
          |LEFT JOIN exhit e ON b.doc_id = e.doc_id
          |LEFT JOIN near n ON b.doc_id = n.doc_id
          |ORDER BY b.doc_id""".stripMargin),
    // Canonical assignment: min doc_id over each connected component of the
    // dd3 edge set, computed as a recursive transitive closure (tractable
    // at oracle scale; the Spark side uses log-round label propagation).
    "dd5_dedup_clusters" ->
      (s"WITH RECURSIVE $dd3Ctes,\n" +
        s" pairs AS ($dd3PairSelect),\n" +
        """ edges AS (
          |  SELECT doc_a AS src, doc_b AS dst FROM pairs
          |  UNION ALL SELECT doc_b, doc_a FROM pairs),
          | reach(src, dst) AS (
          |  SELECT src, dst FROM edges
          |  UNION
          |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
          |SELECT d.doc_id,
          |  CAST(least(coalesce(min(r.dst), d.doc_id), d.doc_id) AS BIGINT) AS canonical_doc_id
          |FROM documents d LEFT JOIN reach r ON d.doc_id = r.src
          |GROUP BY d.doc_id
          |ORDER BY doc_id""".stripMargin)
  )
}

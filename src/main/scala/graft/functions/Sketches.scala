package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch surface for the 100 TB ingest/profiling paths
  * (SURVEY §2.5 aggregations; complements [[graft.operators.Relational
  * .profileApprox]]'s HLL): Bloom-filter membership prefilters and
  * count-min frequency sketches. Both sketches merge associatively, so
  * Spark computes them as ordinary map-side-combined aggregates — one
  * pass, no shuffle of the data itself, sketch-sized driver traffic.
  *
  * The Bloom expressions are Spark's own runtime-filtering machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the codegen'd
  * expressions behind AQE's injected bloom joins) surfaced through the
  * classic-mode [[Bridge]] — native Catalyst, not UDFs, so the probe
  * side stays inside whole-stage codegen.
  *
  * Accuracy contracts (SketchSpec-pinned, no DuckDB oracle — sketch
  * internals are engine-specific): Bloom has NO false negatives and a
  * sized false-positive rate; count-min never underestimates and
  * overestimates by at most eps * N with the configured confidence.
  */
object Sketches {

  /** Aggregate column: a serialized Bloom filter over `xxhash64(c)`,
    * sized for `expectedItems` at `fpp`. One row out (BinaryType).
    *
    * LOUD on oversize: `BloomFilterAggregate` silently clamps both
    * parameters to `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`
    * / `.maxNumBits` (defaults 4M items / 2^26 bits) — a billion-key
    * index would quietly build a saturated filter whose realized FPR
    * approaches 1 while the caller believes the sized contract. The
    * session confs are the capacity contract, so refusing here (with the
    * conf to raise) beats a prefilter that silently stops filtering.
    */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double = 0.03): Column = {
    // standard Bloom sizing: m = -n ln(p) / (ln 2)^2
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val maxItems = conf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS)
    val maxBits = conf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloomAgg sized $expectedItems items / $numBits bits, above the " +
        s"session caps ($maxItems items / $maxBits bits) — Spark would " +
        "silently clamp and saturate the filter; raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/.maxNumBits " +
        "to the intended capacity first")
    Bridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Membership probe against a built filter: true if `c` MIGHT be in the
    * set (never false for a true member). Codegen'd, broadcast-by-value
    * (the serialized filter travels as a literal with the plan).
    */
  def bloomMightContain(bloomBytes: Array[Byte], c: Column): Column =
    Bridge.column(BloomFilterMightContain(Literal(bloomBytes),
      new XxHash64(Seq(Bridge.expression(c)))))

  /** The ingest-dedup prefilter (dd9's exact layer at scale): build a
    * Bloom filter over the INDEX side's keys (one aggregate job,
    * sketch-sized result), then keep only incoming rows whose key might
    * be indexed. No false negatives — every true duplicate still reaches
    * the authoritative equi-join — while the overwhelmingly-unique crawl
    * traffic short-circuits at a codegen'd filter instead of shuffling
    * into the join. At 1000-executor scale this is the difference between
    * shuffling the whole incoming batch and shuffling ~duplicates.
    */
  def bloomPrefilter(incoming: DataFrame, indexKeys: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bytes = indexKeys
      .select(bloomAgg(col(key), expectedItems, fpp).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    incoming.filter(bloomMightContain(bytes, col(key)))
  }

  /** One-pass count-min sketch of a column (Spark's builtin
    * `count_min_sketch` aggregate), deserialized driver-side — the
    * mergeable frequency structure behind heavy-hitter estimation over a
    * token stream too large to count exactly per key.
    */
  def countMinSketchOf(df: DataFrame, c: String, eps: Double,
      confidence: Double, seed: Int): CountMinSketch = {
    val bytes = df
      .select(call_function("count_min_sketch",
        col(c), lit(eps), lit(confidence), lit(seed)).as("s"))
      .head().getAs[Array[Byte]]("s")
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }
}

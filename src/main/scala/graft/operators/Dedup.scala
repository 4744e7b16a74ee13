package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.TextFunctions.{fingerprint, tokenSet}

/** Deduplication operator family over `documents` (north-star extension,
  * SURVEY.md §2.5): exact, blocked n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB): no operator ever builds an unblocked cross join.
  *   - exact: one hash aggregate on the content fingerprint;
  *   - jaccard: candidate pairs only within (lang, length-bucket) blocks —
  *     an equi-join Catalyst executes as a shuffle hash join on the block
  *     key, never a cartesian;
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

  /** documents -> (doc_id, sh): tokenization and shingling as two stacked
    * projections so each runs once per row. Documents with fewer than two
    * tokens shingle to nothing and can never be candidates, so they are
    * filtered out entirely — the oracle's empty `range(1, len)` produces
    * the same absence.
    */
  private[graft] def shingled(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), tokensOrdered(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), shinglesOf(col("t")).as("sh"))

  /** Exact dedup by content fingerprint: canonical = min doc_id per group.
    * Input is documents unioned with an id-shifted copy of itself so real
    * duplicate groups exist to collapse (the driver corpus is dup-free).
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val copies = docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    docs.unionAll(copies)
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(min("doc_id").as("canonical_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("canonical_doc_id")
  }

  /** Blocked n-gram (word-set) Jaccard near-dup pairs: candidates share
    * (lang, n_chars DIV 50); emit pairs with Jaccard >= 0.6.
    */
  def jaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    // Token sets are hashed to 60-bit ints (15 hex chars of md5) BEFORE
    // the pairwise stage: array_intersect on primitive longs beats string
    // sets by a wide margin at 2M+ candidate pairs. Portable bit-for-bit —
    // the oracle applies the identical hash, so even a collision (which
    // would merge two tokens) produces the same count on both engines.
    val hashedSet = array_distinct(transform(tokenSet(col("text")),
      x => conv(md5(x).substr(1, 15), 16, 10).cast("long")))
    val p = t(spark, dir, "documents").select(
      col("doc_id"), col("lang"),
      floor(col("n_chars") / lit(50.0)).cast("long").as("lb"),
      hashedSet.as("ts"))
    val a = p.alias("a")
    val b = p.alias("b")
    // Size-ratio prefilter: jaccard <= min/max set sizes, so pairs below
    // the threshold on sizes alone never pay for an intersection. The
    // bound uses the ROUND-ADJUSTED threshold (0.59995): the final filter
    // keeps round(j,4) >= 0.6, i.e. true j >= 0.59995, and since
    // size-ratio >= j the guard can never drop a pair the final filter
    // would keep — the oracle needs no guard.
    val sizeGuard =
      least(size(col("a.ts")), size(col("b.ts"))).cast("double") /
        greatest(size(col("a.ts")), size(col("b.ts"))) >= 0.59995
    a.join(b, col("a.lang") === col("b.lang") && col("a.lb") === col("b.lb") &&
        col("a.doc_id") < col("b.doc_id"))
      .filter(sizeGuard)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.ts"), col("b.ts"))).as("i"),
        (size(col("a.ts")) + size(col("b.ts"))).as("su"))
      .select(col("doc_a"), col("doc_b"),
        round(col("i").cast("double") / (col("su") - col("i")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .orderBy("doc_a", "doc_b")
  }

  private val NumHashes = 8
  private val BandSize = 2 // 4 bands x 2 rows

  /** Per-doc MinHash signature: ONE md5 per exploded shingle, with the 8
    * "permutations" taken as the md5's disjoint 4-hex-char windows (16 bits
    * each — plenty against ~10^2 shingles/doc). 8x less hashing than
    * md5-per-seed at identical portability: substr windows of the same
    * lowercase hex are independent orderings on both engines.
    */
  private def signatures(spark: SparkSession, dir: String): DataFrame = {
    // MIN is duplicate-insensitive, so the signature path explodes raw
    // (non-distinct) bigrams — skipping array_distinct's per-row set
    // build; the oracle's distinct shingles produce the identical min.
    val base = t(spark, dir, "documents")
      .select(col("doc_id"), tokensOrdered(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val ex = base
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.rawShingles(col("t"))).as("s"))
      .select(col("doc_id"), md5(col("s")).as("h"))
    val aggs = (0 until NumHashes).map(k =>
      min(substring(col("h"), k * 4 + 1, 4)).as(s"s$k"))
    ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
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
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val bb = bandBuckets(signatures(spark, dir))
    val cand = bb.alias("x").join(bb.alias("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sh = shingled(spark, dir)
    cand.join(sh.alias("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.alias("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa.sh"), col("sb.sh"))).as("i"),
        (size(col("sa.sh")) + size(col("sb.sh"))).as("su"))
      .select(col("doc_a"), col("doc_b"),
        round(col("i").cast("double") / (col("su") - col("i")), 4).as("shingle_jaccard"))
      .filter(col("shingle_jaccard") >= 0.7)
      .orderBy("doc_a", "doc_b")
  }

  /** 60-bit SimHash per document plus banded near-dup pair counts. The
    * token hash is the 60-bit md5 prefix (same portable hash as the
    * Jaccard stage), so the ENTIRE pipeline — votes, fingerprint, 15-bit
    * bands, hamming distances — is engine-portable and fully
    * oracle-checked (DuckDB has >>, &, xor, bit_count on BIGINT).
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val ex = t(spark, dir, "documents")
      .select(col("doc_id"), explode(tokenSet(col("text"))).as("tok"))
      .select(col("doc_id"),
        conv(md5(col("tok")).substr(1, 15), 16, 10).cast("long").as("h"))
    val votes = (0 until 60).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$i"))
    val sig = ex.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val fp = (0 until 60).map(i =>
      when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val fps = sig.select(col("doc_id"), fp.as("fp"))
    val bands = (0 until 4).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("fp"), b * 15).bitwiseAND(0x7FFFL).as("chunk")))
    val bb = fps.select(col("doc_id"), col("fp"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("fp"),
        col("bb.band").as("band"), col("bb.chunk").as("chunk"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd1_exact_dedup" -> exactDedup,
    "dd2_jaccard_pairs" -> jaccardPairs,
    "dd3_minhash_lsh" -> minhashLsh,
    "dd4_simhash" -> simhash
  )

  // Single-line on purpose: this fragment is interpolated into a larger
  // string whose .stripMargin would otherwise eat the first '|' of any
  // line-leading '||' concat operator.
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
       | cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS bd, x.fp AS xf, y.fp AS yf
       |  FROM bands x JOIN bands y
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

  val oracle: Map[String, String] = Map(
    "dd4_simhash" -> dd4Oracle,
    "dd1_exact_dedup" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS canonical_doc_id, count(*) AS n_copies
        |FROM (SELECT doc_id, text FROM documents
        |      UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |GROUP BY 1
        |ORDER BY canonical_doc_id""".stripMargin,
    "dd2_jaccard_pairs" ->
      """WITH p AS (
        |  SELECT doc_id, lang, CAST(floor(n_chars / 50.0) AS BIGINT) AS lb,
        |    list_distinct(list_transform(
        |      list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
        |        x -> x <> '')),
        |      x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS ts
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |    (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))), 4) AS jaccard
        |FROM p a JOIN p b
        |  ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        |WHERE round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |    (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))), 4) >= 0.6
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dd3_minhash_lsh" ->
      s"""WITH sh AS (
         |  SELECT doc_id, $sqlShingles AS shingles FROM documents),
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
         | cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b,
         |  round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
         |    (len(sa.shingles) + len(sb.shingles)
         |     - len(list_intersect(sa.shingles, sb.shingles))), 4) AS shingle_jaccard
         |FROM cand
         |JOIN sh sa ON doc_a = sa.doc_id
         |JOIN sh sb ON doc_b = sb.doc_id
         |WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
         |    (len(sa.shingles) + len(sb.shingles)
         |     - len(list_intersect(sa.shingles, sb.shingles))), 4) >= 0.7
         |ORDER BY doc_a, doc_b""".stripMargin
  )
}

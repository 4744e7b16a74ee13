package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Graph analytics over relationship structure the engine already mines:
  * dd5 assigns CLUSTERS over the near-dup graph (connectivity); this
  * module ranks WITHIN that structure (centrality). The reference has no
  * graph surface at all (its closest notion is P-pass column pruning) —
  * north-star scope for corpus curation: a document's centrality in the
  * near-dup graph measures how template-like it is, and the canonical-pick
  * policy "keep the most/least central member of each dup cluster" needs
  * exactly this score.
  */
object Graph {

  private val Damping = 0.85
  private val Iterations = 3

  /** pr1 — PageRank over the undirected near-dup graph (nodes = all
    * documents; edges = dd3's verified shingle-Jaccard >= 0.7 pairs, both
    * directions). A FIXED, unrolled 3 power iterations of the classic
    * simplified recurrence `r' = (1-d)/n + d * sum(r(u)/deg(u))` (the
    * Spark-canonical form without dangling-mass redistribution: isolated
    * docs decay to (1-d)/n ~ the corpus floor, which is exactly the
    * "not template-like" verdict curation wants). Ranks are emitted
    * n-scaled (mean ~1) so 6-decimal rounding keeps real precision at any
    * corpus size.
    *
    * Scale shape: the edge list is built ONCE (band-routed, hot-capped —
    * dd3's machinery) and persisted with its out-degrees attached; each
    * iteration is one rank-vs-edges equi-join plus one dst-keyed hash
    * aggregate (map-side combine) — the standard edge-partitioned
    * PageRank round, no driver loop, no lineage blowup at 3 unrolled
    * steps. The per-node (1-d)/n term rides a broadcast 1-row count. At
    * 100 TB both joins hash-partition on doc id; pre-bucketing the edge
    * list by src makes the rank join shuffle-free across iterations.
    *
    * Determinism: the only order-sensitive op is the per-dst contribution
    * sum (~1e-17 association error against a 1e-6 rounding grid); the
    * edge set itself is exact (4-decimal-rounded Jaccard threshold on
    * both engines).
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame =
    pagerankCore(t(spark, dir, "documents").select(col("doc_id"), col("text")))

  /** pr1 over an explicit `(doc_id, text)` corpus — GraphSpec drives the
    * centrality axioms (hub dominance, symmetry, isolated-node floor) on
    * planted corpora.
    */
  private[graft] def pagerankCore(docs: DataFrame): DataFrame = {
    // The pair set MUST persist before fan-out: the undirected union reads
    // it twice and the degree aggregate a third time, so an unpersisted
    // pair plan runs the whole band-route-and-verify pipeline 4x inside
    // the one materialization below. A/B at sf0.1/local[32] (contended
    // box, single-query runs): ~25% CPU drop (2m59s -> 2m11s) and the
    // redundant pipeline stages disappear from the UI; bench-line delta
    // 7.6 -> 5.9 s against a noisier background.
    val pairs = graft.engine.Caching.scopedPersist(
      Dedup.verifiedPairsOf(
          graft.engine.Caching.scopedPersist(Dedup.shingledOf(docs)))
        .select(col("doc_a"), col("doc_b")))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // one materialization serves all three iterations' joins
    val out = graft.engine.Caching.scopedPersist(edges.join(deg, "src"))
    val nodes = docs.select(col("doc_id"))
    val nF = nodes.agg(count(lit(1)).as("n"))

    var ranks = nodes.crossJoin(broadcast(nF))
      .select(col("doc_id"), (lit(1.0) / col("n")).as("r"))
    for (_ <- 1 to Iterations) {
      val contribs = ranks
        .join(out, col("doc_id") === col("src"))
        .select(col("dst"), (col("r") / col("deg")).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("contrib"))
      ranks = nodes.crossJoin(broadcast(nF))
        .join(contribs, col("doc_id") === col("dst"), "left")
        .select(col("doc_id"),
          // 0.15 as a LITERAL, not 1 - 0.85: the subtraction lands one
          // ulp off the 0.15 the oracle parses, a real hash divergence
          (lit(0.15) / col("n") +
            lit(Damping) * coalesce(col("contrib"), lit(0.0))).as("r"))
    }
    ranks.crossJoin(broadcast(nF))
      .select(col("doc_id"), round(col("r") * col("n"), 6).as("pagerank_scaled"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pr1_pagerank" -> pagerank
  )

  val oracle: Map[String, String] = {
    val iter = (k: Int) =>
      s""" c$k AS (
         |  SELECT dst, sum(r / deg) AS contrib
         |  FROM r${k - 1} JOIN edges ON doc_id = src JOIN deg USING (src)
         |  GROUP BY dst),
         | r$k AS (
         |  SELECT d.doc_id,
         |    0.15 / (SELECT n FROM np) + 0.85 * coalesce(contrib, 0.0) AS r
         |  FROM documents d LEFT JOIN c$k ON d.doc_id = dst),""".stripMargin
    Map(
      "pr1_pagerank" ->
        (s"""WITH ${Dedup.dd3CtesFrom("documents", "x.doc_id < y.doc_id")},
           | pairs AS (${Dedup.dd3PairSelect}),
           | edges AS (
           |  SELECT doc_a AS src, doc_b AS dst FROM pairs
           |  UNION ALL
           |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
           | deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
           | np AS (SELECT count(*) AS n FROM documents),
           | r0 AS (
           |  SELECT doc_id, 1.0 / (SELECT n FROM np) AS r FROM documents),
           |""".stripMargin +
          (1 to Iterations).map(iter).mkString("\n") +
          s"""
             | fin AS (SELECT doc_id, r FROM r$Iterations)
             |SELECT doc_id,
             |  round(r * (SELECT n FROM np), 6) AS pagerank_scaled
             |FROM fin
             |ORDER BY doc_id""".stripMargin)
    )
  }
}

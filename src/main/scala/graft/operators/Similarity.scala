package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Similarity search over the `embeddings` table (`Array[Float]` vectors,
  * north-star extension, SURVEY.md §2.5): brute-force cosine top-k as the
  * exact baseline, a sign-LSH bucketed ANN variant as the scale path, and
  * embedding-cosine near-duplicate pairs.
  *
  * Numeric portability: floats are cast to double BEFORE any arithmetic
  * (float→double is exact), and the dot product is a strict left-to-right
  * fold (`aggregate` over `zip_with`) — the same evaluation order DuckDB's
  * `list_dot_product` uses on `DOUBLE[]` — so Spark and the oracle produce
  * bit-identical cosines, rounded to 6 only as belt-and-braces.
  *
  * Scale design: the query vector is a broadcast single row (never a
  * shuffle of the corpus); near-dup generates candidates only within
  * sign-LSH buckets (equi-join, no cartesian); the ANN query prunes the
  * scan to one bucket — the inverted-file (IVF) shape where the coarse
  * quantizer is the sign pattern of the leading dimensions. At real scale
  * the bucket id would be a partition/bucketing key so a query touches one
  * partition; the expression-level plumbing is identical.
  */
object Similarity {

  /** Left-to-right double dot product of two float-array columns — the
    * native codegen expression ([[graft.functions.FloatDotProduct]]).
    * Identical fold order and promotion to the compositional
    * `aggregate(zip_with(...))` form and to DuckDB's `list_dot_product`,
    * ~10x cheaper per pair (no per-row array allocation, stays in
    * whole-stage codegen).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.fdot(a, b)

  /** The compositional builtin-only form, kept as the reference semantics
    * for [[dot]] (SimilaritySpec asserts bit-equality between the two).
    */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (double, unrounded). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-LSH bucket over the first `bits` dimensions: bit k set iff
    * dimension k+1 is positive. 1-based element_at matches DuckDB's
    * list_element.
    */
  def signBucket(a: Column, bits: Int): Column =
    (1 to bits).map(k =>
      when(element_at(a, k) > 0f, lit(1L << (k - 1))).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Embeddings with their norm precomputed ONCE per vector — every
    * pairwise stage divides by stored norms instead of re-folding 64
    * dimensions per pair per side (the dominant cost of naive cosine
    * joins). Same arithmetic (dot / (sqrt(na) * sqrt(nb))), so the oracle
    * stays bit-identical with the matching CTE.
    */
  private def withNorm(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("nrm"),
        signBucket(col("embedding"), 4).as("bucket"))

  private def cosPre(a: String, b: String): Column =
    dot(col(s"$a.embedding"), col(s"$b.embedding")) /
      (col(s"$a.nrm") * col(s"$b.nrm"))

  /** Exact brute-force cosine top-10 against the vec_id=0 query vector. */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    val q = e.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    e.filter(col("vec_id") =!= 0L)
      .join(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(dot(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** IVF-style ANN: search only the query's sign-LSH bucket (16 coarse
    * cells over 4 leading dims), top-5. Approximate by construction; the
    * oracle replicates the same bucket restriction, so the gate checks the
    * algorithm, not recall.
    */
  def annBucketed(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    val q = e.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qv"), col("nrm").as("qn"),
        col("bucket").as("qbucket"))
    e.filter(col("vec_id") =!= 0L)
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col("vec_id"), col("label"),
        round(dot(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(5)
  }

  /** Embedding-cosine near-duplicate pairs: candidates share a 4-bit
    * sign-LSH bucket; emit pairs with cosine >= 0.4.
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    val a = e.alias("a")
    val b = e.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosPre("a", "b"), 6).as("cos"))
      .filter(col("cos") >= 0.4)
      .orderBy("vec_a", "vec_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim1_cosine_topk" -> cosineTopK,
    "sim2_ann_bucketed" -> annBucketed,
    "sim3_embedding_neardup" -> embeddingNearDup
  )

  private val sqlCos =
    "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
  private val sqlBucket =
    "(CASE WHEN list_element(embedding, 1) > 0 THEN 1 ELSE 0 END + " +
      "CASE WHEN list_element(embedding, 2) > 0 THEN 2 ELSE 0 END + " +
      "CASE WHEN list_element(embedding, 3) > 0 THEN 4 ELSE 0 END + " +
      "CASE WHEN list_element(embedding, 4) > 0 THEN 8 ELSE 0 END)"

  val oracle: Map[String, String] = Map(
    "sim1_cosine_topk" ->
      s"""WITH n AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT a.vec_id, a.label, round($sqlCos, 6) AS cos
         |FROM n a JOIN n b ON b.vec_id = 0 AND a.vec_id <> 0
         |ORDER BY cos DESC, a.vec_id
         |LIMIT 10""".stripMargin,
    "sim2_ann_bucketed" ->
      s"""WITH n AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
         |    CAST($sqlBucket AS BIGINT) AS bucket FROM embeddings)
         |SELECT a.vec_id, a.label, round($sqlCos, 6) AS cos
         |FROM n a JOIN n b
         |  ON b.vec_id = 0 AND a.vec_id <> 0 AND a.bucket = b.bucket
         |ORDER BY cos DESC, a.vec_id
         |LIMIT 5""".stripMargin,
    "sim3_embedding_neardup" ->
      s"""WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |    CAST($sqlBucket AS BIGINT) AS bucket FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round($sqlCos, 6) AS cos
         |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE round($sqlCos, 6) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin
  )
}

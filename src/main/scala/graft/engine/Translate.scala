package graft.engine


import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/** Translation operators (SURVEY.md §2.4 E3/E4/E5).
  *
  * The reference translates per-column DISTINCT values in batches of 100 via
  * the Azure Translator REST API (`translate.py:78-123`), then applies the
  * resulting `{original → translated}` map back to the rows with identity
  * fallback (`translate.py:219-224`: `value_map.get(x, x)`). Identity
  * fallback is also its error path — an HTTP failure leaves values untouched
  * (`translate.py:111-116`).
  *
  * Here translation is a [[Translator]] trait; the default
  * [[DictionaryTranslator]] is a deterministic dictionary seeded from a
  * translation-table artifact shaped exactly like the reference's golden
  * `cache/translated-map.json` (`{column → {original → translated}}`).
  * Application is the scalable part and uses two physical strategies:
  *   - small maps → a broadcast `typedlit` map literal +
  *     `coalesce(element_at(m, col), col)` — pure codegen expression, zero
  *     shuffle, zero extra jobs;
  *   - large maps (the golden artifact's `merchant` column has 21 775
  *     entries) → a broadcast left join + `coalesce(translated, col)` — the
  *     dictionary is broadcast to every executor once, the 100-TB fact table
  *     never shuffles.
  * A remote batched implementation would sit behind the same trait using
  * `mapPartitions` + `grouped(100)` (SURVEY §2.4 E3); out of scope under
  * zero egress.
  */
trait Translator extends Serializable {
  /** E3: translate a batch of distinct values. Total: every input is a key
    * of the result (identity fallback for unknown values).
    */
  def translate(values: Seq[String]): Map[String, String]

  /** E4 (`translate.py:125-149`): one-off translation, identity fallback. */
  def translateOne(value: String): String =
    translate(Seq(value)).getOrElse(value, value)

  /** E3 with column context (the reference's cache is per-column,
    * `{column → {orig → translated}}`). Default delegates to the
    * columnless form for translators without per-column dictionaries.
    */
  def translateColumn(column: String, values: Seq[String]): Map[String, String] =
    translate(values)
}

/** Deterministic dictionary-backed translator.
  *
  * @param table per-column translation maps, `{column → {orig → translated}}`
  * @param literalMapThreshold map sizes at or below this use the expression
  *   strategy; above it, the broadcast-join strategy
  */
final class DictionaryTranslator(
    val table: Map[String, Map[String, String]],
    val literalMapThreshold: Int = 1000)
  extends Translator {

  // Column-agnostic lookup for the columnless trait methods: when two
  // column dictionaries disagree on a key, the lexicographically-FIRST
  // column wins — deterministic regardless of map iteration order. Use
  // [[translateColumn]] when the column is known (applyTo always does).
  private val flat: Map[String, String] =
    table.toSeq.sortBy(_._1).reverse.flatMap(_._2).toMap

  override def translate(values: Seq[String]): Map[String, String] =
    values.map(v => v -> flat.getOrElse(v, v)).toMap

  /** E3 with the column known: per-column semantics, identity fallback. */
  override def translateColumn(column: String, values: Seq[String]): Map[String, String] = {
    val m = forColumn(column)
    values.map(v => v -> m.getOrElse(v, v)).toMap
  }

  /** Map for one column (empty when the column has no dictionary). */
  def forColumn(c: String): Map[String, String] = table.getOrElse(c, Map.empty)

  /** E5 restricted to a column subset (EP2 applies maps only to the
    * detected NON-ENGLISH text columns, `translate.py:219-224`).
    */
  def applyTo(df: DataFrame, onlyCols: Seq[String]): DataFrame =
    new DictionaryTranslator(
      table.view.filterKeys(onlyCols.toSet).toMap, literalMapThreshold)
      .applyTo(df)

  /** E5 (`translate.py:219-224`): apply every applicable column map in ONE
    * `select` (single projection node — plan size stays linear in width).
    * Columns without a dictionary pass through untouched, unknown values
    * fall back to identity, null stays null.
    */
  def applyTo(df: DataFrame): DataFrame = {
    val (small, large) = table
      .filter { case (c, m) => m.nonEmpty && df.columns.contains(c) }
      .partition { case (_, m) => m.size <= literalMapThreshold }

    val projected = df.select(df.columns.map { c =>
      small.get(c) match {
        case Some(m) =>
          val lookup: Column = element_at(typedlit(m), col(c))
          coalesce(lookup, col(c)).as(c)
        case None => col(c)
      }
    }.toIndexedSeq: _*)

    // Large maps: one broadcast left join per column; the fact side never
    // shuffles and the joins chain without materialization.
    large.foldLeft(projected) { case (acc, (c, m)) =>
      val spark = df.sparkSession
      import spark.implicits._
      val dict = m.toSeq.toDF("__orig", "__trans")
      acc.join(broadcast(dict), acc(c) === col("__orig"), "left")
        .select(acc.columns.map {
          case `c` => coalesce(col("__trans"), col(c)).as(c)
          case o => col(o)
        }.toIndexedSeq: _*)
    }
  }
}

/** Decorator adding the reference's call-batching (`translate.py:98-100`:
  * 100 values per Azure request) to any [[Translator]] with per-call
  * overhead. Pure pass-through for dictionary-backed impls; essential for
  * a remote impl (which would also add the rate limiting of
  * `translate.py:118` here — out of scope under zero egress).
  */
final class BatchedTranslator(underlying: Translator, batchSize: Int = 100)
  extends Translator {
  require(batchSize > 0)
  override def translate(values: Seq[String]): Map[String, String] =
    values.grouped(batchSize)
      .map(underlying.translate)
      .foldLeft(Map.empty[String, String])(_ ++ _)
}

object Translate {

  /** Distributed batched translation of a long-format distinct dictionary
    * `(column_name, value)`: `mapPartitions` + `grouped(batchSize)`, so a
    * remote-service translator is called once per column per batch per
    * partition — the scale shape of the reference's loop
    * (`translate.py:78-123`) where the expensive call count is bounded by
    * DISTINCT values / batchSize, never row count. Lookups are PER COLUMN
    * (`translateColumn`), matching the reference's per-column cache — a
    * value shared by two columns translates by its own column's
    * dictionary, never another's.
    */
  def translateDictionary(
      dict: org.apache.spark.sql.DataFrame,
      translator: Translator,
      batchSize: Int = 100): org.apache.spark.sql.DataFrame = {
    val spark = dict.sparkSession
    import spark.implicits._
    dict.select("column_name", "value").as[(String, String)]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.groupBy(_._1).iterator.flatMap { case (c, vs) =>
            val m = translator.translateColumn(c, vs.map(_._2))
            vs.map { case (_, v) => (c, v, m.getOrElse(v, v)) }
          }
        }
      }
      .toDF("column_name", "value", "translated")
  }
}

object DictionaryTranslator {

  /** Load a translation table shaped like the reference's golden artifact
    * (`cache/translated-map.json`): `{column → {original → translated}}`.
    * Driver-side load — translation tables are dictionary-sized by
    * construction (distinct values, not rows). Byte I/O goes through
    * [[graft.sources.Artifacts.loadMap]] (Hadoop FileSystem), so the
    * artifact can live on cluster storage next to the frame artifacts.
    */
  def fromJson(path: String): DictionaryTranslator =
    new DictionaryTranslator(graft.sources.Artifacts.loadMap(path))
}

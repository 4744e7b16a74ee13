package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** The reference's 9-step cleaning pass (`preprocess.py:28-91`, steps P1-P10
  * of SURVEY.md §2.2) re-expressed as a scale-safe Spark pipeline.
  *
  * Reference semantics preserved exactly, in reference order:
  *   - P1 column-name normalization: strip → lower → spaces→"_" → drop
  *     non-`[\w_]` chars (`preprocess.py:32-39`) — pure metadata, no shuffle;
  *   - P2 drop all-null columns, judged on the RAW values, before placeholder
  *     rewriting (`preprocess.py:42-45`);
  *   - P3 drop columns whose normalized name starts with "unnamed"
  *     (`preprocess.py:48-51`);
  *   - P4 duplicate column names keep the FIRST occurrence
  *     (`preprocess.py:54-57`);
  *   - P5 placeholder→null rewrite: exact, case-sensitive, applied BEFORE the
  *     whitespace strip — `"N/A"` and `" - "` survive (`preprocess.py:60-62`);
  *   - P6 trim string columns (`preprocess.py:65-66`). Divergence (documented
  *     in SURVEY §1.2): the reference's `astype(str)` turns NaN into the
  *     literal string `"nan"`; we keep nulls as nulls;
  *   - P7 numeric coercion is ALL-OR-NOTHING per column: a string column is
  *     cast to double only if every non-null (post-P5/P6) value parses;
  *     otherwise the whole column stays string (`preprocess.py:69-73`).
  *     Implemented as a validation count, NOT a per-value `try_cast` (which
  *     would silently null bad values and diverge);
  *   - P8 datetime coercion is PER-VALUE, only for string columns whose
  *     normalized name contains "date" or "time" and that did not coerce to
  *     numeric: unparseable values become null (`preprocess.py:76-82`);
  *   - P9 exact full-row deduplication (`preprocess.py:85-89`);
  *   - P10 a human-readable cleaning log accompanies the frame.
  *
  * Scale design (100 TB): the whole pass costs exactly TWO scans of the
  * source — one fused validation aggregate (per-column non-null counts and
  * numeric-parse-failure counts computed in a single projection + single
  * aggregate row collected to the driver) and one final projection composing
  * every per-column transform in ONE `select` (no `withColumn` chains — plan
  * size stays linear in column count), followed by `dropDuplicates` (the only
  * shuffle, on all columns, with map-side partial aggregation). Verbose row
  * accounting adds two `count()` actions and is off by default.
  */
object Preprocess {

  /** Placeholder strings rewritten to null (`preprocess.py:60`). */
  val Placeholders: Seq[String] = Seq("n/a", "none", "-", "null", "")

  final case class CleanResult(df: DataFrame, log: Seq[String])

  /** P1 name normalization (`preprocess.py:32-39`). */
  def normalizeName(name: String): String =
    name.trim.toLowerCase.replace(" ", "_").replaceAll("[^\\w_]", "")

  /** Run the full cleaning pass. */
  def clean(df: DataFrame, verbose: Boolean = false): CleanResult = {
    val log = Seq.newBuilder[String]
    val fields = df.schema.fields
    val n = fields.length
    // Positional temp names so arbitrary source headers (spaces, dots,
    // punctuation, duplicates) never need quoting in expressions.
    val tmp = Array.tabulate(n)(i => s"__c$i")
    val dfT = df.toDF(tmp.toIndexedSeq: _*)
    val normalized = fields.map(f => normalizeName(f.name))
    log += s"Normalized $n column names"

    val isString = fields.map(_.dataType == StringType)

    // P5+P6 composed per-column cleaning expression (string cols only).
    def cleanedCol(i: Int): Column = {
      val c = col(tmp(i))
      if (isString(i)) trim(when(c.isin(Placeholders: _*), lit(null)).otherwise(c))
      else c
    }

    // ---- Pass 1: ONE fused validation aggregate over a single scan ----
    // Projection materializes raw + cleaned values side by side so `expr`
    // can reference the cleaned string columns by temp name for try_cast
    // (try_cast has no version-stable Column-API form).
    val both = dfT.select(
      (0 until n).map(i => col(tmp(i)).as(s"__raw$i")) ++
        (0 until n).map(i => cleanedCol(i).as(tmp(i))): _*)
    val validationAggs: Seq[Column] = (0 until n).flatMap { i =>
      val nnRaw = count(col(s"__raw$i")).as(s"nn$i") // P2: raw non-null count
      if (isString(i))
        Seq(nnRaw,
          sum(when(col(tmp(i)).isNotNull &&
              expr(s"try_cast(${tmp(i)} as double)").isNull, 1L)
            .otherwise(0L)).as(s"bad$i")) // P7: cleaned parse failures
      else Seq(nnRaw)
    }
    val row = both.agg(validationAggs.head, validationAggs.tail: _*).head()
    val nonNull = (0 until n).map(i => row.getAs[Long](s"nn$i"))
    val badNum = (0 until n).map { i =>
      if (isString(i)) Option(row.getAs[Long](s"bad$i")).getOrElse(0L) else -1L
    }

    // ---- Driver-side column decisions, in reference order ----
    val afterP2 = (0 until n).filter(i => nonNull(i) > 0)
    val droppedNull = (0 until n).diff(afterP2).map(i => fields(i).name)
    if (droppedNull.nonEmpty)
      log += s"Dropped all-null columns: ${droppedNull.mkString(", ")}"
    val afterP3 = afterP2.filterNot(i => normalized(i).startsWith("unnamed"))
    val droppedUnnamed = afterP2.diff(afterP3).map(i => normalized(i))
    if (droppedUnnamed.nonEmpty)
      log += s"Dropped unnamed columns: ${droppedUnnamed.mkString(", ")}"
    val seen = scala.collection.mutable.HashSet.empty[String]
    val kept = afterP3.filter(i => seen.add(normalized(i)))
    val droppedDup = afterP3.diff(kept).map(i => normalized(i))
    if (droppedDup.nonEmpty)
      log += s"Dropped duplicate columns (keep-first): ${droppedDup.mkString(", ")}"

    // ---- Pass 2: ONE projection composing P5/P6/P7/P8 per kept column ----
    // Select from a cleaned pre-projection (same temp names) so the
    // try_to_timestamp expr sees post-P5/P6 values, as the reference does.
    val cleanedFrame =
      dfT.select((0 until n).map(i => cleanedCol(i).as(tmp(i))): _*)
    val projected = cleanedFrame.select(kept.map { i =>
      val name = normalized(i)
      val c = col(tmp(i))
      val e: Column =
        if (isString(i) && badNum(i) == 0L) {
          log += s"Cast column $name to double"
          c.cast(DoubleType)
        } else if (isString(i) &&
            (name.contains("date") || name.contains("time"))) {
          log += s"Coerced column $name to timestamp (per-value)"
          expr(s"try_to_timestamp(${tmp(i)})")
        } else c
      e.as(name)
    }: _*)

    // P9 exact row dedup — the pass's only shuffle.
    val deduped = projected.dropDuplicates()
    if (verbose) {
      val before = projected.count()
      val after = deduped.count()
      log += s"Removed ${before - after} duplicate rows ($before -> $after)"
    } else log += "Dropped duplicate rows"

    CleanResult(deduped, log.result())
  }
}

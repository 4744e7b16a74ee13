package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sources and sinks (SURVEY.md §2.1).
  *
  * S1/S3 ([[Loader.load]]): the reference dispatches on file extension —
  * `.csv` via `pd.read_csv(low_memory=False)` (whole-file schema inference),
  * `.xlsx` via `pd.read_excel`, anything else raises
  * (`preprocess.py:15-26`). Here: csv (header + inferSchema for parity),
  * parquet, json, xlsx (via [[Xlsx]]); unknown extensions throw
  * `IllegalArgumentException`.
  *
  * S2/S7 ([[WorkbookSource]]/[[WorkbookSink]]): the reference's multi-sheet
  * Excel workbook is a `{sheet name → table}` namespace
  * (`preprocess.py:17-20`, `mapper.py:123-136`). TWO implementations share
  * the seam:
  *   - [[XlsxWorkbookSource]]/[[XlsxWorkbookSink]] — the reference's actual
  *     binary `.xlsx` blob, via the dependency-free [[Xlsx]] codec
  *     (report-scale by Excel's own 1,048,576-row cap);
  *   - [[DirWorkbookSource]]/[[WorkbookSink]] — a DIRECTORY of single-table
  *     files (sheet name = file base name), the representation that scales:
  *     each "sheet" is a splittable parquet/csv dataset instead of a
  *     single-node binary blob.
  * Both keep the reference's 31-character sheet-name truncation rule
  * (`mapper.py:134`, Excel's limit) through one [[WorkbookSink.sheetNames]]
  * transform, collision-safe where the reference silently overwrites.
  */
object Loader {

  /** S1/S3: extension-dispatched load. For `.xlsx` the reference returns a
    * `{sheet → DataFrame}` dict; this single-table entry point unwraps a
    * one-sheet workbook and refuses a multi-sheet one with a pointer to
    * [[XlsxWorkbookSource]] (the dict-shaped S2 API) rather than guessing
    * which sheet the caller meant.
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv"))
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else if (lower.endsWith(".parquet")) spark.read.parquet(path)
    else if (lower.endsWith(".json")) spark.read.json(path)
    else if (lower.endsWith(".xlsx")) {
      val sheets = Xlsx.read(spark, path)
      sheets.values.toSeq match {
        case Seq(only) => only
        case _ => throw new IllegalArgumentException(
          s"Workbook $path has ${sheets.size} sheets; use XlsxWorkbookSource.load " +
            "for the {sheet -> DataFrame} namespace")
      }
    }
    else throw new IllegalArgumentException(
      s"Unsupported file format: $path (expected .csv, .parquet, .json or .xlsx)")
  }
}

trait WorkbookSource {
  /** S2: load a `{table name → DataFrame}` namespace. */
  def load(spark: SparkSession, path: String): Map[String, DataFrame]
}

/** Directory-of-tables workbook: every regular file (or partitioned
  * subdirectory of parquet/csv parts) under `path` is one table named by its
  * base name.
  *
  * The listing goes through the Hadoop `FileSystem` API resolved from the
  * session's `hadoopConfiguration`, so the workbook directory can live on
  * ANY storage the cluster reaches (`file:`, `hdfs:`, `s3a:`, ...) — a
  * `java.io.File` listing would only ever see the driver's local disk,
  * which contradicts the whole point of each sheet being a splittable
  * distributed dataset.
  */
object DirWorkbookSource extends WorkbookSource {
  override def load(spark: SparkSession, path: String): Map[String, DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Missing and non-directory paths share one error contract (the
    // java.io.File era treated both as "not a directory").
    val status = try fs.getFileStatus(p) catch {
      case _: java.io.FileNotFoundException =>
        throw new IllegalArgumentException(s"Not a directory: $path")
    }
    require(status.isDirectory, s"Not a directory: $path")
    val entries = fs.listStatus(p).toSeq.sortBy(_.getPath.getName).flatMap { f =>
      val name = f.getPath.getName.replaceFirst("\\.[^.]+$", "")
      val child = f.getPath.toString
      // Subdirectories: try parquet parts first, then csv parts (a Spark
      // csv sink writes a directory too). Anything unreadable as a table
      // is skipped, not fatal — workbooks may carry stray files.
      val loaded =
        if (f.isDirectory)
          scala.util.Try(spark.read.parquet(child))
            .orElse(scala.util.Try(
              spark.read.option("header", "true").option("inferSchema", "true")
                .csv(child)))
            .toOption
        else scala.util.Try(Loader.load(spark, child)).toOption
      loaded.map(name -> _)
    }
    // Base-name collisions ("sales.csv" + "sales.json") keep the FIRST in
    // sorted-name order — deterministic, never a silent last-wins.
    entries.foldLeft(Map.empty[String, DataFrame]) {
      case (acc, (k, v)) => if (acc.contains(k)) acc else acc + (k -> v)
    }
  }
}

object WorkbookSink {

  /** The reference's Excel sheet-name cap (`mapper.py:134`). */
  def sheetName(table: String): String = table.take(31)

  /** Sheet names for a whole workbook. Table names that COLLIDE after the
    * 31-char truncation are deterministically disambiguated with a `~N`
    * suffix inside the 31-char budget (processed in sorted order, so the
    * mapping is input-order independent). This is a documented divergence
    * from the reference, whose `mapper.py:134` truncation silently
    * overwrites earlier sheets — data loss a sink must never commit.
    */
  def sheetNames(tables: Seq[String]): Map[String, String] =
    sheetNames(tables, identity)

  /** As above with a pre-transform applied before truncation — e.g.
    * [[Xlsx.sanitizeSheetName]]'s forbidden-character mapping. Collision
    * handling runs on the TRANSFORMED names, so two tables that collide
    * only after the transform still get distinct `~N` suffixes, keyed by
    * their original names.
    */
  def sheetNames(tables: Seq[String], prep: String => String): Map[String, String] = {
    // Excel requires sheet names unique CASE-INSENSITIVELY — a workbook
    // with both "Sales" and "sales" is flagged corrupt/repaired — so the
    // collision set is keyed on the case-folded name while the emitted
    // name keeps the table's original case.
    val used = scala.collection.mutable.Set.empty[String]
    tables.sorted.map { t =>
      val base = sheetName(prep(t))
      // Excel (and openpyxl/pandas ExcelWriter) reject an empty sheet
      // name, and the directory sink would turn one into a write AT the
      // workbook directory itself — refuse loudly instead of renaming.
      require(base.nonEmpty, s"Table name '$t' maps to an empty sheet name")
      val name =
        if (!used(base.toLowerCase)) base
        else Iterator.from(1)
          .map(i => base.take(31 - (i.toString.length + 1)) + "~" + i)
          .find(n => !used(n.toLowerCase)).get
      used += name.toLowerCase
      t -> name
    }.toMap
  }

  /** S7: one parquet dataset per table under `path`. Sheet names become
    * CHILD PATHS here, so path-hostile table names are refused loudly: a
    * separator would silently nest the "sheet" outside the flat workbook
    * listing [[DirWorkbookSource]] reads back, and `..` would aim the
    * overwrite-mode parquet write at the workbook's PARENT directory —
    * the one destination a sink must never be able to clobber.
    */
  def save(tables: Map[String, DataFrame], path: String): Unit = {
    val names = sheetNames(tables.keys.toSeq)
    names.foreach { case (t, n) =>
      require(isSafeEntryName(n),
        s"Table name '$t' is not a safe workbook entry name ('$n')")
    }
    tables.toSeq.sortBy(_._1).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$path/${names(name)}")
    }
  }

  /** Windows device names that shadow any file of that base name
    * (`CON.parquet` still resolves to the console device on Windows).
    */
  private val WindowsReserved: Set[String] =
    Set("CON", "PRN", "AUX", "NUL") ++
      (1 to 9).flatMap(i => Seq(s"COM$i", s"LPT$i"))

  /** Filesystem-safety guard for directory-sink entry names, beyond the
    * separator/dot-traversal refusals: control characters (incl. NUL)
    * corrupt listings or truncate paths in C-string layers,
    * whitespace-only names produce entries no reader can address, and
    * Windows reserved device names make the workbook unreadable on that
    * platform. Kept as a REFUSAL (not a rename) to match the sink's
    * loud-failure contract for path-hostile table names.
    */
  private[graft] def isSafeEntryName(n: String): Boolean =
    !n.contains('/') && !n.contains('\\') && n != "." && n != ".." &&
      n.trim.nonEmpty &&
      !n.exists(c => c < ' ' || c == '\u007f') &&
      !WindowsReserved.contains(n.takeWhile(_ != '.').toUpperCase)
}

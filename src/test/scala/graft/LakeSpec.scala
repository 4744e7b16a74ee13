package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Lake

/** Partitioned-lake layout: directory pruning at plan time and explicit
  * output-file budgets — the storage disciplines the 100 TB notes in
  * [[graft.sources.Lake]] promise.
  */
class LakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("partition filter prunes directories, not rows") {
    val scan = Lake.prunedScan(spark, sf)
    val plan = scan.queryExecution.executedPlan.toString
    // the event_type predicate must be a PARTITION filter (resolved
    // against the directory layout), never a per-row data filter
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    val pf = plan.split("PartitionFilters:")(1).split("]")(0)
    assert(pf.contains("event_type"), plan.take(2000))
    assert(!plan.split("PushedFilters:")(1).split("]")(0).contains("event_type"),
      plan.take(2000))
    // and the partition column is not read from the files themselves
    val rows = scan.count()
    val direct = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "click").count()
    assert(rows == direct && rows > 0)
  }

  test("compacted write honors the output file budget exactly") {
    val out = Lake.compactedWrite(
      Tables.t(spark, sf, "events").select("event_id", "user_id", "value"),
      "events_compacted", numFiles = 4)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length == 4, files.map(_.getName).mkString(","))
    // nothing lost in the compaction
    assert(spark.read.parquet(out).count() ==
      Tables.t(spark, sf, "events").count())
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.t
import graft.operators.Events
import graft.streaming.{SEvent, Sessionize, Streams}

/** Streaming semantics pinned against their batch twins on sf0.001:
  * the same declarative plan runs as a stream (memory sink,
  * processAllAvailable) and must reproduce the batch result.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** events written as several parquet files so the file stream source
    * produces multiple micro-batches (maxFilesPerTrigger=1) and the
    * watermark actually advances between batches.
    */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    t(spark, sf, "events")
      .repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def eventStream: DataFrame = {
    val schema = spark.read.parquet(streamDir).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
  }

  test("streaming tumbling windows (complete mode) == batch window() result") {
    val q = Streams.tumblingCounts(eventStream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("tumbling_out")
      .orderBy("window_start_ms", "event_type").collect()
    val batch = Events.tumbling(spark, sf).collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
  }

  test("stateful sessionization: single batch closes all but each user's open tail") {
    import spark.implicits._
    // Single file -> single micro-batch -> the in-batch fold sees each
    // user's full ordered history: every session except the final open one
    // per user is emitted, and must equal the batch session_window result.
    // (Multi-batch order is exercised separately; file listing order is not
    // time order, so cross-batch arrival order is not deterministic.)
    val oneDir = Files.createTempDirectory("graft-sess").toString
    t(spark, sf, "events").coalesce(1).write.mode("overwrite").parquet(oneDir)
    val schema = spark.read.parquet(oneDir).schema
    val events = spark.readStream.schema(schema).parquet(oneDir)
      .select(col("user_id"), col("ts"), col("value")).as[SEvent]
    val q = Sessionize.sessions(events)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("sessions_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_ms"),
        r.getAs[Long]("session_end_ms"), r.getAs[Long]("n_events")))
    val batch = Events.sessions(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_ms"),
        r.getAs[Long]("session_end_ms"), r.getAs[Long]("n_events")))
    val batchSet = batch.toSet
    val nUsers = batch.map(_._1).distinct.length
    assert(streamed.nonEmpty)
    streamed.foreach(s => assert(batchSet.contains(s),
      s"streamed session $s not found in batch session_window result"))
    assert(streamed.length >= batch.length - nUsers)
  }

  test("stream-stream interval join == batch interval join") {
    // single file -> single micro-batch: both sides' state sees all rows,
    // so the join must emit exactly the batch result (multi-file runs shed
    // late files nondeterministically — file listing order != time order)
    val oneDir = Files.createTempDirectory("graft-ssj").toString
    t(spark, sf, "events").coalesce(1).write.mode("overwrite").parquet(oneDir)
    val schema = spark.read.parquet(oneDir).schema
    val stream = spark.readStream.schema(schema).parquet(oneDir)
    val q = Streams.clickPurchaseJoin(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out")
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("ssjoin_out").collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
    val batch = graft.operators.AsOf.intervalJoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
    assert(batch.nonEmpty && streamed == batch,
      s"streamed ${streamed.size} vs batch ${batch.size}")
  }

  test("dropDuplicatesWithinWatermark removes planted duplicates") {
    // duplicates written into the SAME files so each copy lands in the same
    // micro-batch (a second stream's copies would arrive behind the
    // watermark and be dropped as late data, not as duplicates)
    // single file -> single micro-batch: isolates dedup semantics from
    // late-arrival dropping (file listing order is not time order, so
    // multi-file runs would shed whole files as late data)
    val dupDir = Files.createTempDirectory("graft-dups").toString
    val base = t(spark, sf, "events")
    base.union(base).coalesce(1)
      .write.mode("overwrite").parquet(dupDir)
    val schema = spark.read.parquet(dupDir).schema
    val withDups = spark.readStream.schema(schema).parquet(dupDir)
    val q = Streams.dedupWithinWatermark(withDups)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val n = spark.table("dedup_out").count()
    val expected = t(spark, sf, "events").count()
    assert(n == expected)
  }
}

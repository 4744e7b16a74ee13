package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Caching

/** Scoped-cache lifecycle: the listener must leave the session after its
  * consuming action, and — the round-4 leak — also when that action NEVER
  * arrives (plan built, then abandoned), once enough unrelated actions
  * have completed.
  */
class CachingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Listener completion is async (listener-bus thread): poll. */
  private def awaitOutstanding(n: Int, timeoutMs: Long = 20000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (Caching.outstanding != n && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(Caching.outstanding == n,
      s"outstanding=${Caching.outstanding}, expected $n")
  }

  /** Expire every leftover listener from EARLIER suites before reading a
    * baseline: their releases arrive asynchronously on the listener-bus
    * thread and would otherwise race the point-in-time asserts below.
    * After MaxMissedActions+1 completed actions every pre-existing
    * listener has either matched or expired, and nothing can release
    * between the returned baseline and the next action this test runs.
    */
  private def drainedBaseline(): Int = {
    (1 to Caching.MaxMissedActions + 1).foreach(_ => spark.range(1).count())
    val deadline = System.currentTimeMillis() + 20000
    var prev = -1
    var cur = Caching.outstanding
    while ((prev != cur || cur > 0) && System.currentTimeMillis() < deadline) {
      prev = cur
      Thread.sleep(200)
      cur = Caching.outstanding
    }
    cur
  }

  test("a consumed action releases the cache and its listener") {
    val baseline = drainedBaseline()
    val cached = Caching.scopedPersist(
      spark.range(1000).toDF("id").withColumn("x", col("id") * 2))
    assert(Caching.outstanding == baseline + 1)
    val derived = cached.filter(col("x") % 4 === 0)
    assert(derived.count() == 500)
    awaitOutstanding(baseline)
    // storage released too (poll: unpersist is non-blocking)
    val deadline = System.currentTimeMillis() + 20000
    while (cached.storageLevel != StorageLevel.NONE &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(cached.storageLevel == StorageLevel.NONE)
  }

  test("releaseAll drops leftover cached frames and localCheckpoint blocks") {
    val cached = spark.range(300).toDF("id").persist()
    assert(cached.count() == 300) // materialize the cache
    val checkpointed = spark.range(200).toDF("id").localCheckpoint()
    assert(checkpointed.count() == 200)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    Caching.releaseAll(spark)
    // releaseAll(blocking=true) waits for block removal of everything in
    // persistentRdds, but clearCache()'s own CacheManager-entry teardown
    // is async — poll so the assert never races the listener-bus thread.
    val deadline = System.currentTimeMillis() + 20000
    while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    assert(cached.storageLevel == StorageLevel.NONE)
  }

  test("releaseAll(blocking=true) synchronously drains cached-frame blocks") {
    // Pins the r14 ordering fix: the unpersist pass runs BEFORE
    // clearCache(), while the SQL cache's cachedColumnBuffers RDD is
    // still registered in persistentRdds, so blocking=true waits for its
    // block removal too (clearCache alone removes cache blocks async).
    // No polling here — the registry must be empty ON RETURN. Suites run
    // sequentially in the forked test JVM and concurrent listener-bus
    // releases can only REMOVE entries, so the assert cannot race an add.
    val cached = spark.range(1234).toDF("id").cache()
    assert(cached.count() == 1234)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    Caching.releaseAll(spark, gc = false)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("releaseAll before a scoped cache's consuming action is correctness-safe") {
    // releaseAll's documented contract: dropping a scoped cache whose
    // consuming action has not run yet forfeits the reuse but never the
    // result — the consumer recomputes from lineage.
    val pending = Caching.scopedPersist(
      spark.range(400).toDF("id").withColumn("z", col("id") % 7))
    Caching.releaseAll(spark)
    assert(pending.filter(col("z") === 0).count() == 58)
  }

  test("an abandoned plan expires after unrelated actions instead of leaking") {
    val baseline = drainedBaseline()
    val abandoned = Caching.scopedPersist(
      spark.range(500).toDF("id").withColumn("y", col("id") + 1))
    assert(Caching.outstanding == baseline + 1)
    // No action ever consumes `abandoned`; unrelated traffic must expire it.
    (1 to Caching.MaxMissedActions + 1).foreach(_ => spark.range(2).count())
    awaitOutstanding(baseline)
    val deadline = System.currentTimeMillis() + 20000
    while (abandoned.storageLevel != StorageLevel.NONE &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(abandoned.storageLevel == StorageLevel.NONE)
  }
}

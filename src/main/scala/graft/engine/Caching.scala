package graft.engine

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Scoped caching for lazy operator plans.
  *
  * Operators in this library return LAZY DataFrames — the caller decides
  * when (and how often) to execute — so an operator that persists an
  * intermediate frame for plan-internal reuse cannot eagerly unpersist it:
  * the blocks must survive until the caller's action has actually run.
  * Leaving them persisted forever (round-3 behavior) is the opposite
  * failure: a long-lived session accumulates storage blocks and repeated
  * invocations trip "already cached" warnings.
  *
  * [[scopedPersist]] resolves the tension: it persists the frame and
  * registers a one-shot [[QueryExecutionListener]] that watches for the
  * first completed action (success OR failure) whose analyzed plan
  * contains this frame's plan as a subtree, then unpersists and
  * deregisters itself. Unpersist is always correctness-safe in Spark
  * (consumers recompute from lineage), so the release can never corrupt a
  * concurrent reader — at worst a second action on the same returned plan
  * recomputes the intermediate, which is the documented contract: the
  * cache's scope is ONE consuming action.
  */
object Caching {

  def scopedPersist(
      df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val spark = df.sparkSession
    // An equivalent plan may already be cached by an earlier construction
    // of the same operator whose consuming action has not run yet (e.g. a
    // plan-only audit built the query without executing it). Re-persisting
    // would just log a CacheManager warning; reuse the existing entry — its
    // original listener still owns the release.
    if (df.storageLevel != StorageLevel.NONE) return df
    val persisted = df.persist(level)
    val target = persisted.queryExecution.analyzed
    val released = new AtomicBoolean(false)
    val listener = new QueryExecutionListener {
      // sameResult (not eq): the consuming action analyzes its own copy of
      // the plan tree, so identity comparison would never match.
      private def consumed(qe: QueryExecution): Boolean =
        try qe.analyzed.exists(_.sameResult(target))
        catch { case _: Throwable => false }
      private def release(qe: QueryExecution): Unit =
        if (consumed(qe) && released.compareAndSet(false, true)) {
          persisted.unpersist(blocking = false)
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(
          funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        release(qe)
      override def onFailure(
          funcName: String, qe: QueryExecution, exception: Exception): Unit =
        release(qe)
    }
    spark.listenerManager.register(listener)
    persisted
  }
}

package graft.engine

import org.apache.spark.sql.SparkSession

/** Driver-side concurrency helper for batches of small independent Spark
  * jobs (the per-column sample jobs of the enrichment pipelines).
  */
object Jobs {

  /** Run independent driver-side jobs concurrently with a finite deadline.
    *
    * Cancellation is SCOPED: each future tags its Spark jobs with a unique
    * job group (set inside the future's thread — job groups are
    * thread-local), so on timeout only this batch's jobs are cancelled and
    * unrelated work sharing the SparkContext (a concurrent streaming
    * micro-batch, another pipeline) is untouched. Futures that have not
    * started when the deadline fires see the cancellation flag and never
    * submit their job, so no stragglers outlive the failure. The
    * TimeoutException is preserved as the cause.
    */
  def boundedTraverse[A, B](
      spark: SparkSession, items: Seq[A], what: String)(f: A => B): Seq[B] = {
    import scala.concurrent.{Await, Future, TimeoutException}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val group = what + "-" + java.util.UUID.randomUUID()
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sc = spark.sparkContext
    try Await.result(
      Future.traverse(items) { a =>
        Future {
          if (cancelled.get)
            throw new IllegalStateException(s"$what: batch cancelled after timeout")
          sc.setJobGroup(group, what, interruptOnCancel = true)
          try f(a) finally sc.clearJobGroup()
        }
      }, 10.minutes)
    catch {
      case te: TimeoutException =>
        cancelled.set(true)
        sc.cancelJobGroup(group)
        throw new RuntimeException(
          s"$what: sample jobs did not finish within 10 minutes", te)
    }
  }
}

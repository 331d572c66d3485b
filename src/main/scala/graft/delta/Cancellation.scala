package graft.delta

import org.apache.spark.sql.SparkSession

/** Cooperative cancellation for long-running reads (reference
  * kernel/src/cancellation.rs): a caller supplies a token, the engine
  * polls it at action-batch boundaries (snapshot replay commits,
  * streamed file-handoff rows, CDF version classification), and
  * cancellation always surfaces as [[QueryCancelledException]] —
  * never as normal iterator exhaustion — so a partial listing can
  * never be mistaken for a complete one.
  *
  * The Spark twist the Rust kernel anticipates for "cancellation-aware
  * engines racing their I/O": inside [[Cancellation.withToken]] the
  * scope runs under a Spark job group, and cancelling the token also
  * cancels the group — in-flight DISTRIBUTED jobs (checkpoint-arm
  * replay, data scans) die promptly instead of running to completion
  * before the next driver-side poll notices.
  */
trait CancellationToken {
  def isCancelled: Boolean
}

class QueryCancelledException(msg: String = "query cancelled")
    extends RuntimeException(msg)

object CancellationToken {

  /** A manually triggered token; `cancel()` is thread-safe and also
    * fires any registered hooks (the job-group kill).
    */
  final class Manual extends CancellationToken {
    @volatile private var cancelled = false
    private val hooks =
      new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()
    override def isCancelled: Boolean = cancelled
    def cancel(): Unit = {
      cancelled = true
      hooks.forEach(h => h())
    }
    private[delta] def onCancel(h: () => Unit): Unit = {
      hooks.add(h)
      if (cancelled) h() // raced with cancel(): fire immediately
    }
  }

  def manual(): Manual = new Manual
}

object Cancellation {

  private val current = new ThreadLocal[Option[CancellationToken]] {
    override def initialValue(): Option[CancellationToken] = None
  }

  /** Throws [[QueryCancelledException]] if the scope's token is
    * cancelled. Cheap enough for per-row polling on the driver (one
    * ThreadLocal read + volatile read); engine loops call it at batch
    * boundaries.
    */
  def check(): Unit = current.get().foreach { t =>
    if (t.isCancelled) throw new QueryCancelledException
  }

  /** Runs `f` under `token`: driver-side engine loops poll it, and all
    * Spark jobs submitted by this thread join a job group that
    * `Manual.cancel()` kills. A job aborted by that kill is re-surfaced
    * as [[QueryCancelledException]] (the reference rule: cancellation
    * is always `Error::Cancelled`, never a partial success or an
    * engine-specific abort).
    */
  def withToken[A](spark: SparkSession, token: CancellationToken)
      (f: => A): A = {
    val sc = spark.sparkContext
    val groupId = s"graft-cancel-${java.util.UUID.randomUUID()}"
    token match {
      case m: CancellationToken.Manual =>
        m.onCancel(() => sc.cancelJobGroup(groupId))
      case _ => // polled-only token: distributed jobs end at next poll
    }
    val prev = current.get()
    current.set(Some(token))
    sc.setJobGroup(groupId, "graft cancellable operation",
      interruptOnCancel = true)
    try {
      check() // fail fast: cancelled work is not begun
      f
    } catch {
      case e: Exception if token.isCancelled &&
          !e.isInstanceOf[QueryCancelledException] =>
        // a job-group kill surfaces as SparkException — normalize
        throw new QueryCancelledException(
          s"query cancelled (job aborted: ${e.getMessage})")
    } finally {
      current.set(prev)
      sc.clearJobGroup()
    }
  }
}

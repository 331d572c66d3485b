package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One raw event entering streaming sessionization. */
case class SessEvent(user_id: Long, ts: Timestamp, event_id: Long)

/** A closed session: same shape as the batch q_sessionize aggregate. */
case class SessOut(
    user_id: Long, session_idx: Long, n: Long,
    min_eid: Long, max_eid: Long, dur_us: Long)

/** Per-key state: the currently open session (if any) and how many
  * sessions this key has already closed (for 1-based session_idx).
  */
case class SessAcc(
    openStartUs: Long, openLastUs: Long, openN: Long,
    openMinEid: Long, openMaxEid: Long,
    idx: Long, hasOpen: Boolean)

/** Streaming gap sessionization — the stateful-streaming twin of
  * `graft.ops.Relational.sessionize`. Events are grouped by user;
  * `flatMapGroupsWithState` keeps one open session per key and emits a
  * session exactly when the event-time watermark passes its last event
  * plus the gap (EventTimeTimeout), so output is append-only and each
  * closed session matches the batch operator's aggregate for the same
  * prefix of the stream.
  *
  * At scale this is the canonical Structured Streaming shape: state is
  * O(active keys), one shuffle on the key per microbatch, and the
  * watermark bounds state retention — no unbounded buffering.
  */
object Sessionization {

  private def us(t: Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  def sessions(
      events: Dataset[SessEvent],
      gapSeconds: Long,
      watermarkDelay: String): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L

    def close(user: Long, a: SessAcc): SessOut =
      SessOut(user, a.idx, a.openN, a.openMinEid, a.openMaxEid,
        a.openLastUs - a.openStartUs)

    def fn(user: Long, batch: Iterator[SessEvent],
        state: GroupState[SessAcc]): Iterator[SessOut] = {
      val out = ListBuffer.empty[SessOut]
      var acc = state.getOption
        .getOrElse(SessAcc(0L, 0L, 0L, 0L, 0L, 0L, hasOpen = false))
      if (state.hasTimedOut) {
        // watermark passed openLast + gap: the open session is closed
        if (acc.hasOpen) out += close(user, acc)
        state.update(acc.copy(hasOpen = false))
      } else {
        // within a microbatch arrival order is arbitrary: establish the
        // same (ts, event_id) order the batch operator uses
        val evs = batch.toIndexedSeq.sortBy(e => (us(e.ts), e.event_id))
        for (e <- evs) {
          val t = us(e.ts)
          if (acc.hasOpen && t - acc.openLastUs <= gapUs) {
            acc = acc.copy(
              openStartUs = math.min(acc.openStartUs, t),
              openLastUs = math.max(acc.openLastUs, t),
              openN = acc.openN + 1,
              openMinEid = math.min(acc.openMinEid, e.event_id),
              openMaxEid = math.max(acc.openMaxEid, e.event_id))
          } else {
            if (acc.hasOpen) out += close(user, acc)
            acc = SessAcc(t, t, 1L, e.event_id, e.event_id,
              acc.idx + 1, hasOpen = true)
          }
        }
        state.update(acc)
        if (acc.hasOpen)
          state.setTimeoutTimestamp(acc.openLastUs / 1000L +
            gapSeconds * 1000L + 1L)
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessAcc, SessOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}

package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One raw event entering streaming sessionization. */
case class SessEvent(user_id: Long, ts: Timestamp, event_id: Long)

/** A closed session. Sessions are identified by (user_id, start_us) —
  * the session's first event time — NOT a per-key ordinal: an ordinal
  * would force the operator to keep one counter per key forever, making
  * state O(all keys ever seen). With the start as identity, a key's
  * state is REMOVED once its open session times out, so state really is
  * O(keys with an open session) and the watermark bounds it.
  */
case class SessOut(
    user_id: Long, start_us: Long, n: Long,
    min_eid: Long, max_eid: Long, dur_us: Long)

/** Per-key state: the currently open session. */
case class SessAcc(
    openStartUs: Long, openLastUs: Long, openN: Long,
    openMinEid: Long, openMaxEid: Long)

/** Streaming gap sessionization — the stateful-streaming twin of
  * `graft.ops.Relational.sessionize`. Events are grouped by user;
  * `flatMapGroupsWithState` keeps one open session per key and emits a
  * session exactly when the event-time watermark passes its last event
  * plus the gap (EventTimeTimeout), so output is append-only and each
  * closed session matches the batch operator's aggregate for the same
  * prefix of the stream.
  *
  * At scale this is the canonical Structured Streaming shape: state is
  * O(keys with an open session) — a timed-out key's state is removed,
  * not parked — one shuffle on the key per microbatch, and the
  * watermark bounds state retention.
  */
object Sessionization {

  /** Microseconds since epoch; floorDiv keeps pre-1970 timestamps exact
    * (getTime/1000 would truncate toward zero while getNanos stays
    * positive, shifting such events a second late).
    */
  private def us(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def sessions(
      events: Dataset[SessEvent],
      gapSeconds: Long,
      watermarkDelay: String): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L

    def close(user: Long, a: SessAcc): SessOut =
      SessOut(user, a.openStartUs, a.openN, a.openMinEid, a.openMaxEid,
        a.openLastUs - a.openStartUs)

    def fn(user: Long, batch: Iterator[SessEvent],
        state: GroupState[SessAcc]): Iterator[SessOut] = {
      val out = ListBuffer.empty[SessOut]
      if (state.hasTimedOut) {
        // watermark passed openLast + gap: close and REAP — a key with
        // no open session holds no state at all
        state.getOption.foreach(a => out += close(user, a))
        state.remove()
      } else {
        var acc = state.getOption.orNull
        // within a microbatch arrival order is arbitrary: establish the
        // same (ts, event_id) order the batch operator uses
        val evs = batch.toIndexedSeq.sortBy(e => (us(e.ts), e.event_id))
        for (e <- evs) {
          val t = us(e.ts)
          if (acc != null && t - acc.openLastUs <= gapUs) {
            acc = acc.copy(
              openStartUs = math.min(acc.openStartUs, t),
              openLastUs = math.max(acc.openLastUs, t),
              openN = acc.openN + 1,
              openMinEid = math.min(acc.openMinEid, e.event_id),
              openMaxEid = math.max(acc.openMaxEid, e.event_id))
          } else {
            if (acc != null) out += close(user, acc)
            acc = SessAcc(t, t, 1L, e.event_id, e.event_id)
          }
        }
        if (acc != null) {
          state.update(acc)
          state.setTimeoutTimestamp(acc.openLastUs / 1000L +
            gapSeconds * 1000L + 1L)
        }
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

package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.Relational

/** Streaming gap sessionization (flatMapGroupsWithState +
  * EventTimeTimeout) must emit exactly the sessions the batch operator
  * computes, as each closes: by a new out-of-gap event arriving, or by
  * the watermark passing last-event + gap. Sessions are identified by
  * (user, start time) so a timed-out key's state is reaped entirely.
  */
class SessionizationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def usOf(s: String): Long = ts(s).getTime * 1000L

  test("streaming sessions match the batch operator as they close") {
    val ckpt = TestSpark.tmpDir("sess-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessEvent]
    val out = ArrayBuffer.empty[SessOut]

    def drain(): Unit = {
      val q = Sessionization.sessions(mem.toDS(), 3600L, "0 seconds")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[SessOut],
            _: Long) =>
          out.synchronized { out ++= df.collect() }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // batch 1: u1 opens a 2-event session, u2 a 1-event session
    mem.addData(
      SessEvent(1L, ts("2024-01-01 10:00:00"), 1L),
      SessEvent(1L, ts("2024-01-01 10:30:00"), 2L),
      SessEvent(2L, ts("2024-01-01 10:00:00"), 3L))
    drain()
    assert(out.isEmpty, s"nothing closed yet: $out")

    // batch 2: out-of-gap arrivals close both open sessions immediately;
    // the AvailableNow drain then runs a timeout batch against the
    // advanced watermark (20:00), which also closes u1's new session
    // (last 13:00, deadline 14:00). u2's (deadline 21:00) stays open.
    mem.addData(
      SessEvent(1L, ts("2024-01-01 13:00:00"), 4L),
      SessEvent(2L, ts("2024-01-01 20:00:00"), 5L))
    drain()
    assert(out.map(o => (o.user_id, o.start_us)).toSet == Set(
      (1L, usOf("2024-01-01 10:00:00")),
      (2L, usOf("2024-01-01 10:00:00")),
      (1L, usOf("2024-01-01 13:00:00"))), s"got $out")

    // batch 3: sentinel pushes the watermark months ahead — u2's open
    // session times out
    mem.addData(SessEvent(99L, ts("2024-06-01 00:00:00"), 6L))
    drain()
    assert(out.map(o => (o.user_id, o.start_us)).toSet == Set(
      (1L, usOf("2024-01-01 10:00:00")),
      (2L, usOf("2024-01-01 10:00:00")),
      (1L, usOf("2024-01-01 13:00:00")),
      (2L, usOf("2024-01-01 20:00:00"))), s"got $out")

    // batch 4: the sentinel's own session closes by arrival gap; no
    // duplicates may appear for users 1/2
    mem.addData(SessEvent(99L, ts("2024-06-02 00:00:00"), 7L))
    drain()

    val streamed = out.filter(_.user_id != 99L)
      .map(o => (o.user_id, o.start_us, o.n, o.min_eid, o.max_eid,
        o.dur_us)).toSet

    // ground truth: the batch operator over the same (non-sentinel) rows
    val batchDf = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L),
      (2L, ts("2024-01-01 10:00:00"), 3L),
      (1L, ts("2024-01-01 13:00:00"), 4L),
      (2L, ts("2024-01-01 20:00:00"), 5L)
    ).toDF("user_id", "ts", "event_id")
    val expected = Relational.sessionize(batchDf, "user_id", "ts",
        "event_id", 3600L)
      .groupBy($"user_id", $"session_idx")
      .agg(count(lit(1)).as("n"), min($"event_id").as("min_eid"),
        max($"event_id").as("max_eid"),
        unix_micros(min($"ts")).as("start_us"),
        (unix_micros(max($"ts")) - unix_micros(min($"ts"))).as("dur_us"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("start_us"),
        r.getAs[Long]("n"), r.getAs[Long]("min_eid"),
        r.getAs[Long]("max_eid"), r.getAs[Long]("dur_us"))).toSet

    assert(streamed == expected,
      s"streaming $streamed != batch $expected")
  }
}

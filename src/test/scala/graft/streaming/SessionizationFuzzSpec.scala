package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.Relational

/** Randomized streaming-vs-batch sessionization equivalence: random
  * event streams split into time-ordered microbatches (so no event is
  * watermark-late), flushed by a far-future sentinel, must close
  * exactly the sessions the batch operator computes — any state-machine
  * slip (gap boundary, batch-split straddling a session, timeout
  * ordering) breaks the set equality.
  */
class SessionizationFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val SEEDS = 5
  private val GAP_S = 1800L

  test("random streams: closed sessions equal the batch operator") {
    for (seed <- 1 to SEEDS) {
      val rng = new Random(100 + seed)
      val n = rng.nextInt(40) + 10
      val events = (1 to n).map { i =>
        val user = rng.nextInt(3) + 1L
        // gaps cluster around the threshold so both branches fire; the
        // +i ms keeps timestamps unique — a same-ts tie split across a
        // batch cut is a genuinely LATE event under watermark delay 0
        // (the streaming side correctly opens a new session where the
        // batch side merges), which is watermark semantics, not a bug
        // this test should fail on
        val t = new Timestamp(1700000000000L +
          rng.nextInt(96) * (GAP_S * 1000L / 2) + i)
        SessEvent(user, t, i.toLong)
      }
      // order by time and split into 3 contiguous batches: batch
      // boundaries never deliver a watermark-late event
      val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
      val cut1 = sorted.size / 3
      val cut2 = 2 * sorted.size / 3
      val batches = Seq(sorted.slice(0, cut1), sorted.slice(cut1, cut2),
        sorted.drop(cut2)).filter(_.nonEmpty) :+
        Seq(SessEvent(99L, new Timestamp(1900000000000L), 10000L))

      val ckpt = TestSpark.tmpDir(s"sessfuzz-$seed")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[SessEvent]
      val out = ArrayBuffer.empty[SessOut]
      batches.foreach { b =>
        mem.addData(b: _*)
        val q = Sessionization.sessions(mem.toDS(), GAP_S, "0 seconds")
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

      val streamed = out.filter(_.user_id != 99L)
        .map(o => (o.user_id, o.start_us, o.n, o.min_eid, o.max_eid,
          o.dur_us)).toSet
      val expected = Relational.sessionize(
          events.toDF("user_id", "ts", "event_id"),
          "user_id", "ts", "event_id", GAP_S)
        .groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n"), min($"event_id").as("min_eid"),
          max($"event_id").as("max_eid"),
          unix_micros(min($"ts")).as("start_us"),
          (unix_micros(max($"ts")) - unix_micros(min($"ts")))
            .as("dur_us"))
        .collect()
        .map(r => (r.getLong(0), r.getAs[Long]("start_us"),
          r.getAs[Long]("n"), r.getAs[Long]("min_eid"),
          r.getAs[Long]("max_eid"), r.getAs[Long]("dur_us"))).toSet
      assert(streamed == expected,
        s"seed=$seed\n streaming=$streamed\n batch=$expected")
    }
  }
}

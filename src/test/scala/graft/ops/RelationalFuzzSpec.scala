package graft.ops

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized equivalence: the composed (shuffle-bounded) temporal
  * operators must match naive nested-loop reference semantics computed
  * on the driver, across many random datasets — keys with no matches,
  * equal timestamps, bucket-boundary values, empty sides.
  */
class RelationalFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val SEEDS = 30

  private def randomData(rng: Random, nLeft: Int, nRight: Int)
      : (Seq[(Long, String, Timestamp)], Seq[(String, Timestamp, Long)]) = {
    // timestamps on a coarse grid so equal-ts collisions actually happen;
    // second-level offsets exercise bucket boundaries
    def ts(): Timestamp = new Timestamp(
      1700000000000L + rng.nextInt(48) * 1800000L + rng.nextInt(3) * 1000L)
    def key(): String = s"k${rng.nextInt(4)}"
    val l = (1 to nLeft).map(i => (i.toLong, key(), ts()))
    val r = (1 to nRight).map(i => (key(), ts(), 1000L + i))
    (l, r)
  }

  test("asofJoin matches naive per-row argmax over many random datasets") {
    for (seed <- 1 to SEEDS) {
      val rng = new Random(seed)
      val (l, r) = randomData(rng, rng.nextInt(30) + 1, rng.nextInt(30))
      // contract: one right row per (key, ts)
      val rDedup = r.groupBy(x => (x._1, x._2.getTime))
        .map(_._2.maxBy(_._3)).toSeq
      val got = Relational.asofJoin(
          l.toDF("id", "k", "t"), rDedup.toDF("rk", "rt", "rid"),
          "k", "rk", "t", "rt", Seq("rid"))
        .select($"id", $"rid").collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      val want = l.map { case (id, k, t) =>
        val cands = rDedup.filter(x => x._1 == k && !x._2.after(t))
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(_._2.getTime)._3))
      }.toMap
      assert(got == want, s"seed=$seed\n l=$l\n r=$rDedup")
    }
  }

  test("rangeJoin matches naive interval filter over many random datasets") {
    for (seed <- 1 to SEEDS) {
      val rng = new Random(seed)
      val (l, r) = randomData(rng, rng.nextInt(25) + 1, rng.nextInt(25))
      // random window, including negative-lo lookback shapes
      val lo = (rng.nextInt(5) - 3) * 1800L
      val hi = lo + (rng.nextInt(3) + 1) * 1800L
      val got = Relational.rangeJoin(
          l.toDF("id", "k", "t"), r.toDF("rk", "rt", "rid"),
          "k", "rk", "t", "rt", lo, hi, Seq("rid"))
        .select($"id", $"rid").collect()
        .map(row => (row.getLong(0), row.getLong(1))).sorted.toSeq
      val want = (for {
        (id, k, t) <- l
        (rk, rt, rid) <- r
        if rk == k
        dUs = (rt.getTime - t.getTime) * 1000L
        if dUs >= lo * 1000000L && dUs < hi * 1000000L
      } yield (id, rid)).sorted
      assert(got == want, s"seed=$seed lo=$lo hi=$hi\n l=$l\n r=$r")
    }
  }

  test("sessionize matches a naive driver fold over many random datasets") {
    for (seed <- 1 to SEEDS) {
      val rng = new Random(seed)
      val (l, _) = randomData(rng, rng.nextInt(40) + 1, 0)
      val gap = (rng.nextInt(4) + 1) * 900L
      val got = Relational.sessionize(
          l.toDF("id", "k", "t"), "k", "t", "id", gap)
        .select($"id", $"session_idx").collect()
        .map(row => (row.getLong(0), row.getLong(1))).toMap
      val want = l.groupBy(_._2).flatMap { case (_, rows) =>
        val sorted = rows.sortBy(x => (x._3.getTime, x._1))
        var idx = 0L
        var lastUs = Long.MinValue
        sorted.map { case (id, _, t) =>
          val us = t.getTime * 1000L
          if (lastUs == Long.MinValue || us - lastUs > gap * 1000000L)
            idx += 1
          lastUs = us
          id -> idx
        }
      }
      assert(got == want, s"seed=$seed gap=$gap\n l=$l")
    }
  }
}

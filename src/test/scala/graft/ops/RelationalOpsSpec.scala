package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RelationalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // left: (id, key, ts); right: (key, ts, tag, amt)
  private def left = Seq(
    (1L, "a", ts("2024-01-01 10:00:00")),
    (2L, "a", ts("2024-01-01 12:00:00")),
    (3L, "a", ts("2024-01-01 09:00:00")),
    (4L, "b", ts("2024-01-01 10:00:00")),
    (5L, "c", ts("2024-01-01 10:00:00"))
  ).toDF("id", "k", "t")

  private def right = Seq(
    ("a", ts("2024-01-01 09:30:00"), "r1", 10.0),
    ("a", ts("2024-01-01 12:00:00"), "r2", 20.0),
    ("b", ts("2024-01-01 10:00:00"), "r3", 30.0),
    ("b", ts("2024-01-01 11:00:00"), "r4", 40.0)
  ).toDF("rk", "rt", "tag", "amt")

  test("asofJoin: most recent right row at or before left ts; null when none") {
    val out = Relational.asofJoin(left, right, "k", "rk", "t", "rt",
        Seq("tag", "amt"))
      .orderBy($"id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[String]("tag"))))
    assert(out.toSeq == Seq(
      (1L, Some("r1")),   // 10:00 -> 09:30 match
      (2L, Some("r2")),   // equal ts is inclusive
      (3L, None),         // 09:00 predates all right rows
      (4L, Some("r3")),   // equal ts inclusive on key b
      (5L, None)))        // key with no right rows at all
  }

  test("asofJoin: payload columns come from one right row atomically") {
    // r5 has a NULL amt; a per-column last(ignoreNulls) would leak r4's amt
    // under r5's tag. The struct carry must keep (tag, amt) paired.
    val r2 = right.unionByName(Seq(
      ("b", ts("2024-01-01 09:00:00"), "r5", Option.empty[Double]))
      .toDF("rk", "rt", "tag", "amt"))
    val out = Relational.asofJoin(
        Seq((9L, "b", ts("2024-01-01 09:30:00"))).toDF("id", "k", "t"),
        r2, "k", "rk", "t", "rt", Seq("tag", "amt"))
      .collect().head
    assert(out.getAs[String]("tag") == "r5")
    assert(out.isNullAt(out.fieldIndex("amt")))
  }

  test("asofJoin plan: one shuffle shape, no nested-loop or cartesian join") {
    val plan = Relational.asofJoin(left, right, "k", "rk", "t", "rt",
      Seq("tag", "amt")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // composed as union + window, not a join at all
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      plan.take(800))
  }

  test("rangeJoin: half-open interval, bucket-boundary crossing") {
    // window [t-3600s, t): match at exactly t-3600 included, at t excluded
    val l = Seq((1L, "a", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val r = Seq(
      ("a", ts("2024-01-01 09:00:00"), 100L), // == t-3600 -> in
      ("a", ts("2024-01-01 09:59:59"), 101L), // in
      ("a", ts("2024-01-01 10:00:00"), 102L), // == t -> out (half-open)
      ("a", ts("2024-01-01 08:59:59"), 103L), // out (before lo)
      ("b", ts("2024-01-01 09:30:00"), 104L)  // wrong key
    ).toDF("rk", "rt", "rid")
    val got = Relational.rangeJoin(l, r, "k", "rk", "t", "rt",
        -3600L, 0L, Seq("rid"))
      .select($"rid").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(100L, 101L))
  }

  test("rangeJoin: forward-looking window and no duplicate pairs") {
    // [t, t+7200): right rows live in two different buckets of width 7200
    val l = Seq((1L, "a", ts("2024-01-01 00:30:00"))).toDF("id", "k", "t")
    val r = Seq(
      ("a", ts("2024-01-01 00:30:00"), 1L),  // == t -> in (lo inclusive)
      ("a", ts("2024-01-01 01:59:00"), 2L),  // bucket 0
      ("a", ts("2024-01-01 02:15:00"), 3L),  // bucket 1, still < t+2h
      ("a", ts("2024-01-01 02:30:00"), 4L)   // == t+2h -> out
    ).toDF("rk", "rt", "rid")
    val got = Relational.rangeJoin(l, r, "k", "rk", "t", "rt",
        0L, 7200L, Seq("rid"))
      .select($"rid").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("rangeJoin plan: hash equi-join, no nested-loop or cartesian") {
    val plan = Relational.rangeJoin(left, right, "k", "rk", "t", "rt",
      -3600L, 0L, Seq("tag")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("skewSafeJoin equals the plain inner join and spreads hot keys") {
    val l = (1 to 500).map(i =>
      (i.toLong, if (i <= 450) "hot" else s"k${i % 7}")).toDF("id", "k")
    val r = Seq(("hot", 10L), ("k1", 20L), ("k3", 30L), ("cold", 40L))
      .toDF("rk", "payload")
    val got = Relational.skewSafeJoin(l, r, "k", "rk", "id", 8)
      .select($"id", $"payload").collect()
      .map(row => (row.getLong(0), row.getLong(1))).sorted.toSeq
    val want = l.join(r, l("k") === r("rk"))
      .select($"id", $"payload").collect()
      .map(row => (row.getLong(0), row.getLong(1))).sorted.toSeq
    assert(got == want && got.nonEmpty)
    // determinism: same salting on a re-run (hash of id, never rand())
    val again = Relational.skewSafeJoin(l, r, "k", "rk", "id", 8)
      .select($"id", $"payload").collect()
      .map(row => (row.getLong(0), row.getLong(1))).sorted.toSeq
    assert(again == got)
  }

  test("sessionize: strict-gap boundary, per-key 1-based indexes") {
    val df = Seq(
      (1L, "u", ts("2024-01-01 00:00:00")),
      (2L, "u", ts("2024-01-01 01:00:00")),  // gap == 3600 -> same session
      (3L, "u", ts("2024-01-01 02:00:01")),  // gap 3601 > 3600 -> new
      (4L, "v", ts("2024-01-01 00:00:00"))   // other key restarts at 1
    ).toDF("id", "u", "t")
    val out = Relational.sessionize(df, "u", "t", "id", 3600L)
      .select($"id", $"session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }
}

package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Public commit-range iteration (reference kernel/src/commit_range/). */
class CommitRangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def build(): (String, DeltaTable) = {
    val dir = TestSpark.tmpDir("crange")
    val src = (1 to 30).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" <= 10).repartition(1))  // v1
    t.append(src.filter($"k" > 10 && $"k" <= 20).repartition(1)) // v2
    t.deleteWhere("k = 5")                            // v3: remove+add
    (dir, t)
  }

  test("ascending iteration exposes per-commit action counts") {
    val (dir, _) = build()
    val range = CommitRange.forTable(spark, dir, 0, Some(3))
    assert(range.startVersion == 0 && range.endVersion == 3)
    val commits = range.commits(Seq("add", "remove")).toSeq
    assert(commits.map(_.version) == Seq(0L, 1L, 2L, 3L))
    val counts = commits.map(c => (
      c.actions.filter(col("add").isNotNull).count(),
      c.actions.filter(col("remove").isNotNull).count()))
    assert(counts(0) == ((0L, 0L))) // CREATE: metadata only
    assert(counts(1) == ((1L, 0L)))
    assert(counts(2) == ((1L, 0L)))
    assert(counts(3)._1 == 1L && counts(3)._2 == 1L) // rewrite delete
    // timestamps are non-decreasing in ascending order
    assert(commits.map(_.timestamp).sliding(2).forall {
      case Seq(a, b) => a <= b
      case _ => true
    })
  }

  test("descending order, default end = latest, action-kind validation") {
    val (dir, _) = build()
    val range = CommitRange.forTable(spark, dir, 1)
    assert(range.endVersion == 3)
    assert(range.commits(descending = true).map(_.version).toSeq ==
      Seq(3L, 2L, 1L))
    intercept[IllegalArgumentException] {
      range.commits(Seq("nonsense")).toSeq
    }
  }

  test("protocol/metadata seeding from an adjoining snapshot") {
    val (dir, t) = build()
    t.setProperties(Map("custom.tag" -> "x")) // v4: metaData change
    val seed = t.snapshot(Some(1L))
    val range = CommitRange.forTable(spark, dir, 2, Some(4))
    val (p, m) = range.protocolAndMetadata(Some(seed))
    assert(p.isDefined)
    assert(m.get.configuration.get("custom.tag").contains("x"))
    // non-adjoining seed rejected
    intercept[IllegalArgumentException] {
      CommitRange.forTable(spark, dir, 4, Some(4))
        .protocolAndMetadata(Some(t.snapshot(Some(0L))))
    }
  }

  test("fromSnapshot reuses the segment; missing commits fail loudly") {
    val (dir, t) = build()
    val snap = t.snapshot()
    val range = CommitRange.fromSnapshot(snap, 1)
    assert(range.commits().map(_.version).toSeq == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      CommitRange.forTable(spark, dir, 7, Some(9))
    }
  }
}

package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.Dedup

/** Streaming exact-dedup against persisted Delta hash state: a
  * foreachBatch pipeline over incrementalNewIdempotent must (a) produce
  * exactly the batch-mode dedup survivors across the whole stream and
  * (b) return the SAME survivor set when a batch replays — the
  * crash-recovery path where naive state re-filtering would silently
  * drop every survivor of the replayed batch.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch incremental dedup: exactly-once across replays") {
    val state = TestSpark.tmpDir("sdedup-state")
    val ckpt = TestSpark.tmpDir("sdedup-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val survivors = ArrayBuffer.empty[(Long, String)]
    var lastBatch = -1L

    def drain(): Unit = {
      val q = mem.toDF().toDF("doc_id", "text")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val out = Dedup.incrementalNewIdempotent(spark, state, df,
            "doc_id", "text", appId = "sdedup-test", batchVersion = id)
          survivors.synchronized {
            survivors ++= out.select($"doc_id", $"text").collect()
              .map(r => (r.getLong(0), r.getString(1)))
            lastBatch = math.max(lastBatch, id)
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // batch 1: in-batch dupe (2 drops, 1 kept by min id)
    mem.addData((1L, "alpha"), (2L, "alpha"), (3L, "beta"))
    drain()
    // batch 2: cross-batch dupe (beta drops), new survivor gamma
    mem.addData((4L, "beta"), (5L, "gamma"), (6L, "gamma"))
    drain()

    assert(survivors.toSet == Set((1L, "alpha"), (3L, "beta"),
      (5L, "gamma")), s"got $survivors")

    // equivalence with batch-mode dedup over the whole stream
    val all = Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta"),
      (4L, "beta"), (5L, "gamma"), (6L, "gamma")).toDF("doc_id", "text")
    val batchDedup = all
      .groupBy($"text").agg(min($"doc_id").as("doc_id"))
      .select($"doc_id").as[Long].collect().toSet
    assert(survivors.map(_._1).toSet == batchDedup)

    // replay the LAST batch (same appId + version): the survivor set
    // must be identical, not empty — its own hashes are now in state
    val replay = Dedup.incrementalNewIdempotent(spark, state,
        Seq((4L, "beta"), (5L, "gamma"), (6L, "gamma"))
          .toDF("doc_id", "text"),
        "doc_id", "text", appId = "sdedup-test", batchVersion = lastBatch)
      .select($"doc_id").as[Long].collect().toSet
    assert(replay == Set(5L), s"replayed survivors: $replay")

    // and the state table registered each hash exactly once
    val stateRows = graft.delta.DeltaTable.forPath(spark, state).toDF
    assert(stateRows.count() == 3)
    assert(stateRows.select($"h").distinct().count() == 3)
  }

  test("foreachBatch incremental FUZZY dedup: banded state + txn replay") {
    val state = TestSpark.tmpDir("sfuzzy-state")
    val ckpt = TestSpark.tmpDir("sfuzzy-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, Long, Long)]
    val admitted = ArrayBuffer.empty[Long]
    var lastBatch = -1L
    val sigCols = Seq("mh0", "mh1", "mh2", "mh3")

    def drain(): Unit = {
      val q = mem.toDF().toDF("doc_id", "mh0", "mh1", "mh2", "mh3")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val out = Dedup.incrementalFuzzyNew(spark, state, df, "doc_id",
            sigCols, rowsPerBand = 2, threshold = 0.5,
            txn = Some(("sfuzzy-test", id)))
          admitted.synchronized {
            admitted ++= out.select($"doc_id").as[Long].collect()
            lastBatch = math.max(lastBatch, id)
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // batch 1: 1 and 2 identical (group folds to 1), 3 disjoint
    mem.addData((1L, 10L, 11L, 12L, 13L), (2L, 10L, 11L, 12L, 13L),
      (4L, 50L, 51L, 52L, 53L))
    drain()
    // batch 2: 5 near-dups admitted 1 (band collision, sim 1.0) ->
    // rejected; 6 fresh
    mem.addData((5L, 10L, 11L, 12L, 13L), (6L, 70L, 71L, 72L, 73L))
    drain()
    assert(admitted.sorted == Seq(1L, 4L, 6L), s"admitted=$admitted")

    // replay the last batch after its state append: the txn marker
    // returns exactly the original admissions (a naive re-run would
    // self-reject 6 against its own state rows)
    val replay = Dedup.incrementalFuzzyNew(spark, state,
        Seq((5L, 10L, 11L, 12L, 13L), (6L, 70L, 71L, 72L, 73L))
          .toDF("doc_id", "mh0", "mh1", "mh2", "mh3"),
        "doc_id", sigCols, rowsPerBand = 2, threshold = 0.5,
        txn = Some(("sfuzzy-test", lastBatch)))
      .select($"doc_id").as[Long].collect().toSet
    assert(replay == Set(6L), s"replayed admissions: $replay")
  }
}

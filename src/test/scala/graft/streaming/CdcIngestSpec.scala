package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.delta.{ContentTree, DeltaTable, EqualityDeletes}

/** CDC ingest with merge-on-read deletes: upserts append, every batch
  * key writes an O(root) equality delete at the append's sequence —
  * the new row version wins within the batch, older versions die,
  * nothing rewrites. A foreachBatch replay must not change the state
  * (txn-marker append + read-time max-sequence key collapse), and the
  * out-of-band conversion to position deletes must not either.
  */
class CdcIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("k", StringType),
    StructField("v", IntegerType)))

  test("streamed upsert/delete batches: replace semantics, replay " +
      "idempotence, conversion invariance") {
    val dir = TestSpark.tmpDir("cdc")
    val ckpt = TestSpark.tmpDir("cdc-ckpt")
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    @volatile var root = ContentTree.writeRoot(t.snapshot(), 2)
    @volatile var lastBatch = -1L

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, String, Int)]

    def drain(): Unit = {
      val q = mem.toDF().toDF("_op", "id", "k", "v")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          root = CdcIngest.processBatch(t, root, df, Seq(0),
            appId = "cdc-test", batchId = id)
          lastBatch = math.max(lastBatch, id)
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    def state(): Map[Long, (String, Int)] =
      CdcIngest.currentState(t, root).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap

    mem.addData(("upsert", 1L, "a", 1), ("upsert", 2L, "b", 2),
      ("upsert", 3L, "c", 3))
    drain()
    assert(state() == Map(1L -> ("a", 1), 2L -> ("b", 2),
      3L -> ("c", 3)))

    // replace + delete in one batch; delete of a nonexistent key no-ops
    mem.addData(("upsert", 1L, "a", 10), ("delete", 2L, "", 0),
      ("delete", 99L, "", 0))
    drain()
    assert(state() == Map(1L -> ("a", 10), 3L -> ("c", 3)))

    // resurrect a deleted key in a later batch
    mem.addData(("upsert", 2L, "b", 20))
    drain()
    val s3 = state()
    assert(s3 == Map(1L -> ("a", 10), 2L -> ("b", 20), 3L -> ("c", 3)))

    // foreachBatch replay of the LAST batch: the txn marker no-ops the
    // append (no new table version), the duplicate delete entries
    // collapse at read time
    val vBefore = t.snapshot().version
    val replayDf = Seq(("upsert", 2L, "b", 20)).toDF("_op", "id", "k", "v")
    root = CdcIngest.processBatch(t, root, replayDf, Seq(0),
      appId = "cdc-test", batchId = lastBatch)
    assert(state() == s3, "replay must not change the state")
    assert(t.snapshot().version == vBefore,
      "replayed append must no-op on the txn marker")

    // out-of-band maintenance: fold the accumulated equality deletes
    // into position-delete DVs; state unchanged, loose entries gone
    val snap = t.snapshot()
    root = EqualityDeletes.convertToPositionDeletes(snap,
      root.resolve(snap.tableRoot.toString), 2)
    assert(state() == s3, "conversion must not change the state")
    assert(ContentTree.readEntriesDF(spark,
      root.resolve(snap.tableRoot.toString), snap.tableRoot.toString)
      .filter(col("contentType") ===
        ContentTree.DataContentType.EqualityDeletes).count() == 0)

    // and ingest keeps working on the converted tree
    mem.addData(("delete", 1L, "", 0))
    drain()
    assert(state() == Map(2L -> ("b", 20), 3L -> ("c", 3)))

    // PURE-DELETE batch targeting the key the IMMEDIATELY preceding
    // batch appended: the delete must be stamped at the sequence the
    // batch's appends would land at (version + 1) — stamping the
    // stale pre-append version would spare the newest rows under the
    // strict < rule and silently miss this delete
    mem.addData(("upsert", 4L, "d", 4))
    drain()
    assert(state() == Map(2L -> ("b", 20), 3L -> ("c", 3),
      4L -> ("d", 4)))
    mem.addData(("delete", 4L, "", 0))
    drain()
    assert(state() == Map(2L -> ("b", 20), 3L -> ("c", 3)),
      "a pure-delete batch must reach the previous batch's rows")
  }

  test("crash replay with a STALE root re-derives the batch's tree-" +
      "only deletes at the original sequence; loose rows fold past " +
      "the threshold and carry content_stats until then") {
    val dir = TestSpark.tmpDir("cdc-stale")
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    val root0 = ContentTree.writeRoot(t.snapshot(), 2)
    def state(r: graft.delta.AdaptiveMetadata.ContentRoot) =
      CdcIngest.currentState(t, r).collect()
        .map(x => x.getLong(0) -> (x.getString(1), x.getInt(2))).toMap
    val b0 = Seq(("upsert", 1L, "a", 1), ("upsert", 2L, "b", 2),
      ("upsert", 3L, "c", 3)).toDF("_op", "id", "k", "v")
    val root1 = CdcIngest.processBatch(t, root0, b0, Seq(0),
      appId = "cdc-stale", batchId = 0L)
    // loose data rows carry content_stats (appendCommitLoose keeps
    // the struct, so tree-side pruning works before any fold)
    val rootDf = spark.read.parquet(
      root1.resolve(t.snapshot().tableRoot.toString))
    val looseData = rootDf.filter(col("contentType") ===
      ContentTree.DataContentType.Data)
    assert(looseData.count() >= 1)
    assert(looseData.filter(
      col(s"${ContentTree.CONTENT_STATS}.id.lower_bound").isNotNull)
      .count() == looseData.count(),
      "loose data rows must keep their content_stats")

    // mixed batch: delete id=2, upsert id=4 — then CRASH before the
    // caller persists the returned root
    val b1 = Seq(("delete", 2L, "", 0), ("upsert", 4L, "d", 4))
      .toDF("_op", "id", "k", "v")
    CdcIngest.processBatch(t, root1, b1, Seq(0),
      appId = "cdc-stale", batchId = 1L) // completed root is LOST
    // replay with the STALE pre-batch root: the marker gates the log
    // arms, but the delete arm lives only in the tree and must
    // re-derive — id=2 must stay dead and id=4 visible
    val recovered = CdcIngest.processBatch(t, root1, b1, Seq(0),
      appId = "cdc-stale", batchId = 1L)
    assert(state(recovered) == Map(1L -> ("a", 1), 3L -> ("c", 3),
      4L -> ("d", 4)),
      "replay with a stale root must re-derive the batch's deletes")

    // fold: threshold 0 folds every loose row into fresh leaves,
    // existing leaves carried by reference; the state is unchanged
    val folded = ContentTree.foldLooseEntries(t.snapshot(), recovered, 0)
    val foldedRoot = spark.read.parquet(
      folded.resolve(t.snapshot().tableRoot.toString))
    assert(foldedRoot.filter(col("contentType") =!=
      ContentTree.DataContentType.DataManifest &&
      col("contentType") =!=
        ContentTree.DataContentType.DeleteManifest).count() == 0,
      "fold must leave a pure manifest root")
    assert(state(folded) == Map(1L -> ("a", 1), 3L -> ("c", 3),
      4L -> ("d", 4)), "fold must not change the state")
  }
  test("foreign append racing the batch's commit window: deletes " +
      "stamp the LANDED sequence — the race never under-deletes") {
    val dir = TestSpark.tmpDir("cdc-race")
    DeltaTable.create(spark, dir, schema)
    val t = DeltaTable.forPath(spark, dir)
    var root = ContentTree.writeRoot(t.snapshot(), 2)
    def state() = CdcIngest.currentState(t, root).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val b0 = Seq(("upsert", 1L, "a", 1), ("upsert", 2L, "b", 2))
      .toDF("_op", "id", "k", "v")
    root = CdcIngest.processBatch(t, root, b0, Seq(0),
      appId = "cdc-race", batchId = 0L)
    assert(state() == Map(1L -> ("a", 1), 2L -> ("b", 2)))

    // batch 1 upserts key 1; a FOREIGN writer commits its own version
    // of key 1 (plus a fresh key 9) between the batch's snapshot and
    // its append — the append retries past the conflict and lands two
    // versions later. The batch's delete must reach the foreign key-1
    // row (it predates the landed sequence); a delete stamped from the
    // stale snapshot would spare it and leave TWO rows for the key.
    val b1 = Seq(("upsert", 1L, "a", 100)).toDF("_op", "id", "k", "v")
    val foreign = Seq((1L, "z", 50), (9L, "z", 9)).toDF("id", "k", "v")
    root = CdcIngest.processBatch(t, root, b1, Seq(0),
      appId = "cdc-race", batchId = 1L, foldThreshold = 4096,
      beforeAppend = () => {
        DeltaTable.forPath(spark, dir).append(foreign); ()
      })
    assert(state() == Map(1L -> ("a", 100), 2L -> ("b", 2),
      9L -> ("z", 9)),
      "batch upsert must win over the raced foreign row; unrelated " +
        "foreign rows survive")
  }
}

package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.delta.{DeltaTable, IncrementalScan}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("incremental scan: file diff over (base, target]") {
    val dir = TestSpark.tmpDir("incr")
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" === 1))       // v1
    t.append(src.filter($"k" === 2))       // v2
    t.deleteWhere("k = 1")                 // v3: remove v1's file
    val diff = IncrementalScan.fileDiff(spark, dir, 1, 3).collect()
    // net effect vs v1: one add (v2 file) and one remove (v1 file)
    assert(diff.count(_.getAs[String]("action") == "add") == 1)
    assert(diff.count(_.getAs[String]("action") == "remove") == 1)
    // over (0, 2]: two adds, no removes
    val diff2 = IncrementalScan.fileDiff(spark, dir, 0, 2).collect()
    assert(diff2.forall(_.getAs[String]("action") == "add"))
    assert(diff2.length == 2)
  }

  test("streaming source: microbatches = per-commit adds") {
    val dir = TestSpark.tmpDir("stream")
    val ckpt = TestSpark.tmpDir("stream-ckpt")
    val src = (1 to 30).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" <= 10))              // v1
    t.append(src.filter($"k" > 10 && $"k" <= 20)) // v2
    t.append(src.filter($"k" > 20))               // v3

    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    def runOnce(rateLimit: Option[Int]): Unit = {
      val reader = spark.readStream
        .format(classOf[DeltaSourceProvider].getName)
        .option("path", dir)
      rateLimit.foreach(m =>
        reader.option("maxVersionsPerTrigger", m.toString))
      val q = reader.load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized { batches += df.count() }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // rate-limited runs: one commit version per microbatch run
    runOnce(Some(1)) // commit 0: metadata only -> 0 rows
    runOnce(Some(1)) // commit 1
    runOnce(Some(1)) // commit 2
    assert(batches.toSeq == Seq(0L, 10L, 10L), s"got $batches")

    // unbounded run drains the rest in one batch
    batches.clear()
    runOnce(None)
    assert(batches.toSeq == Seq(10L), s"got $batches")

    // restart picks up only NEW commits
    t.append(Seq((31L, "v31")).toDF("k", "s")) // v4
    batches.clear()
    runOnce(None)
    assert(batches.toSeq == Seq(1L), s"got $batches")
  }

  test("streaming source: ignoreDeletes covers whole-file deletes only; " +
      "rewrites need ignoreChanges") {
    def run(dir: String, opts: Map[String, String]): Unit = {
      val reader = spark.readStream
        .format(classOf[DeltaSourceProvider].getName)
        .option("path", dir)
      opts.foreach { case (k, v) => reader.option(k, v) }
      val q = reader.load()
        .writeStream
        .option("checkpointLocation", TestSpark.tmpDir("stream-del-ckpt"))
        .format("noop")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    def fails(dir: String, opts: Map[String, String]): Unit = {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        run(dir, opts)
      }
      ()
    }

    // whole-file delete (each key in its own file; no survivors rewritten)
    val dir = TestSpark.tmpDir("stream-del")
    val src = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter($"k" === 1).repartition(1))
    t.append(src.filter($"k" === 2).repartition(1))
    t.deleteWhere("k = 1") // removes v1's file, adds nothing
    fails(dir, Map.empty)
    run(dir, Map("ignoreDeletes" -> "true"))

    // rewrite delete: survivor rows re-staged in the same commit — rows
    // already streamed would re-emit, so ignoreDeletes must NOT pass it
    val dir2 = TestSpark.tmpDir("stream-rw")
    DeltaTable.create(spark, dir2, src.schema)
    val t2 = DeltaTable.forPath(spark, dir2)
    t2.append(src.repartition(1)) // both keys in ONE file
    t2.deleteWhere("k = 1")       // remove + survivor add
    fails(dir2, Map.empty)
    fails(dir2, Map("ignoreDeletes" -> "true"))
    run(dir2, Map("ignoreChanges" -> "true"))
  }

  test("CDF streaming: deletes flow as delete rows") {
    val dir = TestSpark.tmpDir("cdfstream")
    val ckpt = TestSpark.tmpDir("cdfstream-ckpt")
    val src = (1 to 20).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    DeltaTable.create(spark, dir, src.schema,
      configuration = Map(
        graft.delta.TableChanges.CDF_ENABLED_KEY -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)                 // v1: 20 inserts
    t.deleteWhere("k <= 5")       // v2: 5 cdc deletes

    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = spark.readStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .option("readChangeFeed", "true")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized {
          df.groupBy("_change_type").count().collect().foreach(r =>
            rows += ((r.getString(0), r.getLong(1))))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(rows.toMap == Map("insert" -> 20L, "delete" -> 5L), rows)
  }

  test("windowed aggregation with watermark over the delta stream") {
    val dir = TestSpark.tmpDir("winagg")
    val ckpt = TestSpark.tmpDir("winagg-ckpt")
    import java.sql.Timestamp
    val rows = (0 until 60).map { i =>
      (Timestamp.valueOf(f"2026-01-01 10:${i / 6}%02d:${(i % 6) * 10}%02d"),
        s"u${i % 3}", i.toDouble)
    }
    val src = rows.toDF("ts", "user", "value")
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src)

    val agg = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = spark.readStream
      .format(classOf[DeltaSourceProvider].getName)
      .option("path", dir)
      .load()
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        agg.synchronized {
          df.collect().foreach(r =>
            agg += ((r.getAs[String]("user"), r.getAs[Long]("n"))))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // 60 events over 10 minutes -> two 5-minute windows x 3 users,
    // 10 events per (window, user)
    assert(agg.size == 6, agg)
    assert(agg.forall(_._2 == 10), agg)
    assert(agg.map(_._1).distinct.sorted == Seq("u0", "u1", "u2"))
  }
}

package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized log-replay model check: a seeded sequence of appends,
  * file-granular deletes, DV deletes, re-adds and checkpoints must
  * always replay to the same live set a simple in-memory model
  * predicts — first-seen-wins on (path, dvId) newest-first, exactly
  * the FileActionDeduplicator contract.
  */
class LogReplayFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("random op sequences replay to the model's row set") {
    val rnd = new scala.util.Random(1234)
    (0 until 3).foreach { round =>
      val dir = TestSpark.tmpDir(s"fuzz$round")
      val model = scala.collection.mutable.Map.empty[Long, String]
      var nextK = 0L
      val schema = Seq((0L, "x")).toDF("k", "s").schema
      DeltaTable.create(spark, dir, schema)
      val t = DeltaTable.forPath(spark, dir)

      (0 until 12).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 | 1 => // append a fresh batch
            val n = 1 + rnd.nextInt(40)
            val batch = (0 until n).map { _ =>
              nextK += 1
              model(nextK) = s"v$nextK"
              (nextK, s"v$nextK")
            }
            t.append(batch.toDF("k", "s"))
          case 2 => // file-rewrite delete of a random key range
            if (model.nonEmpty) {
              val lo = model.keys.toSeq(rnd.nextInt(model.size))
              val hi = lo + rnd.nextInt(20)
              t.deleteWhere(s"k >= $lo AND k <= $hi")
              (lo to hi).foreach(model.remove)
            }
          case 3 => // DV delete of a random key range
            if (model.nonEmpty) {
              val lo = model.keys.toSeq(rnd.nextInt(model.size))
              val hi = lo + rnd.nextInt(20)
              t.deleteWhereDV(s"k >= $lo AND k <= $hi")
              (lo to hi).foreach(model.remove)
            }
          case 4 => // checkpoint (classic or v2, randomly)
            if (rnd.nextBoolean()) t.checkpoint()
            else t.checkpointV2(numSidecars = rnd.nextInt(3))
        }
        // invariant after EVERY op: replayed rows == model
        val got = t.toDF.select("k", "s").as[(Long, String)]
          .collect().toMap
        assert(got == model.toMap,
          s"round $round diverged: got ${got.size} model ${model.size}")
      }
    }
  }

  test("driver and distributed latestActions agree on the same log") {
    val dir = TestSpark.tmpDir("parity")
    DeltaTable.create(spark, dir, Seq((0L, "x")).toDF("k", "s").schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append((1L to 200L).map(k => (k, s"v$k")).toDF("k", "s"))
    t.append((201L to 400L).map(k => (k, s"v$k")).toDF("k", "s"))
    t.deleteWhere("k >= 100 AND k <= 120")
    t.deleteWhereDV("k >= 300 AND k <= 330")

    def actionsKeyed(): Map[String, (Boolean, Long)] =
      t.snapshot().latestActions
        .select("key", "add", "version").collect()
        .map(r => r.getString(0) -> (!r.isNullAt(1), r.getLong(2)))
        .toMap

    val driver = actionsKeyed()            // small log → driver path
    spark.conf.set("graft.replay.driverMaxBytes", "0")
    try {
      val dist = actionsKeyed()            // forced distributed path
      assert(driver == dist,
        s"paths diverged: driver=${driver.size} dist=${dist.size}")
      assert(driver.nonEmpty && driver.exists(!_._2._1),
        "expected at least one winning tombstone in the parity log")
    } finally spark.conf.unset("graft.replay.driverMaxBytes")
  }
}

package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.delta.DeltaTable
import graft.ops.Relational

/** Streaming temporal enrichment: each fact microbatch as-of joins
  * against the Delta dimension-history table pinned at batch time.
  * Because the join is on the dimension row's validity start (not
  * arrival time), a LATE fact still receives the historically correct
  * dimension value — the lakehouse version of a temporal-table join.
  */
class EnrichmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("facts enrich against dimension history as-of their event time") {
    val dimDir = TestSpark.tmpDir("enrich-dim")
    val ckpt = TestSpark.tmpDir("enrich-ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // dimension history v1: price of "a" is 1.0 from 09:00
    val dim1 = Seq(("a", ts("2024-01-01 09:00:00"), 1.0))
      .toDF("dk", "valid_from", "price")
    DeltaTable.create(spark, dimDir, dim1.schema)
    DeltaTable.forPath(spark, dimDir).append(dim1)

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Timestamp)]
    val out = ArrayBuffer.empty[(Long, Option[Double])]

    def drain(): Unit = {
      val q = mem.toDF().toDF("id", "k", "t")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          // dimension snapshot pinned at batch time
          val dim = DeltaTable.forPath(spark, dimDir).toDF
          val enriched = Relational.asofJoin(df, dim,
            "k", "dk", "t", "valid_from", Seq("price"))
          out.synchronized {
            out ++= enriched.select($"id", $"price").collect().map(r =>
              (r.getLong(0),
                if (r.isNullAt(1)) None else Some(r.getDouble(1))))
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // batch 1: fact at 10:00 sees price 1.0; fact at 08:00 predates
    // all dimension history -> null
    mem.addData((1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "a", ts("2024-01-01 08:00:00")))
    drain()

    // dimension update lands between batches: price 2.0 from 11:00
    DeltaTable.forPath(spark, dimDir).append(
      Seq(("a", ts("2024-01-01 11:00:00"), 2.0))
        .toDF("dk", "valid_from", "price"))

    // batch 2: current fact sees 2.0; a LATE fact at 10:30 still gets
    // the historically correct 1.0
    mem.addData((3L, "a", ts("2024-01-01 12:00:00")),
      (4L, "a", ts("2024-01-01 10:30:00")))
    drain()

    assert(out.toMap == Map(
      1L -> Some(1.0), 2L -> None,
      3L -> Some(2.0), 4L -> Some(1.0)), s"got $out")
  }
}

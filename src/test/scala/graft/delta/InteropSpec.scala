package graft.delta

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Interop: read REAL Delta tables written by Spark/delta-rs from the
  * reference's public test corpus (/root/reference/kernel/tests/data —
  * used as INPUT DATA only; expectations come from the corpus catalog,
  * kernel/tests/README.md). This is the cross-engine evidence that the
  * log replay, DV decoding, partition-value parsing, stats handling and
  * feature gates match tables our own writer never produced.
  */
class InteropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "/root/reference/kernel/tests/data"

  test("table-with-dv-small: 10 rows, 2 soft-deleted by a real DV") {
    val t = DeltaTable.forPath(spark, s"$base/table-with-dv-small")
    val snap = t.snapshot()
    assert(snap.protocol.readerFeatures.get.contains("deletionVectors"))
    assert(t.toDF.count() == 8)
    assert(snap.schema.fieldNames.toSeq == Seq("value"))
  }

  test("table-without-dv-small: all 10 rows visible") {
    val t = DeltaTable.forPath(spark, s"$base/table-without-dv-small")
    assert(t.toDF.count() == 10)
  }

  test("with-short-dv: inline-file DV deletes 3 of 10 rows") {
    val t = DeltaTable.forPath(spark, s"$base/with-short-dv")
    val df = t.toDF
    assert(df.count() == 7)
    assert(df.schema.fieldNames.contains("timestamp"))
  }

  test("basic_partitioned: null partition + pruning + predicates") {
    val t = DeltaTable.forPath(spark, s"$base/basic_partitioned")
    val df = t.toDF
    val letters = df.select("letter").distinct()
      .collect().map(r => Option(r.getString(0))).toSet
    assert(letters == Set(Some("a"), Some("b"), Some("c"), Some("e"), None))
    // partition pruning returns exactly the full-read filter result
    val pruned = t.scan(Some("letter = 'a'")).toDF
    assert(pruned.collect().toSet ==
      df.filter($"letter" === "a").collect().toSet)
    assert(t.scan(Some("letter = 'a'")).collectAddFiles()
      .forall(_.partitionValues("letter") == "a"))
    // data predicate across files
    val n = t.scan(Some("number > 3")).toDF
    assert(n.collect().toSet == df.filter($"number" > 3).collect().toSet)
  }

  test("mixed-nulls: nullCount-driven IS NULL semantics") {
    val t = DeltaTable.forPath(spark, s"$base/mixed-nulls")
    val df = t.toDF
    val nulls = t.scan(Some("n IS NULL")).toDF
    assert(nulls.collect().toSet ==
      df.filter($"n".isNull).collect().toSet)
    val notNulls = t.scan(Some("n IS NOT NULL")).toDF
    assert(notNulls.collect().toSet ==
      df.filter($"n".isNotNull).collect().toSet)
  }

  test("basic-decimal-table: decimal partition values parse exactly") {
    val t = DeltaTable.forPath(spark, s"$base/basic-decimal-table")
    val df = t.toDF
    assert(df.schema("part").dataType == DecimalType(12, 5))
    assert(df.count() > 0)
    // every partition value round-trips through the string map
    val parts = df.select("part").distinct().count()
    assert(parts == t.scan(None).collectAddFiles()
      .map(_.partitionValues("part")).distinct.size)
  }

  test("data-reader-timestamp_ntz: NTZ data + partition columns") {
    val t = DeltaTable.forPath(spark, s"$base/data-reader-timestamp_ntz")
    val df = t.toDF
    assert(df.schema("tsNtz").dataType == TimestampNTZType)
    assert(df.schema("tsNtzPartition").dataType == TimestampNTZType)
    assert(df.count() > 0)
  }

  test("type-widening: widened final schema serves old narrow files") {
    val t = DeltaTable.forPath(spark, s"$base/type-widening")
    val df = t.toDF
    // columns are named after their widening path (e.g. byte_long)
    assert(df.schema("byte_long").dataType == LongType)
    assert(df.schema("float_double").dataType == DoubleType)
    assert(df.count() > 0)
    assert(df.select("byte_long").na.drop().count() > 0)
  }

  test("app-txn-no-checkpoint: SetTransaction idempotency markers") {
    val t = DeltaTable.forPath(spark, s"$base/app-txn-no-checkpoint")
    val txns = t.snapshot().setTransactions
    assert(txns.nonEmpty)
    assert(t.toDF.count() > 0)
  }

  test("timestamp-truncation-stats: Spark-truncated max stat never skips") {
    // one file's real max is 4.000500s but its JSON stat says 4.000s —
    // the max-side floor compensation must keep the file. Probe EVERY
    // distinct timestamp with equality and boundary predicates.
    val t = DeltaTable.forPath(spark, s"$base/timestamp-truncation-stats")
    val df = t.toDF
    val values = df.select("ts_col").na.drop().distinct()
      .collect().map(_.getTimestamp(0))
    assert(values.exists(_.getNanos % 1000000 != 0),
      s"expected sub-millisecond values, got ${values.mkString(",")}")
    values.foreach { v =>
      Seq(s"ts_col = TIMESTAMP '$v'", s"ts_col >= TIMESTAMP '$v'",
        s"ts_col > TIMESTAMP '${new java.sql.Timestamp(v.getTime - 1)}'")
        .foreach { p =>
          val got = t.scan(Some(p)).toDF.collect().toSet
          val want = df.filter(expr(p)).collect().toSet
          assert(got == want, s"predicate '$p' mismatch")
        }
    }
  }

  test("parquet_row_group_skipping + parsed-stats read clean") {
    Seq("parquet_row_group_skipping", "parsed-stats").foreach { name =>
      val t = DeltaTable.forPath(spark, s"$base/$name")
      assert(t.toDF.count() > 0, name)
    }
  }
}

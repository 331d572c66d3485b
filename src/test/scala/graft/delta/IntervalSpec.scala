package graft.delta

import java.time.{Duration, Period}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ANSI interval columns (reference schema/mod.rs:1996-2026 —
  * `interval year to month` / `interval day to second` primitive types;
  * integration/write/interval.rs — intervals round-trip, carry ONLY
  * nullCount stats; create_table/interval.rs — interval columns are
  * rejected as clustering or partition columns).
  */
class IntervalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("interval").toString

  test("interval columns round-trip: null / zero / negative / extreme") {
    val dir = tmp()
    val df = Seq(
      (1, Some(Period.ofMonths(14)), Some(Duration.ofSeconds(90, 123000))),
      (2, Some(Period.ofMonths(0)), Some(Duration.ZERO)),
      (3, Some(Period.ofMonths(-7)), Some(Duration.ofDays(-3))),
      (4, None, None),
      (5, Some(Period.ofYears(100)), Some(Duration.ofDays(10000))))
      .toDF("id", "ym", "dt")
    DeltaTable.create(spark, dir, df.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(df)

    // compare by total months: Spark normalizes P14M to P1Y2M
    val got = t.toDF.orderBy(col("id"))
      .as[(Int, Option[Period], Option[Duration])].collect().toSeq
      .map { case (i, p, d) => (i, p.map(_.toTotalMonths), d) }
    assert(got == Seq(
      (1, Some(14L), Some(Duration.ofSeconds(90, 123000))),
      (2, Some(0L), Some(Duration.ZERO)),
      (3, Some(-7L), Some(Duration.ofDays(-3))),
      (4, None, None),
      (5, Some(1200L), Some(Duration.ofDays(10000)))))

    // the schemaString uses the reference's serde names
    val ss = t.snapshot().metadata.schemaString
    assert(ss.contains("interval year to month"), ss)
    assert(ss.contains("interval day to second"), ss)
  }

  test("interval columns carry nullCount but never min/max stats") {
    // reference integration/write/interval.rs
    // test_append_interval_roundtrip: numeric columns keep full stats
    // while the interval column gets only nullCount
    val dir = tmp()
    val df = Seq(
      (1, Some(Period.ofMonths(3))), (2, Some(Period.ofMonths(9))),
      (3, None)).toDF("id", "iv")
    DeltaTable.create(spark, dir, df.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(df)

    val fs = Storage.fs(t.root, spark.sessionState.newHadoopConf())
    val statsJsons = Storage.readLines(fs,
        FileNames.commitFile(FileNames.logDir(t.root), 1L))
      .filter(_.nonEmpty).map(JsonLog.parseLine)
      .flatMap(n => Option(n.get("add")).filterNot(_.isNull))
      .map(a => a.get("stats").asText)
    assert(statsJsons.nonEmpty)
    statsJsons.foreach { s =>
      val n = JsonLog.parseLine(s)
      assert(n.get("nullCount").has("iv"), s)
      assert(!n.get("minValues").has("iv"), s)
      assert(!n.get("maxValues").has("iv"), s)
      // the sibling numeric column keeps ordinary min/max
      assert(n.get("minValues").has("id"), s)
    }

    // a predicate on the sibling column still skips; an interval
    // column never participates in skipping
    assert(t.scan(Some("id > 100")).filesDF.count() == 0)
  }

  test("interval columns are rejected as partition or clustering columns") {
    // reference create_table/interval.rs
    // test_create_table_rejects_interval_clustering
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("iv", YearMonthIntervalType(
        YearMonthIntervalType.YEAR, YearMonthIntervalType.MONTH))))
    val e1 = intercept[IllegalArgumentException] {
      DeltaTable.create(spark, tmp(), schema, partitionColumns = Seq("iv"))
    }
    assert(e1.getMessage.toLowerCase.contains("interval"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DeltaTable.create(spark, tmp(), schema, clusterBy = Seq("iv"))
    }
    assert(e2.getMessage.toLowerCase.contains("interval"), e2.getMessage)
  }
}

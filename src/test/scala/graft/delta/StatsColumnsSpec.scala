package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Stats column selection on the write path
  * (`delta.dataSkippingStatsColumns` / `delta.dataSkippingNumIndexedCols`
  * — reference scan/data_skipping/stats_schema/mod.rs,
  * table_properties/mod.rs:38-39; test_utils num_indexed_cols_* and
  * stats_columns_* table configs). At 100 TB stats are per-file ×
  * per-column — unindexed columns must not bloat the log.
  */
class StatsColumnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("statscols").toString

  private def addStats(t: DeltaTable, v: Long): Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val fs = Storage.fs(t.root, spark.sessionState.newHadoopConf())
    Storage.readLines(fs, FileNames.commitFile(FileNames.logDir(t.root), v))
      .filter(_.nonEmpty).map(JsonLog.parseLine)
      .flatMap(n => Option(n.get("add")).filterNot(_.isNull))
      .map(a => JsonLog.parseLine(a.get("stats").asText))
  }

  private def df4 = Seq((1, "a", 10L, 1.5), (2, "b", 20L, 2.5))
    .toDF("c1", "c2", "c3", "c4")

  test("dataSkippingStatsColumns restricts stats to the listed columns " +
      "(numRecords always kept)") {
    val dir = tmp()
    DeltaTable.create(spark, dir, df4.schema, configuration =
      Map("delta.dataSkippingStatsColumns" -> "c1, `c3`"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(df4)
    val stats = addStats(t, 1L)
    assert(stats.map(_.get("numRecords").asLong).sum == 2L)
    stats.foreach { s =>
      assert(s.get("minValues").has("c1") && s.get("minValues").has("c3"), s)
      assert(!s.get("minValues").has("c2") && !s.get("minValues").has("c4"), s)
      assert(s.get("nullCount").has("c1") && !s.get("nullCount").has("c2"), s)
    }
    // skipping still works on an indexed column, never on an unindexed one
    assert(t.scan(Some("c1 > 100")).filesDF.count() == 0)
    assert(t.scan(Some("c4 > 100.0")).filesDF.count() ==
      t.scan(None).filesDF.count())
  }

  test("dataSkippingStatsColumns resolves case-insensitively and fails " +
      "on unknown names instead of silently disabling skipping") {
    // case-insensitive resolution (Delta column-name semantics)
    val dir = tmp()
    DeltaTable.create(spark, dir, df4.schema, configuration =
      Map("delta.dataSkippingStatsColumns" -> "C1"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(df4)
    addStats(t, 1L).foreach(s => assert(s.get("minValues").has("c1"), s))

    // a typo must raise, not quietly drop the column from the index
    val dir2 = tmp()
    DeltaTable.create(spark, dir2, df4.schema, configuration =
      Map("delta.dataSkippingStatsColumns" -> "c1, nope"))
    val t2 = DeltaTable.forPath(spark, dir2)
    val ex = intercept[Exception] { t2.append(df4) }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(e => e.getMessage != null && e.getMessage.contains("nope")), ex)
  }

  test("dataSkippingNumIndexedCols=2 keeps stats for the first two " +
      "columns only; 0 drops all per-column stats; -1 keeps everything") {
    def statsFor(n: String): Seq[com.fasterxml.jackson.databind.JsonNode] = {
      val dir = tmp()
      DeltaTable.create(spark, dir, df4.schema, configuration =
        Map("delta.dataSkippingNumIndexedCols" -> n))
      val t = DeltaTable.forPath(spark, dir)
      t.append(df4)
      addStats(t, 1L)
    }
    statsFor("2").foreach { s =>
      assert(s.get("minValues").has("c1") && s.get("minValues").has("c2"), s)
      assert(!s.get("minValues").has("c3") && !s.get("nullCount").has("c4"), s)
    }
    statsFor("0").foreach { s =>
      assert(s.get("numRecords").asLong >= 1L, s)
      assert(s.get("minValues").isEmpty && s.get("nullCount").isEmpty, s)
    }
    statsFor("-1").foreach { s =>
      Seq("c1", "c2", "c3", "c4").foreach(c =>
        assert(s.get("minValues").has(c) && s.get("nullCount").has(c), s))
    }
  }

  test("clustering columns keep stats even when the properties would " +
      "exclude them") {
    val dir = tmp()
    DeltaTable.create(spark, dir, df4.schema,
      clusterBy = Seq("c3"),
      configuration = Map("delta.dataSkippingNumIndexedCols" -> "1"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(df4)
    addStats(t, 1L).foreach { s =>
      assert(s.get("minValues").has("c1"), s) // first indexed col
      assert(s.get("minValues").has("c3"), s) // clustering col forced in
      assert(!s.get("minValues").has("c2"), s)
    }
  }

  test("a struct's leaves count against the indexed-column budget") {
    // schema: s{a,b}, x — numIndexedCols=2 covers s's two leaves, so x
    // (leaf index 2) is excluded; our flat collector emits no struct
    // stats, so the observable contract is x's absence
    val dir = tmp()
    val df = Seq((1, 2, 3)).toDF("a", "b", "x")
      .select(struct(col("a"), col("b")).as("s"), col("x"))
    DeltaTable.create(spark, dir, df.schema, configuration =
      Map("delta.dataSkippingNumIndexedCols" -> "2"))
    val t = DeltaTable.forPath(spark, dir)
    t.append(df)
    addStats(t, 1L).foreach { s =>
      assert(!s.get("minValues").has("x"), s)
      assert(!s.get("nullCount").has("x"), s)
    }
  }
}

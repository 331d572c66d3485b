package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Interop with the reference's COMPRESSED fixture tables (tar.zst —
  * extracted into target/tmp): CDF, compacted logs, V2 checkpoints,
  * timestamp partition values. Expected contents come from the
  * reference's own integration tests
  * (kernel/tests/integration/features/cdf.rs,
  * integration/read/mod.rs, integration/log/v2_checkpoints.rs) — the
  * "match the reference's results on its own test queries" bar.
  */
class InteropArchiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val archiveDir = "/root/reference/kernel/tests/data"

  /** Extract (once) and return the table path. */
  private def fixture(name: String): String = {
    val destRoot = java.nio.file.Paths.get("target", "tmp", "fixtures")
    java.nio.file.Files.createDirectories(destRoot)
    val table = destRoot.resolve(name)
    if (!java.nio.file.Files.exists(table)) {
      val cmd = Seq("tar", "--use-compress-program=unzstd", "-xf",
        s"$archiveDir/$name.tar.zst", "-C", destRoot.toString)
      val rc = new ProcessBuilder(cmd: _*).inheritIO().start().waitFor()
      require(rc == 0, s"failed to extract $name")
    }
    table.toString
  }

  test("cdf-table-simple: per-version CDF matches the reference's expectations") {
    val path = fixture("cdf-table-simple")
    def cdf(lo: Long, hi: Long): Seq[(Long, String, Long)] =
      TableChanges.read(spark, path, lo, Some(hi))
        .select(col("id").cast("long"), col("_change_type"),
          col("_commit_version"))
        .as[(Long, String, Long)].collect().sorted.toSeq

    assert(cdf(0, 0) == (0L to 9L).map(i => (i, "insert", 0L)))
    assert(cdf(1, 1) == (0L to 9L).map(i => (i, "delete", 1L)))
    assert(cdf(2, 2) == (20L to 24L).map(i => (i, "insert", 2L)))
    assert(cdf(0, 2) ==
      ((0L to 9L).map(i => (i, "insert", 0L)) ++
        (0L to 9L).map(i => (i, "delete", 1L)) ++
        (20L to 24L).map(i => (i, "insert", 2L))).sorted)
  }

  test("compacted-log-files-table: reads through real compacted files") {
    val t = DeltaTable.forPath(spark, fixture("compacted-log-files-table"))
    val got = t.toDF.select(col("id").cast("long"), col("comment"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set(
      (0L, Some("new")),
      (1L, Some("after-large-delete")),
      (2L, Some("")), // pretty-printed blank in the reference = ""
      (10L, Some("merge1-insert")),
      (12L, Some("merge2-insert"))))
  }

  test("v2 checkpoints with sidecars (json + parquet): 1233 rows") {
    Seq("v2-checkpoints-json-with-sidecars",
        "v2-checkpoints-parquet-with-sidecars").foreach { name =>
      val t = DeltaTable.forPath(spark, fixture(name))
      val snap = t.snapshot()
      assert(snap.segment.isV2Checkpoint, name)
      val df = t.toDF
      assert(df.count() == 1233, name) // 3x{0} + 30 + 100 + 100 + 1000
      assert(df.agg(max(col("id").cast("long"))).head.getLong(0) == 999L,
        name)
    }
  }

  test("v2 checkpoints without sidecars (json + parquet): ids 0..9, 2718") {
    Seq("v2-checkpoints-json-without-sidecars",
        "v2-checkpoints-parquet-without-sidecars").foreach { name =>
      val t = DeltaTable.forPath(spark, fixture(name))
      val ids = t.toDF.select(col("id").cast("long"))
        .as[Long].collect().sorted.toSeq
      assert(ids == ((0L to 9L) :+ 2718L), name)
    }
  }

  test("timestamp-partitioned-table: ':' in partition dir, 1 row") {
    val t = DeltaTable.forPath(spark, fixture("timestamp-partitioned-table"))
    val rows = t.toDF.collect()
    assert(rows.length == 1)
    val r = t.toDF.selectExpr("id", "cast(time as string) as ts").head
    assert(r.getAs[Any]("id").toString == "1")
    assert(r.getAs[String]("ts").startsWith("1971-07-22 03:06:40"))
  }

  test("cdf-table (partitioned by date): full-range CDF reads clean") {
    val path = fixture("cdf-table")
    val latest = Snapshot.forTable(spark, path).version
    val cdf = TableChanges.read(spark, path, 0, Some(latest))
    assert(cdf.count() > 0)
    val types = cdf.select("_change_type").distinct()
      .as[String].collect().toSet
    assert(types.subsetOf(Set("insert", "delete",
      "update_preimage", "update_postimage")))
    // partition column flows into CDF rows
    assert(cdf.filter(col("birthday").isNull).count() == 0)
  }
}

package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The reference's {LogState × FeatureSet × VersionTarget} sweep
  * (kernel/tests/integration/cross_product/mod.rs +
  * test-utils/src/table_builder.rs): every log shape (checkpoints at
  * mid/end, missing and STALE `_last_checkpoint` hints, post-cleanup
  * logs) × every feature bundle (none, or
  * DV+rowTracking+ICT+v2Checkpoint+CDF+appendOnly+domainMetadata with
  * column mapping name/id) must resolve latest, time-travel to mid,
  * refresh incrementally from mid, and read exact data — the log
  * replay's robustness matrix, not one-off fixtures.
  */
class CrossProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val LATEST = 6L
  private val MID = 3L
  private val ROWS = 10

  private case class LogShape(name: String, ckpts: Seq[Long],
    hint: String, cleanupBefore: Option[Long])

  // canonical sweep rows (table_builder.rs:346-430); CRC placement is
  // covered separately in ChecksumSpec
  private val shapes = Seq(
    LogShape("commits_only", Nil, "ok", None),
    LogShape("ckpt_end", Seq(LATEST), "ok", None),
    LogShape("ckpt_end_no_hint", Seq(LATEST), "missing", None),
    LogShape("ckpt_mid", Seq(MID), "ok", None),
    LogShape("two_ckpts_stale_hint", Seq(MID, LATEST), "stale", None),
    LogShape("ckpt_mid_cleanup", Seq(MID), "ok", Some(MID)),
    LogShape("ckpt_end_cleanup", Seq(MID, LATEST), "ok", Some(MID)))

  private val allFeatures = Map(
    "delta.feature.deletionVectors" -> "supported",
    RowTracking.ENABLED_KEY -> "true",
    DeltaTable.ICT_ENABLED_KEY -> "true",
    "delta.feature.v2Checkpoint" -> "supported",
    TableChanges.CDF_ENABLED_KEY -> "true",
    "delta.appendOnly" -> "true",
    "delta.feature.domainMetadata" -> "supported")

  private val featureSets = Seq(
    ("none", Map.empty[String, String]),
    ("all_cm_name", allFeatures + (ColumnMapping.MODE_KEY -> "name")),
    ("all_cm_id", allFeatures + (ColumnMapping.MODE_KEY -> "id")))

  private def expectedIds(version: Long): Set[Long] =
    (1L to version).flatMap(v => (0 until ROWS).map(r => v * 100 + r)).toSet

  /** Build one table in the given shape; v0 = create, v1..LATEST append
    * 10 rows each (ids v*100+0..9).
    */
  private def build(shape: LogShape, config: Map[String, String]): String = {
    val dir = java.nio.file.Files.createTempDirectory(
      s"xp-${shape.name}").toString
    val src = Seq((0L, "seed")).toDF("id", "tag")
    DeltaTable.create(spark, dir, src.schema, configuration = config)
    val t = DeltaTable.forPath(spark, dir)
    val v2 = config.contains("delta.feature.v2Checkpoint")
    val fs = Storage.fs(t.root, spark.sessionState.newHadoopConf())
    val logDir = FileNames.logDir(t.root)
    val hintPath = new Path(logDir, FileNames.LAST_CHECKPOINT)
    var midHint: Option[String] = None

    (1L to LATEST).foreach { v =>
      t.append((0 until ROWS).map(r => (v * 100 + r, s"c$v"))
        .toDF("id", "tag"))
      if (shape.ckpts.contains(v)) {
        if (v2) t.checkpointV2(numSidecars = 1) else t.checkpoint()
        if (v == MID && fs.exists(hintPath))
          midHint = Some(Storage.readLines(fs, hintPath).mkString("\n"))
      }
    }
    shape.hint match {
      case "missing" => fs.delete(hintPath, false)
      case "stale" =>
        // the hint still points at the MID checkpoint; listing must
        // find the newer one anyway (two_checkpoints_stale_hint)
        midHint.foreach { h =>
          fs.delete(hintPath, false); Storage.put(fs, hintPath, h) }
      case _ => ()
    }
    shape.cleanupBefore.foreach { n =>
      (0L until n).foreach { v =>
        fs.delete(FileNames.commitFile(logDir, v), false) }
    }
    dir
  }

  shapes.foreach { shape =>
    featureSets.foreach { case (fname, config) =>
      test(s"${shape.name} × $fname: latest, time travel, refresh, data") {
        val dir = build(shape, config)
        val t = DeltaTable.forPath(spark, dir)

        // latest resolves through whatever hint state exists
        val latest = t.snapshot()
        assert(latest.version == LATEST)
        def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
          df.select(col("id")).collect().map(_.getLong(0)).toSet
        assert(ids(new DeltaScan(latest, None).toDF) == expectedIds(LATEST))

        // time travel to MID (reachable even post-cleanup: the MID
        // checkpoint anchors it)
        val mid = t.snapshot(Some(MID))
        assert(mid.version == MID)
        assert(ids(new DeltaScan(mid, None).toDF) == expectedIds(MID))

        // incremental refresh MID -> LATEST must equal a cold build
        val refreshed = Snapshot.refresh(mid)
        assert(refreshed.version == LATEST)
        assert(ids(new DeltaScan(refreshed, None).toDF) ==
          expectedIds(LATEST))

        if (config.contains(RowTracking.ENABLED_KEY)) {
          val withIds = new DeltaScan(latest, None).toDFWithRowIds
          val rowIds = withIds.select(col("_row_id")).collect()
            .map(_.getLong(0))
          assert(rowIds.length == rowIds.distinct.length &&
            rowIds.length == (LATEST * ROWS).toInt)
        }
        if (config.contains(TableChanges.CDF_ENABLED_KEY)) {
          // post-MID CDF range stays readable in every log shape
          val feed = TableChanges.read(spark, dir, MID + 1, Some(LATEST))
          assert(ids(feed.filter(col("_change_type") === "insert")) ==
            expectedIds(LATEST) -- expectedIds(MID))
        }
        if (config.get("delta.appendOnly").contains("true")) {
          val e = intercept[IllegalArgumentException](
            t.deleteWhere("id = 100"))
          assert(e.getMessage.contains("append-only"))
        }
      }
    }
  }
}

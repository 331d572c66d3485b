package graft.delta

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** 0-byte log artifacts — what a torn writer or a failed multipart
  * upload leaves behind (reference
  * kernel/tests/integration/log/empty_log_files.rs):
  *
  *  - empty COMPACTED files are skipped, selection falls back to the
  *    individual commits (selected by name they'd read as ZERO
  *    actions — silent loss of the whole range);
  *  - empty COMMIT files stay listed and read as empty commits;
  *  - empty CHECKPOINT files are skipped, replay falls back to
  *    commits (or an older checkpoint);
  *  - empty CRC files are ignored (CRC is optional).
  */
class EmptyLogFilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def src(lo: Int, hi: Int) =
    (lo to hi).map(i => (i.toLong, s"v$i")).toDF("k", "s")

  private def fs(dir: String) = Storage.fs(new Path(dir),
    spark.sessionState.newHadoopConf())

  private def touchEmpty(dir: String, name: String): Unit = {
    val p = new Path(FileNames.logDir(new Path(dir)), name)
    val f = fs(dir)
    if (f.exists(p)) f.delete(p, false)
    f.create(p, false).close()
  }

  private def build(name: String): (String, DeltaTable) = {
    val dir = TestSpark.tmpDir(name)
    DeltaTable.create(spark, dir, src(1, 1).schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src(1, 10))   // v1
    t.append(src(11, 20))  // v2
    (dir, t)
  }

  test("0-byte compacted file is skipped — replay falls back to the " +
      "individual commits it claims to cover") {
    val (dir, t) = build("zb-compact")
    t.compactLog(0, 2) // a real compaction first, then corrupt it
    val compacted = Storage.listSorted(fs(dir),
        FileNames.logDir(new Path(dir)))
      .map(_.getPath.getName).find(_.contains("compacted")).get
    touchEmpty(dir, compacted)

    val snap = DeltaTable.forPath(spark, dir).snapshot()
    assert(snap.version == 2L)
    // the empty compaction must NOT be selected (zero actions = the
    // whole table silently vanishes)
    assert(snap.segment.deltas.forall(f =>
      !f.path.getName.contains("compacted")))
    assert(snap.toDF.select("k").as[Long].collect().toSet ==
      (1L to 20L).toSet)
  }

  test("0-byte commit file stays listed and reads as an EMPTY commit") {
    val (dir, _) = build("zb-commit")
    touchEmpty(dir, f"${2L}%020d.json") // tear v2 away
    // v2's crc (written by the append) would serve stale P&M totals —
    // remove it like the reference fixture, which never had one
    val crc = new Path(FileNames.logDir(new Path(dir)), f"${2L}%020d.crc")
    if (fs(dir).exists(crc)) fs(dir).delete(crc, false)

    val snap = DeltaTable.forPath(spark, dir).snapshot()
    assert(snap.version == 2L) // the commit still counts for versioning
    assert(snap.toDF.select("k").as[Long].collect().toSet ==
      (1L to 10L).toSet) // ...but contributes no actions
  }

  test("0-byte checkpoint is skipped — snapshot replays the commits " +
      "(or an older checkpoint) instead") {
    val (dir, t) = build("zb-ckpt")
    touchEmpty(dir, f"${2L}%020d.checkpoint.parquet")

    val snap = DeltaTable.forPath(spark, dir).snapshot()
    assert(snap.version == 2L)
    assert(snap.segment.checkpointParts.isEmpty)
    assert(snap.toDF.count() == 20)

    // an OLDER real checkpoint must win over a newer empty one
    t.checkpoint(Some(1L))
    touchEmpty(dir, f"${2L}%020d.checkpoint.parquet")
    val snap2 = DeltaTable.forPath(spark, dir).snapshot()
    assert(snap2.version == 2L)
    assert(snap2.segment.checkpointParts.map(_.version) == Seq(1L))
    assert(snap2.toDF.count() == 20)
  }

  test("0-byte crc file is ignored — CRC is an optional fast path") {
    val (dir, _) = build("zb-crc")
    touchEmpty(dir, f"${2L}%020d.crc")
    val snap = DeltaTable.forPath(spark, dir).snapshot()
    assert(snap.version == 2L)
    assert(snap.toDF.count() == 20)
  }
}

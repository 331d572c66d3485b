package graft.bench

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.delta.{FileNames, Snapshot, Storage}

/** Kernel-equivalent metadata benchmark (reference
  * kernel/benches/metadata_bench.rs:33-50: table
  * `300k-add-files-100-col-partitioned`, log-only): generates a synthetic
  * `_delta_log` with 300k add actions across 30 commits over a 100-column
  * partitioned schema, then measures
  *  - snapshot_300k: snapshot construction (listing + P&M replay)
  *  - replay_300k:   full distributed log replay to the live file set
  * The log is generated once and cached under target/bench.
  */
object MetadataBench {

  val NUM_COMMITS = 30
  val ADDS_PER_COMMIT = 10000
  val NUM_COLS = 100
  val STATS_COLS = 20

  def tableDir = "/root/repo/target/bench/meta300k"

  private def schemaJson: String = {
    val dataCols = (0 until NUM_COLS).map(i =>
      s"""{"name":"c$i","type":"long","nullable":true,"metadata":{}}""")
    val p = """{"name":"p","type":"string","nullable":true,"metadata":{}}"""
    s"""{"type":"struct","fields":[${(dataCols :+ p).mkString(",")}]}"""
  }

  def ensureLog(spark: SparkSession): Unit = {
    val root = new Path(tableDir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = Storage.fs(root, conf)
    val logDir = FileNames.logDir(root)
    val marker = new Path(logDir, ".bench-done")
    if (fs.exists(marker)) return
    fs.delete(logDir, true)
    fs.mkdirs(logDir)

    // commit 0: protocol + metadata
    val meta =
      s"""{"metaData":{"id":"bench-meta300k","format":{"provider":"parquet",""" +
      s""""options":{}},"schemaString":${jstr(schemaJson)},""" +
      s""""partitionColumns":["p"],"configuration":{},"createdTime":1700000000000}}"""
    Storage.put(fs, FileNames.commitFile(logDir, 0L),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" + "\n" +
        meta + "\n")

    // commits 1..NUM_COMMITS: ADDS_PER_COMMIT adds each, streamed out
    var fileIdx = 0
    (1 to NUM_COMMITS).foreach { v =>
      val out = fs.create(FileNames.commitFile(logDir, v.toLong), false)
      val w = new BufferedWriter(
        new OutputStreamWriter(out, StandardCharsets.UTF_8), 1 << 20)
      w.write(s"""{"commitInfo":{"timestamp":${1700000000000L + v},""" +
        s""""operation":"WRITE","operationParameters":{}}}""")
      w.newLine()
      var i = 0
      while (i < ADDS_PER_COMMIT) {
        val part = fileIdx % 64
        val lo = fileIdx.toLong * 1000
        val mins = (0 until STATS_COLS)
          .map(c => s""""c$c":${lo + c}""").mkString(",")
        val maxs = (0 until STATS_COLS)
          .map(c => s""""c$c":${lo + c + 999}""").mkString(",")
        val nulls = (0 until STATS_COLS)
          .map(c => s""""c$c":0""").mkString(",")
        w.write(
          s"""{"add":{"path":"p=$part/part-$fileIdx.parquet",""" +
          s""""partitionValues":{"p":"$part"},"size":1048576,""" +
          s""""modificationTime":${1700000000000L + fileIdx},""" +
          s""""dataChange":true,"stats":"{\\"numRecords\\":1000,""" +
          s"""\\"minValues\\":{${esc(mins)}},\\"maxValues\\":{${esc(maxs)}},""" +
          s"""\\"nullCount\\":{${esc(nulls)}}}"}}""")
        w.newLine()
        fileIdx += 1
        i += 1
      }
      w.flush()
      out.close()
    }
    Storage.put(fs, marker, "done")
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  private def esc(s: String): String = s.replace("\"", "\\\"")

  /** Run the two metrics; returns name -> seconds. */
  def run(spark: SparkSession): Map[String, Double] = {
    ensureLog(spark)
    val t0 = System.nanoTime()
    val snap = Snapshot.forTable(spark, tableDir)
    val tSnap = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val n = snap.allAdds.count()
    val tReplay = (System.nanoTime() - t1) / 1e9
    require(n == NUM_COMMITS.toLong * ADDS_PER_COMMIT,
      s"replay_300k returned $n adds")
    Map("snapshot_300k" -> tSnap, "replay_300k" -> tReplay)
  }
}

package graft.delta

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Checkpoint-compat stats casts (reference
  * kernel/src/schema/mod.rs:2059-2075 `is_checkpoint_cast_compatible`):
  * some checkpoint writers store `stats_parsed` date/timestamp min/max
  * as plain INT32 / INT64 with no parquet logical annotation. Those
  * reads must still produce typed stats — Integer→Date and
  * Long→Timestamp/TimestampNtz are accepted for CHECKPOINT INTEROP
  * ONLY (they are not protocol widening rules), and skipping keeps its
  * pruning power instead of degrading to keep-every-file.
  */
class CheckpointCompatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def moveOnlyParquet(fromDir: String, to: Path): Unit = {
    val fs = Storage.fs(to, spark.sessionState.newHadoopConf())
    val part = fs.listStatus(new Path(fromDir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    assert(part.length == 1)
    fs.mkdirs(to.getParent)
    assert(fs.rename(part.head, to))
  }

  test("struct-stats checkpoint with UNANNOTATED int32 date / int64 " +
      "timestamp stats: snapshot loads, stats prune, data reads") {
    val dir = TestSpark.tmpDir("ckpt-compat")
    val root = new Path(dir)
    val fs = Storage.fs(root, spark.sessionState.newHadoopConf())
    val logDir = FileNames.logDir(root)

    // two real data files a month apart
    def writeData(name: String, day: String, ts: String, k: Long): Long = {
      val df = Seq((java.sql.Date.valueOf(day),
        java.sql.Timestamp.valueOf(ts), k)).toDF("d", "ts", "k")
      val tmp = TestSpark.tmpDir(s"ckpt-compat-$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      moveOnlyParquet(tmp, new Path(root, name))
      fs.getFileStatus(new Path(root, name)).getLen
    }
    val sz1 = writeData("f1.parquet", "2024-01-15", "2024-01-15 08:00:00", 1L)
    val sz2 = writeData("f2.parquet", "2024-06-20", "2024-06-20 18:30:00", 2L)

    val schemaString =
      """{\"type\":\"struct\",\"fields\":[
        |{\"name\":\"d\",\"type\":\"date\",\"nullable\":true,\"metadata\":{}},
        |{\"name\":\"ts\",\"type\":\"timestamp\",\"nullable\":true,\"metadata\":{}},
        |{\"name\":\"k\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""
        .stripMargin.replace("\n", "")

    // commit 0: protocol + metadata + the two adds (stats-free)
    Storage.put(fs, FileNames.commitFile(logDir, 0L), Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"ckpt-compat","format":{"provider":"parquet","options":{}},"schemaString":"$schemaString","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$sz1,"modificationTime":1700000000000,"dataChange":true}}""",
      s"""{"add":{"path":"f2.parquet","partitionValues":{},"size":$sz2,"modificationTime":1700000000000,"dataChange":true}}"""
    ).mkString("", "\n", "\n"))

    // checkpoint parquet at version 0 whose stats_parsed min/max for d
    // and ts are PHYSICAL int32 days / int64 micros: building the DF
    // with Integer/Long leaf types makes Spark write exactly the
    // unannotated primitives foreign writers produce
    def days(d: String): Int = LocalDate.parse(d).toEpochDay.toInt
    def micros(ts: String): Long =
      java.sql.Timestamp.valueOf(ts).getTime * 1000L
    def statsRow(day: String, ts: String, k: Long): String =
      s"""{"numRecords":1,
         |"minValues":{"d":${days(day)},"ts":${micros(ts)},"k":$k},
         |"maxValues":{"d":${days(day)},"ts":${micros(ts)},"k":$k},
         |"nullCount":{"d":0,"ts":0,"k":0},"tightBounds":true}"""
        .stripMargin.replace("\n", "")
    val ckptLines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"ckpt-compat","format":{"provider":"parquet","options":{}},"schemaString":"$schemaString","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":$sz1,"modificationTime":1700000000000,"dataChange":false,"stats_parsed":${statsRow("2024-01-15", "2024-01-15 08:00:00", 1L)}}}""",
      s"""{"add":{"path":"f2.parquet","partitionValues":{},"size":$sz2,"modificationTime":1700000000000,"dataChange":false,"stats_parsed":${statsRow("2024-06-20", "2024-06-20 18:30:00", 2L)}}}""")
    val bounds = new org.apache.spark.sql.types.StructType()
      .add("d", org.apache.spark.sql.types.IntegerType)   // no DATE annotation
      .add("ts", org.apache.spark.sql.types.LongType)     // no TIMESTAMP annotation
      .add("k", org.apache.spark.sql.types.LongType)
    val statsParsed = new org.apache.spark.sql.types.StructType()
      .add("numRecords", org.apache.spark.sql.types.LongType)
      .add("minValues", bounds).add("maxValues", bounds)
      .add("nullCount", new org.apache.spark.sql.types.StructType()
        .add("d", org.apache.spark.sql.types.LongType)
        .add("ts", org.apache.spark.sql.types.LongType)
        .add("k", org.apache.spark.sql.types.LongType))
      .add("tightBounds", org.apache.spark.sql.types.BooleanType)
    val ckptSchema = new org.apache.spark.sql.types.StructType()
      .add("protocol", new org.apache.spark.sql.types.StructType()
        .add("minReaderVersion", org.apache.spark.sql.types.IntegerType)
        .add("minWriterVersion", org.apache.spark.sql.types.IntegerType))
      .add("metaData", new org.apache.spark.sql.types.StructType()
        .add("id", org.apache.spark.sql.types.StringType)
        .add("format", new org.apache.spark.sql.types.StructType()
          .add("provider", org.apache.spark.sql.types.StringType))
        .add("schemaString", org.apache.spark.sql.types.StringType)
        .add("partitionColumns", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))
        .add("configuration", org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))
        .add("createdTime", org.apache.spark.sql.types.LongType))
      .add("add", StructTypeOf.addWithStatsParsed(statsParsed))
    val ckptDf = spark.read.schema(ckptSchema)
      .json(ckptLines.toDS)
    val tmpCkpt = TestSpark.tmpDir("ckpt-compat-ckpt")
    ckptDf.coalesce(1).write.mode("overwrite").parquet(tmpCkpt)
    moveOnlyParquet(tmpCkpt, FileNames.classicCheckpointFile(logDir, 0L))
    Storage.put(fs, new Path(logDir, "_last_checkpoint"),
      """{"version":0,"size":4}""")

    // snapshot builds through the checkpoint arm (commit 0 is covered
    // by the checkpoint, so stats come from stats_parsed alone)
    val t = DeltaTable.forPath(spark, dir)
    val snap = t.snapshot()
    assert(snap.version == 0L)
    assert(snap.segment.checkpointVersion.contains(0L))

    // full read
    assert(t.toDF.select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    // date stats prune: the compat-cast int32 min/max skip f1
    assert(t.scan(Some("d >= DATE '2024-06-01'")).filesDF.count() == 1)
    assert(t.scan(Some("d < DATE '2024-01-01'")).filesDF.count() == 0)
    // timestamp stats prune: the compat-cast int64 min/max skip f2
    assert(t.scan(
      Some("ts < TIMESTAMP '2024-02-01 00:00:00'")).filesDF.count() == 1)
    // long leaf needed no compat and still prunes
    assert(t.scan(Some("k = 2")).filesDF.count() == 1)
    // pruned data read end-to-end
    assert(t.scan(Some("d >= DATE '2024-06-01'")).toDF
      .select("k").as[Long].collect().toSeq == Seq(2L))
  }
}

/** Helper keeping the add-with-stats_parsed schema construction in one
  * place (mirrors LogSchema.add without depending on its private
  * pieces).
  */
private object StructTypeOf {
  import org.apache.spark.sql.types._
  def addWithStatsParsed(statsParsed: StructType): StructType =
    new StructType()
      .add("path", StringType)
      .add("partitionValues", MapType(StringType, StringType))
      .add("size", LongType)
      .add("modificationTime", LongType)
      .add("dataChange", BooleanType)
      .add("stats_parsed", statsParsed)
}

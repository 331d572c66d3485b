package graft.bench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Standalone step-timer for the q_tree_eq_convert composition row
// (mirrors SinkProbe for the kitchen sink): prints per-phase laps so
// an in-sweep drift on the row can be attributed to a phase. Not part
// of the library.
object ConvProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val d = "/root/testdata/sf0.1"
    import graft.delta._
    (1 to 2).foreach { rep =>
    var t0 = System.nanoTime()
    def lap(name: String): Unit = {
      val t = System.nanoTime()
      println(f"LAP $rep $name: ${(t - t0)/1e9}%.2f s"); t0 = t
    }
    val dir = s"/root/repo/target/tmp/convprobe-$rep-" + java.util.UUID.randomUUID().toString.take(8)
    val src = graft.Tables.load(spark, d, "lineitem")
      .select("l_orderkey","l_partkey","l_suppkey","l_linenumber","l_quantity","l_extendedprice","l_discount","l_tax","l_returnflag","l_linestatus","l_shipdate")
      .filter(col("l_quantity") < 6)
    DeltaTable.create(spark, dir, src.schema)
    val t = DeltaTable.forPath(spark, dir)
    t.append(src.filter(col("l_quantity") < 3).repartition(2))
    t.append(src.filter(col("l_quantity") >= 3).repartition(2))
    lap("appends")
    t.deleteWhereDV("l_orderkey % 7 = 1")
    lap("dv_delete")
    val snap = t.snapshot()
    val keys = src.filter(col("l_orderkey") % 3 === 0).select("l_orderkey","l_linenumber")
    val files = EqualityDeletes.writeDeleteFiles(snap, keys, Seq(0,3), snap.version + 1)
    lap("write_delete_files")
    val entries = ContentTree.entriesDF(snap).unionByName(
      EqualityDeletes.deleteEntriesDF(spark, files, Some(snap)))
    val root0 = ContentTree.writeTree(snap, entries, 4)
    lap("tree_write_1")
    val newRoot = EqualityDeletes.convertToPositionDeletes(snap, root0.resolve(snap.tableRoot.toString), 4)
    lap("convert")
    val resolved = newRoot.resolve(snap.tableRoot.toString)
    val rootUri = Storage.fs(snap.tableRoot, spark.sessionState.newHadoopConf())
      .makeQualified(snap.tableRoot).toUri.getPath
    val adds = ContentTree.addFileIterator(spark, resolved, snap.tableRoot.toString, rootUri).toSeq
    val n = snap.scanBuilder().build().assemble(adds, keepMeta = false).count()
    lap(s"read_back n=$n")
    }
    spark.stop()
  }
}

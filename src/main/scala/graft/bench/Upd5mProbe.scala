package graft.bench

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

// Phase-attribution probe for tree_update_5m — not part of the
// library. Reuses MetadataBench's marker-cached 5M base tree and runs
// updateRoot reps with -Dgraft.tree.phaseTimings=true so the TREEPHASE
// lines show where the wall time goes (winner / dvProbe / prevRoot /
// reuseProbe / mergeWrite=leafWrite+infoAgg+rootWrite).
object Upd5mProbe {
  def main(args: Array[String]): Unit = {
    sys.props("graft.tree.phaseTimings") = "true"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    MetadataBench.ensureLog5m(spark)
    val dir = MetadataBench.tableDir5m
    val fs = graft.delta.Storage.fs(new Path(dir),
      spark.sessionState.newHadoopConf())
    val marker = new Path(dir, "_delta_log/_amt/_tree_base.json")
    require(fs.exists(marker), "no cached 5M base tree — run the bench first")
    val in = fs.open(marker)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString.trim finally in.close()
    val n = graft.delta.JsonLog.parseLine(line)
    val base = graft.delta.AdaptiveMetadata.ContentRoot(
      n.get("path").asText, n.get("sizeInBytes").asLong,
      n.get("version").asLong)
    val snap = graft.delta.Snapshot.forTable(spark, dir)
    val reps = sys.env.getOrElse("GRAFT_REPS", "3").toInt
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val updated = graft.delta.ContentTree.updateRoot(snap, base)
      println(f"UPD5M rep $i total ${(System.nanoTime() - t0) / 1e9}%.3f s")
      fs.delete(new Path(updated.resolve(dir)).getParent, true)
    }
    spark.stop()
  }
}

package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Step-attribution probe for q_content_tree_incremental — not part of
// the library. Mirrors the query's fixture at sf0.1 with per-step
// timing so optimization targets the step that actually dominates.
object CtIncProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"CTINC $name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    val reps = sys.env.getOrElse("GRAFT_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val tAll = System.nanoTime()
      val dir = "/root/repo/target/tmp/ctinc-probe-" + System.nanoTime()
      val src = t("load")(graft.Tables.load(spark, d, "lineitem")
        .select(liCols.map(col): _*).filter(col("l_quantity") < 12))
      t("create")(graft.delta.DeltaTable.create(spark, dir, src.schema,
        Seq("l_returnflag")))
      val tab = graft.delta.DeltaTable.forPath(spark, dir)
      t("append-v1")(tab.append(
        src.filter(col("l_quantity") < 8).repartition(2)))
      val tree1 = t("writeRoot")(
        graft.delta.ContentTree.writeRoot(tab.snapshot()))
      t("append-v2")(tab.append(
        src.filter(col("l_quantity") >= 8).repartition(2)))
      t("deleteDV-v3")(tab.deleteWhereDV(
        "l_orderkey % 2 = 0 AND l_returnflag = 'N'"))
      t("delete-v4")(tab.deleteWhere("l_returnflag = 'R' AND l_quantity < 3"))
      val snap = t("snapshot")(tab.snapshot())
      val tree2 = t("updateRoot")(
        graft.delta.ContentTree.updateRoot(snap, tree1))
      val resolved = tree2.resolve(snap.tableRoot.toString)
      t("statuses")(graft.delta.ContentTree
        .readEntriesDF(spark, resolved, snap.tableRoot.toString)
        .select(col("tracking.status")).distinct().collect())
      val rootUri = graft.delta.Storage
        .fs(snap.tableRoot, spark.sessionState.newHadoopConf())
        .makeQualified(snap.tableRoot).toUri.getPath
      val adds = t("iterator")(graft.delta.ContentTree
        .addFileIterator(spark, resolved, snap.tableRoot.toString, rootUri)
        .toSeq)
      t("assemble+sort")(snap.scanBuilder().build()
        .assemble(adds, keepMeta = false)
        .select(liCols.map(col): _*)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .queryExecution.toRdd.count())
      println(f"CTINC TOTAL             ${(System.nanoTime() - tAll) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forensic phase split for the content-tree bench legs (the TreeBench
  * rows report totals only): projection-only vs +shuffle vs full
  * writeRoot, plus the read-side scan vs pruned-handoff split. Run 2
  * reps — rep1 carries codegen compile of the ~720-leaf entry
  * projection, rep2 is the warm number.
  *
  * Session findings (300k-add fixture, local[32]): the wide parquet
  * write dominates writeRoot (projection ~3.4 s warm, shuffle ~free,
  * write ~6-8 s — 16 leaf tasks × 19k rows × 720 cols); the pruned
  * read is scan-bound at ~0.25 s once the handoff is slim + shuffled
  * (it was 8-10 s when toLocalIterator re-ran the wide scan one
  * partition per job).
  */
object TreeProbe {
  def main(args: Array[String]): Unit = {
    sys.props("graft.tree.phaseTimings") = "true"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_TREE_5M=1: the catalog-scale frontier — full build,
    // incremental advance and pruned read over the 5M-add fixture
    // (the size class the manifest hierarchy exists for). One-off
    // forensic run, not a sweep leg.
    if (sys.env.get("GRAFT_TREE_5M").contains("1")) { run5m(spark); return }
    MetadataBench.ensureLog(spark)
    val snap = graft.delta.Snapshot.forTable(spark, MetadataBench.tableDir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { rep =>
      val e = graft.delta.ContentTree.entriesDF(snap)
      t(s"entries-project rep$rep")(e.queryExecution.toRdd.count())
      t(s"entries-shuffle rep$rep")(
        e.repartition(16, col("location")).queryExecution.toRdd.count())
    }
    val root = t("writeRoot rep1")(graft.delta.ContentTree.writeRoot(snap))
    t("writeRoot rep2")(graft.delta.ContentTree.writeRoot(snap))
    val resolved = root.resolve(snap.tableRoot.toString)
    val rootUri = graft.delta.Storage
      .fs(snap.tableRoot, spark.sessionState.newHadoopConf())
      .makeQualified(snap.tableRoot).toUri.getPath
    (1 to 2).foreach { rep =>
      val live = t(s"readEntriesDF rep$rep")(
        graft.delta.ContentTree.readEntriesDF(spark, resolved,
          snap.tableRoot.toString))
      t(s"filter+count rep$rep")(
        live.filter(col("contentType") === 0).count())
      t(s"prunedIterator rep$rep")(
        graft.delta.ContentTree.prunedAddFileIterator(spark, resolved,
          snap.tableRoot.toString, rootUri, "c0 = 12345").size)
    }
    spark.stop()
  }

  private def run5m(spark: SparkSession): Unit = {
    MetadataBench.ensureLog5m(spark)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE5M $name ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def heapMb(): Double = {
      (1 to 3).foreach(_ => System.gc())
      (Runtime.getRuntime.totalMemory -
        Runtime.getRuntime.freeMemory) / 1048576.0
    }
    val h0 = heapMb()
    val prevV = MetadataBench.NUM_COMMITS_5M - 2L
    val snapPrev = graft.delta.Snapshot.forTable(spark,
      MetadataBench.tableDir5m, Some(prevV))
    val rootPrev = t("build")(graft.delta.ContentTree.writeRoot(snapPrev))
    val snap = graft.delta.Snapshot.forTable(spark,
      MetadataBench.tableDir5m)
    val root = t("update")(
      graft.delta.ContentTree.updateRoot(snap, rootPrev))
    val resolved = root.resolve(snap.tableRoot.toString)
    val rootUri = graft.delta.Storage
      .fs(snap.tableRoot, spark.sessionState.newHadoopConf())
      .makeQualified(snap.tableRoot).toUri.getPath
    (1 to 2).foreach { rep =>
      val n = t(s"prune rep$rep")(
        graft.delta.ContentTree.prunedAddFileIterator(spark, resolved,
          snap.tableRoot.toString, rootUri, "c0 = 12345").size)
      println(s"PROBE5M pruned_files $n")
    }
    println(f"PROBE5M heap_delta_mb ${heapMb() - h0}%.1f")
    spark.stop()
  }
}

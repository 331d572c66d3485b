package graft.bench

import org.apache.spark.sql.SparkSession

/** Content-tree scale leg: build the 2-level AMT tree over the 300k-add
  * synthetic log (the kernel bench table) and plan a stats-pruned read
  * from the TREE instead of the log — the evidence that the manifest
  * hierarchy + per-entry content_stats stay usable at catalog scale
  * (reference content_tree/mod.rs is motivated by exactly this size
  * class). Runs ONCE per sweep: the numbers are scale properties, not
  * drift trackers.
  *
  *  - tree_build_300k: full writeRoot at tip−2 (distributed leaf
  *    writes + root manifest)
  *  - tree_update_300k: incremental updateRoot across the last two
  *    commits (20k adds) — maintenance must cost O(diff ⋈ tree),
  *    never a rebuild
  *  - tree_prune_300k: prunedAddFileIterator on the MAINTAINED tree
  *    under `c0 = <point>`
  *  - tree_pruned_ratio_300k: surviving/total files — the skipping
  *    power gauge (excluded from the headline total like every ratio)
  */
object TreeBench {

  def run(spark: SparkSession): Map[String, Double] = {
    MetadataBench.ensureLog(spark)
    // warm the entry-projection codegen (the ~720-leaf generated class
    // costs ~15 s to compile on first use) — the legs below run ONCE
    // per sweep and measure tree work, not JIT; same policy as Bench's
    // JVM warmup query. Version 1, NOT 0: v0 is the 7 KB metadata
    // commit, under the 4 MiB driver-replay cap, so its plan fuses the
    // projection over a LocalTableScan — a DIFFERENT generated class
    // than the distributed-replay arm the timed legs compile. v1's one
    // 10 MB commit takes the distributed arm at 1/29th the work.
    val warmRoot = graft.delta.ContentTree.writeRoot(
      graft.delta.Snapshot.forTable(spark, MetadataBench.tableDir,
        Some(1L)))
    // full build two commits back, then the incremental path advances
    // the tree across 20k fresh adds — maintenance at catalog scale
    // must cost O(diff ⋈ tree), never a rebuild
    val prevV = MetadataBench.NUM_COMMITS - 2L
    val snapPrev = graft.delta.Snapshot.forTable(spark,
      MetadataBench.tableDir, Some(prevV))
    var t0 = System.nanoTime()
    val rootPrev = graft.delta.ContentTree.writeRoot(snapPrev)
    val build = (System.nanoTime() - t0) / 1e9
    val snap = graft.delta.Snapshot.forTable(spark, MetadataBench.tableDir)
    t0 = System.nanoTime()
    val root = graft.delta.ContentTree.updateRoot(snap, rootPrev)
    val update = (System.nanoTime() - t0) / 1e9
    // the pruned read plans from the MAINTAINED tree: correctness of
    // skipping over diff-applied entries, at size
    val resolved = root.resolve(snap.tableRoot.toString)
    val rootUri = graft.delta.Storage
      .fs(snap.tableRoot, spark.sessionState.newHadoopConf())
      .makeQualified(snap.tableRoot).toUri.getPath
    t0 = System.nanoTime()
    val pruned = graft.delta.ContentTree.prunedAddFileIterator(spark,
      resolved, snap.tableRoot.toString, rootUri, "c0 = 12345").size
    val prune = (System.nanoTime() - t0) / 1e9
    // delete the trees AFTER timing: each leg used to leave ~140 MB of
    // leaf parquet in the fixture dir per sweep (1.3 GB found leaked
    // after a probe-heavy session) — disk growth plus page-cache churn
    // the 5M legs then feel. The updated root references the base
    // tree's leaves, so both go together once the prune is timed.
    val fs = graft.delta.Storage.fs(snap.tableRoot,
      spark.sessionState.newHadoopConf())
    Seq(warmRoot, root, rootPrev).foreach { r =>
      fs.delete(new org.apache.hadoop.fs.Path(
        r.resolve(snap.tableRoot.toString)).getParent, true)
    }
    val total = MetadataBench.NUM_COMMITS.toLong *
      MetadataBench.ADDS_PER_COMMIT
    Map(
      "tree_build_300k" -> build,
      "tree_update_300k" -> update,
      "tree_prune_300k" -> prune,
      "tree_pruned_ratio_300k" -> pruned.toDouble / total)
  }

  def main(args: Array[String]): Unit = {
    // GRAFT_TREE_PHASES=1: print per-phase TREEPHASE lines (forensics)
    if (sys.env.get("GRAFT_TREE_PHASES").contains("1"))
      sys.props("graft.tree.phaseTimings") = "true"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach(i => println(s"TREEBENCH rep$i ${run(s)}"))
    s.stop()
  }
}

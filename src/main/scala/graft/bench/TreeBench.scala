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
  *  - tree_build_300k: writeRoot (distributed leaf writes + root)
  *  - tree_prune_300k: prunedAddFileIterator under `c0 = <point>`
  *  - tree_pruned_ratio_300k: surviving/total files — the skipping
  *    power gauge (excluded from the headline total like every ratio)
  */
object TreeBench {

  def run(spark: SparkSession): Map[String, Double] = {
    MetadataBench.ensureLog(spark)
    val snap = graft.delta.Snapshot.forTable(spark, MetadataBench.tableDir)
    var t0 = System.nanoTime()
    val root = graft.delta.ContentTree.writeRoot(snap)
    val build = (System.nanoTime() - t0) / 1e9
    val resolved = root.resolve(snap.tableRoot.toString)
    val rootUri = graft.delta.Storage
      .fs(snap.tableRoot, spark.sessionState.newHadoopConf())
      .makeQualified(snap.tableRoot).toUri.getPath
    t0 = System.nanoTime()
    val pruned = graft.delta.ContentTree.prunedAddFileIterator(spark,
      resolved, snap.tableRoot.toString, rootUri,
      snap.dataSchema, "c0 = 12345").size
    val prune = (System.nanoTime() - t0) / 1e9
    val total = MetadataBench.NUM_COMMITS.toLong *
      MetadataBench.ADDS_PER_COMMIT
    Map(
      "tree_build_300k" -> build,
      "tree_prune_300k" -> prune,
      "tree_pruned_ratio_300k" -> pruned.toDouble / total)
  }

  def main(args: Array[String]): Unit = {
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

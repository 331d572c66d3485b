package graft.bench

// quick driver for the 5M bench leg only (pass "profile" to break the
// planning time into phases)
object Bench5mProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tg0 = System.nanoTime()
    MetadataBench.ensureLog5m(spark)
    println(f"gen+ckpt: ${(System.nanoTime() - tg0) / 1e9}%.1f s")
    if (args.contains("profile")) profile(spark)
    else println(MetadataBench.run5m(spark))
    spark.stop()
  }

  private def profile(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.delta._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val snap = t("snapshot") {
      Snapshot.forTable(spark, MetadataBench.tableDir5m)
    }
    val scan0 = new DeltaScan(snap, Some("p = '7' AND c0 >= 0"))
    t("filesDF.count (pure distributed)") { scan0.filesDF.count() }
    val scanW = new DeltaScan(snap, Some("p = '7' AND c0 >= 0"))
    t("filesDF.count warm") { scanW.filesDF.count() }
    val scan = new DeltaScan(snap, Some("p = '7' AND c0 >= 0"))
    val n = t("drain addFileIterator") { scan.addFileIterator().size }
    println(s"  ($n slim adds)")
    val scan2 = new DeltaScan(snap, Some("p = '7' AND c0 >= 0"))
    val df = t("toDF (index build + logical plan)") { scan2.toDF }
    t("physical planning (selectedPartitions)") {
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    }
  }
}

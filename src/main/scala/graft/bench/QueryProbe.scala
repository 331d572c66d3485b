package graft.bench

import org.apache.spark.sql.SparkSession

// Standalone single-query timer for A/B drift triage (run a named
// SparkEntry query N times and print each wall time). Not part of the
// library.
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.env.getOrElse("GRAFT_QUERY", "q1_agg"))
    val reps = sys.env.getOrElse("GRAFT_REPS", "3").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.count()
      println(f"PROBE $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}

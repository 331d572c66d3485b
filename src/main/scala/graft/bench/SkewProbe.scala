package graft.bench

import org.apache.spark.sql.SparkSession

// Standalone runner for the shuffle-skew canary (drift triage without
// the full Bench sweep). Not part of the library.
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("SKEW=" + SkewCanary.run(spark, sfDir).toSeq.sorted)
    spark.stop()
  }
}

package graft.bench

import org.apache.spark.sql.SparkSession

// Standalone runner for the bench/workloads spec matrix (expectation
// validation without a full sweep). Not part of the library.
object WlProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Workloads.run(spark).toSeq.sortBy(_._1)
      .foreach { case (k, v) => println(f"$k%-45s $v%.3f") }
    spark.stop()
  }
}

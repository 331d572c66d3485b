package graft.bench

import org.apache.spark.sql.SparkSession

// Temporary: metadata/workload benches alone, for drift triage without
// the full Bench sweep. Not part of the library.
object MetaOnly {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val reps = sys.env.getOrElse("GRAFT_META_REPS", "3").toInt
    val only5m = sys.env.get("GRAFT_META_5M").exists(_ == "1")
    (1 to reps).foreach { i =>
      val m =
        if (only5m) MetadataBench.run5m(spark)
        else MetadataBench.run(spark) ++ Workloads.run(spark)
      println(s"META rep $i: " + m.toSeq.sortBy(_._1)
        .map { case (k, v) => f"$k=$v%.3f" }.mkString(" "))
    }
    spark.stop()
  }
}

package graft.bench

import org.apache.spark.sql.SparkSession

// Metadata/workload benches alone, in their own JVM. Two uses:
//  - drift triage without the full Bench sweep (manual)
//  - the GATE-SAFE path for the 5M planning frontier: Bench spawns this
//    as a child process with GRAFT_META_5M=1 so the measurement never
//    shares a heap/page-cache with the ~280s query sweep (in-JVM
//    reordering still produced a 5x phantom in round 10: 18.5s median
//    vs 3.3s isolated). Bench parses the METAJSON lines below.
// Not part of the library.
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
    // fixture build + page-cache warm + one untimed plan pass BEFORE
    // any timed rep — the r9-r12 plan_df_5m phantoms were cold fixture
    // I/O charged to the timed window (see MetadataBench.warm5m)
    if (only5m) MetadataBench.warm5m(spark)
    (1 to reps).foreach { i =>
      val m =
        if (only5m) MetadataBench.run5m(spark)
        else MetadataBench.run(spark) ++ Workloads.run(spark)
      println(s"META rep $i: " + m.toSeq.sortBy(_._1)
        .map { case (k, v) => f"$k=$v%.3f" }.mkString(" "))
      // machine-readable per-rep line for the parent Bench JVM
      println("METAJSON " + m.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    }
    spark.stop()
  }
}

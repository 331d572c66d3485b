package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md).
  * Every `SparkEntry.queries` entry receives an `sfDir` and resolves
  * tables through here so sf0.001/0.01/0.1 are interchangeable.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark has no type for;
      // read the raw int64 nanos and rescale to a microsecond timestamp
      // (sub-microsecond components are zero in this corpus). The conf is
      // also set in the Verify/Bench/test session builders; this guard
      // only covers ad-hoc sessions and avoids re-setting per call.
      if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
            .forall(_ != "true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      df
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}

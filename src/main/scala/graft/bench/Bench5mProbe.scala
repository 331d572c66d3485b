// quick driver for the 5M bench leg only
object Bench5mProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tg0 = System.nanoTime()
    graft.bench.MetadataBench.ensureLog5m(spark)
    println(f"gen+ckpt: ${(System.nanoTime()-tg0)/1e9}%.1f s")
    val r = graft.bench.MetadataBench.run5m(spark)
    println(r)
    spark.stop()
  }
}

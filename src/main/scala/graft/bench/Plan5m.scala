package graft.bench
import org.apache.spark.sql.SparkSession
object Plan5m {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("RESULT5M=" + MetadataBench.run5m(spark))
    spark.stop()
  }
}

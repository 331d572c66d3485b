package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.delta.{ContentTree, DeltaTable}
import graft.streaming.CdcIngest

/** Throwaway per-step profiler for q_cdc_ingest. */
object CdcProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.range(1000000).selectExpr("sum(id)").collect()

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def step[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val j0 = jobs.get()
      val r = f
      Thread.sleep(20)
      println(f"STEP $name%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  jobs=${jobs.get() - j0}%3d")
      r
    }

    val liCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val dir = java.nio.file.Files.createTempDirectory("cdcprobe").toString
      val src = Tables.load(s, d, "lineitem")
        .select(liCols.map(col): _*).filter(col("l_quantity") < 8)
      DeltaTable.create(s, dir, src.schema)
      val t = DeltaTable.forPath(s, dir)
      var root = step("writeRoot")(ContentTree.writeRoot(t.snapshot(), 4))
      def b(df: org.apache.spark.sql.DataFrame, id: Long, label: String)
          : Unit =
        root = step(label)(CdcIngest.processBatch(t, root, df,
          Seq(0, 3, 1), appId = "cdc-probe", batchId = id))
      val up = lit(CdcIngest.UPSERT)
      val dl = lit(CdcIngest.DELETE)
      b(src.filter(col("l_quantity") < 5).withColumn("_op", up), 0L, "b0-load")
      b(src.filter(col("l_quantity") < 5 && col("l_orderkey") % 3 === 0)
        .withColumn("l_tax", lit(0.0)).withColumn("_op", up)
        .unionByName(src.filter(col("l_quantity") < 5 &&
            col("l_orderkey") % 5 === 0 && col("l_orderkey") % 3 =!= 0)
          .withColumn("_op", dl)), 1L, "b1-mixed")
      b(src.filter(col("l_quantity") >= 5).withColumn("_op", up), 2L, "b2-fresh")
      b(src.filter(col("l_orderkey") % 7 === 0).withColumn("_op", dl),
        3L, "b3-puredel")
      b(src.filter(col("l_quantity") >= 5).withColumn("_op", up), 2L, "b2-replay")
      step("read")(CdcIngest.currentState(t, root).count())
    }
    s.stop()
  }
}

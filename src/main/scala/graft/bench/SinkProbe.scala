package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.delta.{DeltaTable, RowTracking, TableChanges}

/** Throwaway per-step profiler for q_delta_kitchen_sink. */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val jobMs = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          stages.addAndGet(j.stageInfos.size)
          starts.put(j.jobId, j.time)
          descs.put(j.jobId,
            Option(j.properties).map(p => String.valueOf(
              p.getProperty("spark.job.description"))).getOrElse("") +
            " | " + j.stageInfos.map(_.name.takeWhile(_ != '\n'))
              .mkString(" ; ").take(180))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId)).foreach { t0 =>
            jobMs.addAndGet(j.time - t0)
            println(f"  JOB ${j.jobId}%3d ${(j.time - t0) / 1e3}%.3f s " +
              descs.getOrDefault(j.jobId, ""))
          }
        }
      })

    def step[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val (j0, g0, m0) = (jobs.get(), stages.get(), jobMs.get())
      val r = f
      Thread.sleep(30) // let job-end events drain
      println(f"STEP $name%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  jobs=${jobs.get() - j0}%3d stages=${stages.get() - g0}%3d" +
        f"  injob=${(jobMs.get() - m0) / 1e3}%.3f s")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val dir = java.nio.file.Files.createTempDirectory("sinkprobe").toString
      val src = Tables.load(s, d, "lineitem").filter(col("l_quantity") < 12)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag").persist()
      step("create") {
        DeltaTable.create(s, dir, src.schema, Nil,
          Map("delta.columnMapping.mode" -> "name",
            TableChanges.CDF_ENABLED_KEY -> "true",
            RowTracking.ENABLED_KEY -> "true"),
          clusterBy = Seq("l_orderkey"))
      }
      val t = DeltaTable.forPath(s, dir)
      step("append1") { t.append(src.filter(col("l_quantity") < 6)) }
      step("append2") { t.append(src.filter(col("l_quantity") >= 6)) }
      src.unpersist()
      step("deleteDV") {
        t.deleteWhereDV("l_returnflag = 'A' AND l_quantity < 3") }
      step("update") { t.updateWhere("l_quantity >= 10",
        Map("l_extendedprice" -> "l_extendedprice + 1.0")) }
      step("rename") { t.renameColumn(Seq("l_extendedprice"), "price") }
      step("optimize") { t.optimizeClustered() }
      step("checkpoint") { t.checkpoint() }
      step("delete") { t.deleteWhere("l_quantity >= 11") }
      step("cdf14") { TableChanges.read(s, dir, 1, Some(4)).isEmpty }
      step("cdfFail") {
        scala.util.Try(TableChanges.read(s, dir, 1, None).count()) }
      val fresh = DeltaTable.forPath(s, dir)
      step("read") {
        fresh.toDF.select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("price"), col("l_returnflag"))
          .orderBy(col("l_orderkey"), col("l_linenumber")).count()
      }
    }
    s.stop()
  }
}

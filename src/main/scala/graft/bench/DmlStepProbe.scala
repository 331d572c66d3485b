package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Step-attribution probe for the multi-commit DML bench rows
// (q_delta_auto_compact / q_delta_merge_evolve / q_delta_props) — not
// part of the library. Mirrors each row's steps with per-step wall
// timing and a per-step Spark JOB count, so optimization targets the
// fixed cost that actually dominates (r12 VERDICT item 6: the cost is
// N commits x ~0.5 s fixed job cost; attack the fixed cost itself).
object DmlStepProbe {

  private val jobs = new java.util.concurrent.atomic.AtomicInteger(0)

  private def t[A](name: String)(f: => A): A = {
    val j0 = jobs.get()
    val t0 = System.nanoTime()
    val r = f
    Thread.sleep(50) // listener events are async; let the count land
    println(f"STEP $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  jobs=${jobs.get() - j0}")
    r
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("ac")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val verbose = sys.env.get("GRAFT_PROBE_JOBS").contains("1")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (verbose) {
            val site = s.stageInfos.lastOption.map(_.name).getOrElse("?")
            println(s"  JOB ${s.jobId} stages=${s.stageInfos.size} $site")
          }
        }
      })
    val reps = sys.env.getOrElse("GRAFT_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"--- $which rep $rep ---")
      val tAll = System.nanoTime()
      which match {
        case "ac" => runAutoCompact(spark, d)
        case "mev" => runMergeEvolve(spark, d)
        case "props" => runProps(spark, d)
        case other =>
          t(s"full-row $other")(graft.SparkEntry.queries(other)(spark, d)
            .queryExecution.toRdd.count())
      }
      println(f"TOTAL ${(System.nanoTime() - tAll) / 1e9}%.2f s")
    }
    spark.stop()
  }

  private def runAutoCompact(s: SparkSession, d: String): Unit = {
    val dir = "/root/repo/target/tmp/acprobe-" + System.nanoTime()
    val src = graft.Tables.load(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_returnflag"))
    t("create") {
      graft.delta.DeltaTable.create(s, dir, src.schema,
        Seq("l_returnflag"), configuration = Map(
          graft.delta.DeltaTable.OPTIMIZE_WRITE_KEY -> "true",
          graft.delta.DeltaTable.AUTO_COMPACT_KEY -> "true"))
    }
    val tab = graft.delta.DeltaTable.forPath(s, dir)
    s.conf.set("spark.graft.autoCompact.minNumFiles", "3")
    try (1 to 6).foreach(i =>
      t(s"append-$i")(tab.append(src.filter(col("l_linenumber") === i))))
    finally s.conf.unset("spark.graft.autoCompact.minNumFiles")
    t("scan+agg") {
      val filesOk = tab.scan(None).collectAddFiles().size <= 6
      tab.toDF.agg(count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("n_keys"),
        min(col("l_quantity")).as("min_q"),
        max(col("l_quantity")).as("max_q"))
        .withColumn("files_bounded", lit(filesOk))
        .queryExecution.toRdd.count()
    }
  }

  private def runMergeEvolve(s: SparkSession, d: String): Unit = {
    s.conf.set("spark.sql.catalog.gd_mev", "graft.sql.GraftDeltaCatalog")
    s.conf.set("spark.sql.catalog.gd_mev.warehouse",
      "/root/repo/target/tmp/gd-warehouse")
    val id = java.util.UUID.randomUUID().toString.take(8)
    val tbl = s"gd_mev.default.mevp_$id"
    val view = s"li_mevp_$id"
    graft.Tables.load(s, d, "lineitem").createOrReplaceTempView(view)
    t("ctas") {
      s.sql(s"""CREATE TABLE $tbl USING `graft-delta` AS
        SELECT l_orderkey,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_total
        FROM $view WHERE l_quantity < 10 GROUP BY l_orderkey""")
    }
    t("merge") {
      s.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $tbl AS t USING
        (SELECT l_orderkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_hi,
           count(*) AS n_hi
         FROM $view WHERE l_quantity >= 10 AND l_quantity < 14
         GROUP BY l_orderkey) AS u
        ON t.l_orderkey = u.l_orderkey
        WHEN MATCHED THEN UPDATE SET q_total = t.q_total + u.q_hi,
          n_hi = u.n_hi
        WHEN NOT MATCHED THEN INSERT (l_orderkey, q_total, n_hi)
          VALUES (u.l_orderkey, u.q_hi, u.n_hi)""")
    }
    t("read") {
      s.sql(s"SELECT l_orderkey, q_total, n_hi FROM $tbl ORDER BY l_orderkey")
        .queryExecution.toRdd.count()
    }
  }

  private def runProps(s: SparkSession, d: String): Unit = {
    val dir = "/root/repo/target/tmp/propsprobe-" + System.nanoTime()
    val src = graft.Tables.load(s, d, "lineitem")
      .filter(col("l_quantity") < 12)
    t("create+2appends") {
      graft.delta.DeltaTable.create(s, dir, src.schema,
        Seq("l_returnflag"), Map(
          graft.delta.TableProperties.PARQUET_COMPRESSION -> "zstd",
          graft.delta.TableProperties.RANDOMIZE_FILE_PREFIXES -> "true",
          graft.delta.TableProperties.RANDOM_PREFIX_LENGTH -> "4",
          graft.delta.TableProperties.TARGET_FILE_SIZE -> "512mb",
          graft.delta.TableProperties.CHECKPOINT_POLICY -> "v2",
          graft.delta.TableProperties.WRITE_STATS_AS_STRUCT -> "true"))
      val tb = graft.delta.DeltaTable.forPath(s, dir)
      tb.append(src.filter(col("l_quantity") < 6))
      tb.append(src.filter(col("l_quantity") >= 6))
    }
    val tab = graft.delta.DeltaTable.forPath(s, dir)
    t("optimize")(tab.optimizeCompact())
    t("checkpoint")(tab.checkpoint())
    t("delete")(tab.deleteWhere("l_linestatus = 'O' AND l_quantity < 3"))
    t("fresh-read") {
      graft.delta.DeltaTable.forPath(s, dir).toDF
        .queryExecution.toRdd.count()
    }
  }
}

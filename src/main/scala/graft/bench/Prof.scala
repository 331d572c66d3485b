package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary profiling harness — not part of the library.
object Prof {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PHASE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val d = "/root/testdata/sf0.1"
    val src = graft.Tables.load(spark, d, "lineitem")
      .filter(col("l_quantity") < 15)
    t("warm-src")(src.count())

    val dir = "/tmp/prof/ck" + System.nanoTime()
    t("create")(graft.delta.DeltaTable.create(spark, dir, src.schema))
    val tb = graft.delta.DeltaTable.forPath(spark, dir)
    t("append1")(tb.append(src.filter(col("l_quantity") < 6)))
    t("append2")(tb.append(
      src.filter(col("l_quantity") >= 6 && col("l_quantity") < 11)))
    val snapPre = t("snapshot-pre")(tb.snapshot())
    t("latestActions-1")(snapPre.latestActions.count())
    t("latestActions-2")(snapPre.latestActions.count())
    t("checkpoint")(tb.checkpoint())
    t("append3")(tb.append(src.filter(col("l_quantity") >= 11)))
    t("read")(tb.toDF.orderBy("l_orderkey", "l_linenumber")
      .queryExecution.toRdd.count())
    t("read-again")(tb.toDF.orderBy("l_orderkey", "l_linenumber")
      .queryExecution.toRdd.count())

    // DELETE profile
    val dir2 = "/tmp/prof/del" + System.nanoTime()
    val src2 = graft.Tables.load(spark, d, "lineitem")
      .filter(col("l_quantity") < 10)
    t("del-create")(graft.delta.DeltaTable.create(spark, dir2, src2.schema,
      Seq("l_returnflag")))
    val tb2 = graft.delta.DeltaTable.forPath(spark, dir2)
    t("del-append")(tb2.append(src2))
    t("del-delete")(tb2.deleteWhere("l_returnflag = 'A' AND l_quantity < 5"))
    t("del-read")(tb2.toDF.orderBy("l_orderkey", "l_linenumber")
      .queryExecution.toRdd.count())

    // exact q_delta_delete replica through the bench entry point
    t("q_delta_delete")(graft.SparkEntry.queries("q_delta_delete")(spark, d)
      .queryExecution.toRdd.count())
    t("q_delta_delete-2")(graft.SparkEntry.queries("q_delta_delete")(spark, d)
      .queryExecution.toRdd.count())
    t("q_delta_merge")(graft.SparkEntry.queries("q_delta_merge")(spark, d)
      .queryExecution.toRdd.count())
    t("q_cdf_net")(graft.SparkEntry.queries("q_delta_cdf_net")(spark, d)
      .queryExecution.toRdd.count())

    // merge phase breakdown
    {
      import graft.delta.MergeClause._
      val dir3 = "/tmp/prof/mrg" + System.nanoTime()
      val base = graft.Tables.load(spark, d, "lineitem")
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(min(col("l_quantity")).as("l_quantity"))
      t("mrg-base-count")(base.count())
      val tgt0 = base.filter(col("l_quantity") < 10)
      t("mrg-create")(graft.delta.DeltaTable.create(spark, dir3, tgt0.schema))
      val t3 = graft.delta.DeltaTable.forPath(spark, dir3)
      t("mrg-append")(t3.append(tgt0))
      val src3 = base.filter(
        col("l_quantity") >= 8 && col("l_quantity") < 12)
      t("mrg-merge")(t3.merge(src3,
        "t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber",
        Seq(MatchedDelete(Some("s.l_quantity < 9")),
          MatchedUpdate(None, Map("l_quantity" -> "s.l_quantity + 100")),
          NotMatchedInsert(None, Map(
            "l_orderkey" -> "s.l_orderkey",
            "l_linenumber" -> "s.l_linenumber",
            "l_quantity" -> "s.l_quantity")))))
      t("mrg-read")(t3.toDF.queryExecution.toRdd.count())
    }
    spark.stop()
  }
}

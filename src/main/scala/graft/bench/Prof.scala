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
    val li = graft.Tables.load(spark, d, "lineitem")
    t("warm-src")(li.count())

    // ---- q_delta_format_io breakdown ----
    val dir = "/tmp/prof/fmt" + System.nanoTime()
    t("fmt-write1")(li.filter(col("l_quantity") < 8)
      .write.format("graft-delta").save(dir))
    t("fmt-write2")(li.filter(col("l_quantity") >= 8 && col("l_quantity") < 14)
      .write.format("graft-delta").mode("append").save(dir))
    val rel = t("fmt-plan")(spark.read.format("graft-delta").load(dir)
      .filter(col("l_returnflag") === "R"))
    t("fmt-read-rdd")(rel
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .queryExecution.toRdd.count())
    t("fmt-read-rdd-2")(rel
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .queryExecution.toRdd.count())
    // same table through the direct scan path, for comparison
    val tb = graft.delta.DeltaTable.forPath(spark, dir)
    t("fmt-read-direct")(tb.toDF.filter(col("l_returnflag") === "R")
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .queryExecution.toRdd.count())

    // ---- ngram jaccard stage breakdown ----
    val docs = t("jac-docs-load")(graft.Tables.load(spark, d, "documents"))
    t("jac-docs-count")(docs.count())
    val raw0 = docs
      .select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(w)-3), " +
          "i -> concat_ws(' ', w[i], w[i+1], w[i+2])))")).as("sh"))
    t("jac-shingle-count")(raw0.count())
    val raw = t("jac-localckpt")(raw0.localCheckpoint())
    val rare = raw.groupBy(col("sh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= 100).select(col("sh"))
    t("jac-rare-count")(rare.count())
    val sh = raw.join(rare, "sh")
    val pairs = sh.groupBy(col("sh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .select(explode(expr(
        "flatten(transform(docs, (a, i) -> " +
          "transform(slice(docs, i + 2, size(docs)), " +
          "b -> struct(a, b))))")).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val grouped = sh.groupBy(col("sh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
    t("jac-grouped-count")(grouped.count())
    val exploded = grouped.select(explode(expr(
      "flatten(transform(docs, (a, i) -> " +
        "transform(slice(docs, i + 2, size(docs)), " +
        "b -> struct(a, b))))")).as("p"))
    t("jac-exploded-count")(exploded.count())
    t("jac-pairs-count")(pairs.count())
    t("jac-pairs-count-2")(pairs.count())
    t("q_ngram_jaccard")(graft.SparkEntry.queries("q_ngram_jaccard")(spark, d)
      .queryExecution.toRdd.count())
    t("q_ngram_jaccard-2")(graft.SparkEntry.queries("q_ngram_jaccard")(spark, d)
      .queryExecution.toRdd.count())

    // ---- merge ----
    t("q_delta_merge")(graft.SparkEntry.queries("q_delta_merge")(spark, d)
      .queryExecution.toRdd.count())

    // phase breakdown of the merge query
    {
      import graft.delta.MergeClause._
      val dir = "/tmp/prof/mrg" + System.nanoTime()
      val base = li
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(min(col("l_quantity")).as("l_quantity"))
      val tgt0 = base.filter(col("l_quantity") < 10)
      t("mrg-create")(graft.delta.DeltaTable.create(spark, dir, tgt0.schema))
      val tb = graft.delta.DeltaTable.forPath(spark, dir)
      t("mrg-append")(tb.append(tgt0))
      val src = base.filter(
        col("l_quantity") >= 8 && col("l_quantity") < 12)
      t("mrg-merge")(tb.merge(src,
        "t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber",
        Seq(
          MatchedDelete(Some("s.l_quantity < 9")),
          MatchedUpdate(None, Map("l_quantity" -> "s.l_quantity + 100")),
          NotMatchedInsert(None, Map(
            "l_orderkey" -> "s.l_orderkey",
            "l_linenumber" -> "s.l_linenumber",
            "l_quantity" -> "s.l_quantity")))))
      t("mrg-read")(tb.toDF.queryExecution.toRdd.count())
    }

    spark.stop()
  }
}

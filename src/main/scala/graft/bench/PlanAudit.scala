package graft.bench

import org.apache.spark.sql.SparkSession

/** Prints the executed physical plan of named SparkEntry queries —
  * the `.explain("formatted")` audit loop: after a query is correct,
  * inspect its plan for shuffle waste, missing pushdown, or severed
  * codegen before calling it done.
  *
  * `sbt "runMain graft.bench.PlanAudit q_dup_spans q_semantic_dedup"`
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq
    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n===== $n =====")
          try {
            val df = fn(spark, sfDir)
            println(df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          } catch { case e: Throwable =>
            println(s"  (failed: ${e.getMessage})")
          }
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}

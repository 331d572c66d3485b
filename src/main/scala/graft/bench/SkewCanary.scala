package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Bench-only shuffle-skew canary: run the amplified minhash
  * candidate-generation plan (the sf1 stand-in — testdata ships
  * sf≤0.1) and measure PER-TASK shuffle-read bytes of the heaviest
  * shuffle stage. A hot shingle or hot band shows up as one task
  * reading a multiple of the median — the exact failure mode that
  * turns a balanced 1000-executor dedup into a one-straggler job at
  * 100 TB. Reported as `skew_ratio_*` (max/median, gauge — excluded
  * from the bench's seconds total) next to the run's wall seconds.
  */
object SkewCanary {

  def run(spark: SparkSession, sfDir: String): Map[String, Double] = {
    val perStage =
      new java.util.concurrent.ConcurrentHashMap[Int, mutable.ArrayBuffer[Long]]()
    @volatile var seen = 0
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val bytes = m.shuffleReadMetrics.totalBytesRead
          if (bytes > 0) {
            val buf = perStage.computeIfAbsent(te.stageId,
              _ => mutable.ArrayBuffer.empty[Long])
            buf.synchronized { buf += bytes }
            seen += 1
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      graft.queries.PipelineQueries
        .minhashPairsAmplified(spark, sfDir, 10)
        .queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // the listener bus drains asynchronously: poll until the event
      // count is stable rather than racing the final task-end events
      var last = -1
      var spins = 0
      while (seen != last && spins < 50) {
        last = seen; spins += 1; Thread.sleep(100)
      }
      // heaviest shuffle stage with enough tasks for a meaningful
      // median — the candidate-generation band/shingle exchange
      val target = perStage.entrySet().iterator()
      val candidates = mutable.ArrayBuffer.empty[(Int, Seq[Long])]
      while (target.hasNext) {
        val e = target.next()
        val xs = e.getValue.synchronized { e.getValue.toSeq }
        if (xs.size >= 4) candidates += e.getKey -> xs
      }
      val ratio =
        if (candidates.isEmpty) -1.0
        else {
          val xs = candidates.maxBy(_._2.sum)._2.sorted
          val median = xs(xs.size / 2).toDouble
          if (median <= 0) -1.0 else xs.last / median
        }
      Map("skew_canary_minhash_sf1" -> sec,
        "skew_ratio_minhash_sf1" -> ratio)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}

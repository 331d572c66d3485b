package graft.bench

// Manual probe: exercises Bench's child-JVM 5M-bench spawn path alone,
// without the ~280s query sweep. Not part of the library.
object Spawn5mProbe {
  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("GRAFT_META_REPS", "3").toInt
    val t0 = System.nanoTime()
    val runs = graft.Bench.spawnMeta5m(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), reps)
    val t = (System.nanoTime() - t0) / 1e9
    println(f"SPAWN5M reps=${runs.size} wall=$t%.1fs")
    runs.zipWithIndex.foreach { case (m, i) =>
      println(s"SPAWN5M rep ${i + 1}: " + m.toSeq.sortBy(_._1)
        .map { case (k, v) => f"$k=$v%.3f" }.mkString(" "))
    }
  }
}

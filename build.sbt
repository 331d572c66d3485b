ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "deltakernelrsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output goes STRAIGHT to this process's stdout/stderr
// instead of through sbt's logger: the logger prefixes every line with
// "[info] ", which breaks any line-level JSON parse of the bench's
// driver contract line ({"metric":"total",...} must be parseable as a
// bare line — 12 rounds of PERF records show the driver never managed
// to parse a prefixed line).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Default forked-JVM heap derived from PHYSICAL memory instead of a
// big-box constant: 8g starved a local[32] session (spark.memory
// .fraction 0.6 over 32 concurrent tasks ≈ 150 MB each) and the long
// bench sweep showed late-sweep GC inflation on allocation-heavy rows
// (BENCH_NOTES r12 forensics), but a hard-coded 24g would drive a
// 16 GiB dev host into swap. phys/5 capped to [4g, 24g] gives the
// 128 GiB bench box its 24g and smaller hosts a sane fraction;
// SPARK_DRIVER_MEM still overrides outright.
val defaultHeap: String = {
  val physGb =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getTotalMemorySize >> 30
    catch { case _: Throwable => 16L }
  s"${math.max(4L, math.min(24L, physGb / 5))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
)

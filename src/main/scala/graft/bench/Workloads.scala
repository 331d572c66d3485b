package graft.bench

import java.nio.file.{Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.delta.{DeltaScan, JsonLog, Snapshot}

/** Spec-driven benchmark matrix, mirroring the reference's JSON
  * workload specs (workloads/src/models.rs:188-311 +
  * benchmarks/bench-registry.json): each case is
  * `bench/workloads/{table}/{case}.json` with
  *
  *   {"type": "snapshotConstruction", "version": <optional>}
  *   {"type": "read", "predicate": <optional SQL>, "columns": [...],
  *    "version": <optional>, "expected": {"fileCount": N}}
  *
  * `read` runs as readMetadata (plan the scan, collect the slim pruned
  * file list) — the synthetic tables are log-only, which is exactly
  * what isolates metadata cost from parquet IO. Expectations are
  * VALIDATED per run, so the matrix doubles as a correctness guard:
  * a regression in pruning (wrong file count) fails the bench rather
  * than silently reporting a faster wrong plan. Per-case timings land
  * in the bench JSON as `wl_{table}_{case}`, giving per-shape
  * regression data instead of two aggregate numbers.
  */
object Workloads {

  def specRoot = "/root/repo/bench/workloads"

  private def tableLocation(name: String): Option[String] = name match {
    case "meta300k" => Some(MetadataBench.tableDir)
    case "meta1m" => Some(MetadataBench.tableDir1m)
    case _ => None
  }

  private def ensure(spark: SparkSession, table: String): Unit =
    table match {
      case "meta300k" => MetadataBench.ensureLog(spark)
      case "meta1m" => MetadataBench.ensureLog1m(spark)
      case _ => ()
    }

  /** Run every spec; returns `wl_{table}_{case}` -> seconds. A case
    * whose expectation fails maps to -1 (the driver's error marker).
    */
  def run(spark: SparkSession): Map[String, Double] = {
    val root = Paths.get(specRoot)
    if (!Files.isDirectory(root)) return Map.empty
    val tables = Files.list(root).iterator().asScala
      .filter(Files.isDirectory(_)).toSeq.sortBy(_.getFileName.toString)
    // only the 300k table participates by default generation; the 1m
    // log is generated lazily by its own cases
    tables.flatMap { tdir =>
      val table = tdir.getFileName.toString
      tableLocation(table) match {
        case None => Nil
        case Some(loc) =>
          ensure(spark, table)
          specFiles(tdir).map { sf =>
            val caseName = sf.getFileName.toString.stripSuffix(".json")
            val label = s"wl_${table}_$caseName"
            label -> runCase(spark, loc, sf)
          }
      }
    }.toMap
  }

  private def specFiles(dir: JPath): Seq[JPath] =
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .toSeq.sortBy(_.getFileName.toString)

  private def runCase(spark: SparkSession, location: String,
      specFile: JPath): Double =
    try {
      val spec = JsonLog.parseLine(
        new String(Files.readAllBytes(specFile), "UTF-8"))
      val version =
        if (spec.has("version")) Some(spec.get("version").asLong) else None
      // expected-ERROR cases (reference models.rs ExpectedError): the
      // operation must FAIL — a successful run is the regression
      val errExpected = Option(spec.get("error")).filterNot(_.isNull)
      val t0 = System.nanoTime()
      def execute(): Unit = spec.get("type").asText match {
        case "snapshotConstruction" | "snapshot" =>
          val snap = Snapshot.forTable(spark, location, version)
          require(snap.metadata.schemaString.nonEmpty, "no metadata")
          version.foreach(v => require(snap.version == v,
            s"resolved ${snap.version}, want $v"))
        case "read" =>
          val snap = Snapshot.forTable(spark, location, version)
          val pred = Option(spec.get("predicate"))
            .filterNot(_.isNull).map(_.asText)
          val expected = Option(spec.get("expected")).filterNot(_.isNull)
          def exp(k: String) = expected
            .flatMap(e => Option(e.get(k)).filterNot(_.isNull))
          // rowCount needs per-add stats, so that case plans non-slim;
          // both expectations then read off the SAME plan
          val files = new DeltaScan(snap, pred)
            .collectAddFiles(slim = exp("rowCount").isEmpty)
          exp("fileCount").foreach { fc =>
            require(files.size.toLong == fc.asLong,
              s"$specFile: planned ${files.size} files, want ${fc.asLong}")
          }
          // rowCount (ReadExpectedSuccess.row_count): for the log-only
          // bench tables this is the metadata-derived numRecords sum
          // over the planned files
          exp("rowCount").foreach { rc =>
            val missing = files.count(_.stats.isEmpty)
            require(missing == 0,
              s"$specFile: $missing planned files lack stats — " +
                "rowCount cannot be verified")
            val n = files.flatMap(_.stats)
              .map(s => JsonLog.parseLine(s).get("numRecords").asLong)
              .sum
            require(n == rc.asLong,
              s"$specFile: planned rows $n, want ${rc.asLong}")
          }
          // filesSkipped (ReadExpectedSuccess.files_skipped): planned
          // vs the UNPRUNED live file count — proves the prune prunes
          exp("filesSkipped").foreach { fs =>
            val total = new DeltaScan(snap, None)
              .collectAddFiles(slim = true).size
            require(total - files.size.toLong == fs.asLong,
              s"$specFile: skipped ${total - files.size} files, " +
                s"want ${fs.asLong}")
          }
        case other =>
          throw new IllegalArgumentException(s"unknown spec type $other")
      }
      errExpected match {
        case Some(err) =>
          val r = scala.util.Try(execute())
          require(r.isFailure,
            s"$specFile: expected an error but the operation succeeded")
          // match the FAILURE, not just any failure: an unrelated
          // breakage (bad fixture path, typo'd spec) must not pass as
          // the expected error (reference models.rs ExpectedError
          // matches the code; ours matches a message substring)
          Option(err.get("messageContains")).filterNot(_.isNull)
            .map(_.asText).foreach { sub =>
              val msg = r.failed.get.toString
              require(msg.contains(sub),
                s"$specFile: failure '$msg' does not contain '$sub'")
            }
        case None => execute()
      }
      (System.nanoTime() - t0) / 1e9
    } catch {
      case e: Throwable =>
        System.err.println(s"workload $specFile failed: $e")
        -1.0
    }
}

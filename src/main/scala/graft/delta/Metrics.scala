package graft.delta

import java.util.UUID

/** Operation metrics (reference kernel/src/metrics/ — `MetricsReporter`
  * trait in reporter.rs, `MetricEvent` enum in events.rs): significant
  * operations — log segment assembly, snapshot builds, commits, scan
  * file listing, `.crc` reads — emit typed events tagged with an
  * operation id so a reporter can correlate an operation's lifecycle.
  * Reporting is fire-and-forget: a throwing reporter never fails the
  * operation it observes.
  */
sealed trait MetricEvent { def operationId: String }

object MetricEvent {
  /** Log segment assembled (reference events.rs LogSegmentLoadSuccess). */
  case class LogSegmentLoadSuccess(operationId: String, durationNs: Long,
      version: Long, numDeltas: Int, numCheckpointParts: Int)
    extends MetricEvent

  /** Snapshot built; `pmSource` says where Protocol+Metadata came from:
    * "crc", "commit", or "checkpoint" (reference events.rs
    * SnapshotBuildSuccess + ProtocolMetadataSource).
    */
  case class SnapshotBuildSuccess(operationId: String, durationNs: Long,
      version: Long, pmSource: String) extends MetricEvent

  /** Snapshot build failed (reference events.rs SnapshotBuildFailure). */
  case class SnapshotBuildFailure(operationId: String, durationNs: Long,
      error: String) extends MetricEvent

  /** Commit landed; `attempts` counts conflict-rebase retries
    * (reference events.rs TransactionCommitSuccess).
    */
  case class TransactionCommitSuccess(operationId: String,
      durationNs: Long, version: Long, attempts: Int) extends MetricEvent

  /** Commit surfaced a conflict it could not rebase past (reference
    * events.rs TransactionCommitFailure + CommitFailureReason).
    */
  case class TransactionCommitFailure(operationId: String,
      durationNs: Long, version: Long, attempts: Int,
      reason: String) extends MetricEvent

  /** Scan file listing resolved (reference events.rs
    * ScanMetadataCompleted): how many live files survive partition
    * pruning + stats skipping for the scan's predicate.
    *
    * Per-phase sub-durations (reference ScanMetadataCompleted's
    * `dedup_visitor_time` / `predicate_eval_time`, CHANGELOG #2850),
    * adapted to Spark's execution model where replay-dedup, stats
    * parse and skip-eval run FUSED inside one distributed job:
    *  - `planNs` + `execNs` partition `durationNs` on the driver
    *    (plan = Catalyst analysis/optimization/physical planning;
    *    exec = the distributed job + row decode),
    *  - `scanExecMs` / `dedupExecMs` / `pipelineExecMs` are
    *    executor-attributed SQL-metric times harvested from the
    *    executed plan (parquet scan time, aggregation-build time of
    *    the replay dedup, whole-stage pipeline time covering the
    *    stats parse + skip filter). Executor times are summed across
    *    tasks, so they may exceed wall-clock on a parallel scan;
    *    -1 = not measured on this path.
    */
  case class ScanFilesCollected(operationId: String, durationNs: Long,
      numFiles: Int, predicate: Option[String],
      slim: Boolean = false,
      planNs: Long = -1L, execNs: Long = -1L,
      scanExecMs: Long = -1L, dedupExecMs: Long = -1L,
      pipelineExecMs: Long = -1L) extends MetricEvent

  /** A version checksum served the P&M fast path (reference events.rs
    * CrcReadSuccess).
    */
  case class CrcReadSuccess(operationId: String, version: Long)
    extends MetricEvent

  /** One CDF range read parsed one commit's JSON — emitted exactly
    * once per commit per `TableChanges.read` call, so a test can pin
    * the single-parse contract (prune + emission share the pass).
    */
  case class CdfCommitParsed(operationId: String, durationNs: Long,
      version: Long) extends MetricEvent

  /** One CDF range read finished its classify pass — `numFileActions`
    * is the count of file actions the range buffers on the DRIVER
    * (the collapsed read's memory envelope is O(this), nothing fatter;
    * a regression to buffering parsed JSON or per-commit sub-plans
    * would show up as this gauge no longer bounding driver growth).
    * Emitted exactly once per `TableChanges.read` call.
    */
  case class CdfRangeClassified(operationId: String, durationNs: Long,
      numCommits: Int, numFileActions: Long) extends MetricEvent

  /** A content-tree read handed entry rows to the driver —
    * `entryCount` is the tree's total entries per its root manifests
    * (-1 when the root doesn't record them), `shuffled` says which
    * handoff arm ran: false = small-tree one-job collect, true = the
    * slim rows crossed a shuffle boundary first (big trees MUST take
    * this arm — an unshuffled `toLocalIterator` walk re-runs the wide
    * leaf scan one partition per job). Emitted once per iterator.
    */
  case class TreeHandoff(operationId: String, entryCount: Long,
      shuffled: Boolean) extends MetricEvent

  /** One equality-delete apply (EqualityDeletes.applyDeletes):
    * `groups` = distinct equality-id sets (one anti-join each),
    * `deleteFiles`/`deleteKeys` the total descriptor count and key
    * rows across them, `broadcastGroups` how many groups fit the
    * broadcast gate — at scale the gauge that tells a kilobyte CDC
    * trickle from a delete set big enough to shuffle.
    */
  case class EqDeleteApply(operationId: String, groups: Int,
      deleteFiles: Int, deleteKeys: Long,
      broadcastGroups: Int) extends MetricEvent

  /** I/O accounting per phase (reference kernel/src/metrics/
    * metered_*.rs byte/call meters): how many FILES a phase touches
    * and how many BYTES they hold — `log_segment` (commit JSONs +
    * checkpoint parts a snapshot build reads), `tree_read` (a content
    * tree's root + leaf nodes), `data_scan` (the data files a scan
    * plans; planned bytes — column pruning reads less), `cdf_scan`
    * (every file a CDF range's scan arms may open). Write-side
    * phases mirror them: `data_write` (parquet files an append/DML
    * stages), `commit_write` (the commit JSON's bytes — log growth),
    * `checkpoint_write` (checkpoint parts + sidecars),
    * `tree_write` (a tree generation's root + freshly written leaves;
    * REUSED leaves cost nothing, which is the point of the gauge),
    * `vacuum_delete` (files/bytes a vacuum actually reclaimed —
    * whether cleanup keeps up with write amplification).
    * The 100 TB cost-attribution surface: which phase's I/O grows
    * when a table does. Phases needing extra filesystem calls to size
    * their files (`log_segment`, `commit_write`'s byte encode) emit
    * only while a reporter is registered.
    */
  case class IoBytes(operationId: String, phase: String,
      files: Long, bytes: Long) extends MetricEvent
}

/** Receives every metric event (reference metrics/reporter.rs). Keep
  * `report` cheap and non-blocking — it runs inline on the driver.
  */
trait MetricsReporter { def report(event: MetricEvent): Unit }

object NoOpReporter extends MetricsReporter {
  override def report(event: MetricEvent): Unit = ()
}

/** Collects events in memory for tests and programmatic inspection
  * (the reference models the same in its doctest reporters).
  */
class InMemoryReporter extends MetricsReporter {
  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[MetricEvent]()
  override def report(event: MetricEvent): Unit = buf.add(event)
  def events: Seq[MetricEvent] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[MetricEvent]
    buf.forEach(e => out += e)
    out.toSeq
  }
  def clear(): Unit = buf.clear()
}

object Metrics {
  /** The process-global reporter; default drops everything. Composite
    * reporting = a reporter that fans out (reference metrics/mod.rs
    * composite example).
    */
  @volatile var reporter: MetricsReporter = NoOpReporter

  def newId(): String = UUID.randomUUID().toString

  def report(e: MetricEvent): Unit =
    try reporter.report(e) catch { case _: Exception => () }

  def now(): Long = System.nanoTime()
}

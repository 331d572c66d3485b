package graft.delta

import org.apache.hadoop.fs.{FileSystem, Path}

import FileNames._

/** The contiguous slice of `_delta_log` backing a snapshot at `version`:
  * the newest complete checkpoint at or below the target plus every
  * commit after it (reference: kernel/src/log_segment/mod.rs:98-330).
  */
case class LogSegment(
    logDir: Path,
    version: Long,
    /** ascending commit files in (checkpointVersion, version] */
    commits: Seq[CommitFile],
    /** all parts of the chosen checkpoint (empty if none) */
    checkpointParts: Seq[CheckpointFile],
    checkpointVersion: Option[Long])

object LogSegment {

  case class LastCheckpointHint(version: Long, size: Option[Long],
      parts: Option[Int])

  /** Read the `_last_checkpoint` hint (reference:
    * kernel/src/last_checkpoint_hint.rs). Corrupt/missing → None; the
    * hint is an optimization, never trusted for correctness.
    */
  def readLastCheckpointHint(fs: FileSystem, logDir: Path): Option[LastCheckpointHint] =
    try {
      val p = new Path(logDir, LAST_CHECKPOINT)
      if (!fs.exists(p)) None
      else {
        val n = JsonLog.parseLine(Storage.readLines(fs, p).mkString)
        Some(LastCheckpointHint(
          n.get("version").asLong,
          Option(n.get("size")).map(_.asLong),
          Option(n.get("parts")).map(_.asInt)))
      }
    } catch { case _: Exception => None }

  /** Assemble the segment for `targetVersion` (None = latest).
    *
    * Listing starts from the `_last_checkpoint` hint when one is usable
    * (reference last_checkpoint_hint.rs — the hint is a listing
    * optimization, never trusted for correctness: any failure to build a
    * valid segment from the partial listing falls back to a full
    * listing). Validation mirrors log_segment/mod.rs:203-330: commits
    * must be contiguous, must connect to the checkpoint (or reach
    * version 0), and the target version must exist.
    */
  def forVersion(fs: FileSystem, logDir: Path,
      targetVersion: Option[Long] = None): LogSegment = {
    val hinted = readLastCheckpointHint(fs, logDir)
      .filter(h => targetVersion.forall(_ >= h.version))
      .flatMap { h =>
        try {
          Some(assemble(
            Storage.listSortedFrom(fs, logDir, f"${h.version}%020d")
              .flatMap(st => FileNames.parse(st.getPath)),
            targetVersion))
        } catch { case _: IllegalStateException => None }
      }
    hinted.getOrElse(assemble(
      Storage.listSorted(fs, logDir).flatMap(st => FileNames.parse(st.getPath)),
      targetVersion))
  }

  private def assemble(listed: Seq[LogFile],
      targetVersion: Option[Long]): LogSegment = {
    if (listed.isEmpty)
      throw new IllegalStateException("no delta log entries in listing")
    val logDir = listed.head.path.getParent

    val inRange: LogFile => Boolean = lf =>
      targetVersion.forall(lf.version <= _)

    val commits = listed.collect {
      case c: CommitFile if inRange(c) => c
    }.sortBy(_.version)

    // complete checkpoints only: all numParts present
    val ckptGroups = listed.collect {
      case c: CheckpointFile if inRange(c) && !c.isV2 => c
    }.groupBy(_.version)
    val completeCkpts = ckptGroups.filter { case (_, parts) =>
      parts.map(_.part).distinct.size == parts.head.numParts
    }
    val chosenCkpt = completeCkpts.keys.toSeq.sorted.lastOption

    val tail = chosenCkpt match {
      case Some(cv) => commits.filter(_.version > cv)
      case None => commits
    }

    // contiguity validation
    val expectedStart = chosenCkpt.map(_ + 1).getOrElse(0L)
    tail.headOption.foreach { h =>
      if (h.version != expectedStart && chosenCkpt.isEmpty)
        throw new IllegalStateException(
          s"log starts at version ${h.version}, expected 0 (no checkpoint)")
    }
    tail.zipWithIndex.foreach { case (c, i) =>
      val expected = tail.head.version + i
      if (c.version != expected)
        throw new IllegalStateException(
          s"missing commit version $expected in $logDir")
    }
    chosenCkpt.foreach { cv =>
      tail.headOption.foreach { h =>
        if (h.version != cv + 1)
          throw new IllegalStateException(
            s"commit gap after checkpoint $cv: next commit is ${h.version}")
      }
    }

    val version = (tail.lastOption.map(_.version), chosenCkpt) match {
      case (Some(v), _) => v
      case (None, Some(cv)) => cv
      case (None, None) =>
        throw new IllegalStateException(s"no usable log entries at $logDir")
    }
    targetVersion.foreach { tv =>
      if (version != tv)
        throw new IllegalArgumentException(
          s"requested version $tv not available (latest reachable: $version)")
    }

    LogSegment(logDir, version, tail,
      chosenCkpt.map(cv => completeCkpts(cv).sortBy(_.part)).getOrElse(Nil),
      chosenCkpt)
  }
}

package graft.delta

import org.apache.hadoop.fs.{FileSystem, Path}

/** Per-version `.crc` checksum files (reference kernel/src/crc/ —
  * mod.rs, delta.rs): a JSON snapshot summary written best-effort after
  * each commit, holding table size, file count, and P&M. Readers use it
  * as a fast path — a valid `.crc` at the snapshot version supplies
  * Protocol+Metadata without any log replay; it is never REQUIRED for
  * correctness (corrupt/missing ⇒ fall back to replay).
  */
object Checksum {

  case class VersionChecksum(
      tableSizeBytes: Long,
      numFiles: Long,
      protocol: Protocol,
      metadata: Metadata,
      fileSizeHistogram: Option[FileSizeHistogram] = None)

  def path(logDir: Path, version: Long): Path =
    new Path(logDir, f"$version%020d.crc")

  def read(fs: FileSystem, logDir: Path,
      version: Long): Option[VersionChecksum] =
    try {
      val p = path(logDir, version)
      if (!fs.exists(p)) None
      else {
        val n = JsonLog.parseLine(Storage.readLines(fs, p).mkString)
        Some(VersionChecksum(
          n.get("tableSizeBytes").asLong,
          n.get("numFiles").asLong,
          JsonLog.parseProtocol(n.get("protocol")),
          JsonLog.parseMetadata(n.get("metadata")),
          Option(n.get("fileSizeHistogram")).filterNot(_.isNull)
            .flatMap(FileSizeHistogram.fromJson)))
      }
    } catch { case _: Exception => None }

  def write(fs: FileSystem, logDir: Path, version: Long,
      c: VersionChecksum): Unit =
    Storage.put(fs, path(logDir, version),
      s"""{"tableSizeBytes":${c.tableSizeBytes},""" +
        s""""numFiles":${c.numFiles},""" +
        c.fileSizeHistogram.map(h =>
          s""""fileSizeHistogram":${h.toJson},""").getOrElse("") +
        s""""protocol":${JsonLog.writeProtocol(c.protocol)},""" +
        s""""metadata":${JsonLog.writeMetadata(c.metadata)}}""")
}

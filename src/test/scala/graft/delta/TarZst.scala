package graft.delta

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import com.github.luben.zstd.ZstdInputStream
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream

/** In-JVM `.tar.zst` extraction for the reference fixture archives.
  * zstd-jni + commons-compress ship with Spark, so the suites no
  * longer depend on a system `unzstd` binary being installed (the
  * previous `tar --use-compress-program=unzstd` shell-out broke on
  * hosts without one).
  */
object TarZst {

  /** Extracts `archive` under `destRoot`; returns false only when the
    * archive file is missing. Corrupt streams, path-traversal entries,
    * and link entries THROW with the failing entry named — a silent
    * false would bury the cause (and a traversal entry is a signal
    * that must never be reduced to "failed to extract").
    */
  def extract(archive: String, destRoot: String): Boolean = {
    val src = Paths.get(archive)
    if (!Files.isRegularFile(src)) return false
    val root = Paths.get(destRoot).toAbsolutePath.normalize
    Files.createDirectories(root)
    val in = new TarArchiveInputStream(
      new ZstdInputStream(
        new java.io.BufferedInputStream(Files.newInputStream(src))))
    try {
      var e = in.getNextEntry
      while (e != null) {
        val out = root.resolve(e.getName).normalize
        require(out.startsWith(root), s"entry escapes dest: ${e.getName}")
        // tar stores no data for links: copying the stream would
        // silently write an empty file where content belongs
        require(!e.isSymbolicLink && !e.isLink,
          s"link entry unsupported in fixture archives: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(out)
        else {
          Files.createDirectories(out.getParent)
          Files.copy(in, out, StandardCopyOption.REPLACE_EXISTING)
        }
        e = in.getNextEntry
      }
      true
    } catch {
      case ex: java.io.IOException =>
        throw new IllegalStateException(
          s"corrupt fixture archive $archive: ${ex.getMessage}", ex)
    } finally in.close()
  }
}

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

  /** Extracts `archive` under `destRoot`; returns false on any error
    * (missing archive, corrupt stream), leaving partial output for
    * the caller's existing `require` to report.
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
        if (e.isDirectory) Files.createDirectories(out)
        else {
          Files.createDirectories(out.getParent)
          Files.copy(in, out, StandardCopyOption.REPLACE_EXISTING)
        }
        e = in.getNextEntry
      }
      true
    } catch {
      case _: Exception => false
    } finally in.close()
  }
}

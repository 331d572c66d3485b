package graft.delta

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** The conditional-put surface an object store exposes for atomic
  * commits: S3 `If-None-Match: *`, GCS `x-goog-if-generation-match: 0`,
  * ADLS `If-None-Match: *`. One single-shot PUT of the full object that
  * succeeds iff the key does not exist — no temp files, no rename, no
  * directory semantics (reference kernel/src/lib.rs:636-642
  * `StorageHandler::put(overwrite = false)` contract, which the
  * FileSystemCommitter builds its commit on,
  * committer/filesystem.rs:31-68).
  */
trait ConditionalPutStore {
  /** Atomically create `key` with `bytes`; false iff the key already
    * exists (the caller lost the race). Any other failure must THROW —
    * mapping a storage fault to "lost" would make a commit loop read a
    * non-existent winner.
    */
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean
  /** Full object content, when the key exists. */
  def get(key: String): Option[Array[Byte]]
  /** Keys under `prefix`, lexicographic (UTF-8 byte order — the
    * StorageHandler::list_from contract).
    */
  def list(prefix: String): Seq[String]
  /** Idempotent delete (StorageHandler::delete contract). */
  def delete(key: String): Unit
}

/** In-memory store with S3 semantics: atomic conditional puts,
  * immediate read-after-write visibility, flat keyspace, lexicographic
  * listing (reference object_store::memory::InMemory, which the
  * committer contract tests run against).
  */
class InMemoryObjectStore extends ConditionalPutStore {
  private val objects = new ConcurrentHashMap[String, Array[Byte]]()

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    objects.putIfAbsent(key, bytes.clone()) == null

  override def get(key: String): Option[Array[Byte]] =
    Option(objects.get(key)).map(_.clone())

  override def list(prefix: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala.filter(_.startsWith(prefix)).toSeq.sorted
  }

  override def delete(key: String): Unit = { objects.remove(key); () }
}

/** Commit authority for object-store tables (reference
  * committer/filesystem.rs `FileSystemCommitter` running over a
  * conditional-put StorageHandler): the commit IS one conditional PUT
  * of the full commit file. Exactly one writer per version can win;
  * everyone else observes `Conflict` and rebases.
  *
  * The store is authoritative for the race. Because this sandbox reads
  * the log back through a Hadoop [[FileSystem]], the winning content is
  * mirrored to the published path after the PUT — on a real object
  * store the PUT object IS the file, so the mirror step disappears and
  * nothing else changes. `commit` only returns (either way) once the
  * winner is visible through the filesystem, preserving the
  * read-after-write guarantee the real store gives.
  */
class ObjectStoreCommitter(store: ConditionalPutStore) extends Committer {

  private def key(logDir: Path, version: Long): String =
    FileNames.commitFile(logDir, version).toUri.getPath

  override def commit(fs: FileSystem, logDir: Path, version: Long,
      content: String): CommitResponse = {
    val dest = FileNames.commitFile(logDir, version)
    val bytes = content.getBytes(UTF_8)
    if (store.putIfAbsent(key(logDir, version), bytes)) {
      // we ARE the winner: only the winner ever writes this path.
      // Mirror via temp file + atomic rename — fs.create(dest) would
      // make the path visible the instant the stream OPENS, so a
      // loser's exists() poll could observe an empty or half-written
      // commit file. After rename, exists ⇒ fully written.
      val tmp = new Path(logDir,
        s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
      val out = fs.create(tmp, /*overwrite=*/ true)
      try out.write(bytes) finally out.close()
      if (!fs.rename(tmp, dest)) {
        fs.delete(tmp, false)
        throw new java.io.IOException(
          s"failed to publish won commit $version to $dest")
      }
      CommitResponse.Committed(version, dest)
    } else {
      // lost: wait out the winner's mirror so the caller's conflict
      // read can't race a half-published file (real object stores are
      // read-after-write; only the fake's mirror needs this)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!fs.exists(dest)) {
        if (System.nanoTime() > deadline)
          throw new java.io.IOException(
            s"winner of version $version never became visible at $dest")
        Thread.sleep(1)
      }
      CommitResponse.Conflict(version)
    }
  }

  override def isCatalogCommitter: Boolean = false

  override def publish(fs: FileSystem, logDir: Path,
      commits: Seq[CatalogCommit]): Unit =
    require(commits.isEmpty,
      "the object-store committer does not support publishing catalog " +
        "commits")
}

package graft.delta

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}

/** Catalog-managed tables (reference: kernel/src/committer/mod.rs,
  * commit_types.rs, publish_types.rs; kernel/src/log_path.rs;
  * kernel/src/snapshot/builder.rs catalog validations).
  *
  * A catalog-managed table's commit authority is a catalog, not the
  * filesystem: writers stage each commit as
  * `_delta_log/_staged_commits/{version}.{uuid}.json` and ask the
  * catalog to RATIFY it; the catalog arbitrates races (one winner per
  * version). Readers obtain the ratified-but-unpublished commits (the
  * "log tail") plus the catalog's max ratified version and build
  * snapshots from published log + tail. Ratified commits may later be
  * PUBLISHED — copied byte-for-byte to `_delta_log/{version}.json` —
  * purely as an optimization; the catalog remains the source of truth.
  */
object CatalogManaged {
  val FEATURE = "catalogManaged"
  val FEATURE_PREVIEW = "catalogOwned-preview"

  /** Does the protocol mark the table catalog-managed (either the
    * stable or the preview feature name, reference
    * table_features/mod.rs:138-142)?
    */
  def isCatalogManaged(p: Protocol): Boolean = {
    def has(fs: Option[Seq[String]]) =
      fs.exists(f => f.contains(FEATURE) || f.contains(FEATURE_PREVIEW))
    has(p.readerFeatures) || has(p.writerFeatures)
  }
}

/** A commit ratified by the catalog but not necessarily published
  * (reference committer/publish_types.rs `CatalogCommit`): the staged
  * file location plus the version it commits.
  */
case class CatalogCommit(version: Long, location: Path) {
  /** Where this commit lands when published (publish_types.rs:43). */
  def publishedLocation(logDir: Path): Path =
    FileNames.commitFile(logDir, version)
}

/** Outcome of an atomic commit attempt (reference
  * committer/commit_types.rs `CommitResponse`): either this writer owns
  * `version`, or someone else does and the caller must re-examine.
  */
sealed trait CommitResponse
object CommitResponse {
  case class Committed(version: Long, path: Path) extends CommitResponse
  case class Conflict(version: Long) extends CommitResponse
}

/** The commit authority abstraction (reference committer/mod.rs
  * `Committer` trait): how a serialized list of actions becomes the
  * table's next version. Filesystem tables use put-if-absent on the
  * published path; catalog-managed tables stage + ratify.
  */
trait Committer {
  def commit(fs: FileSystem, logDir: Path, version: Long,
      content: String): CommitResponse
  def isCatalogCommitter: Boolean
  /** Publish ratified catalog commits up to and including the last
    * entry of `commits` (reference Committer::publish). Filesystem
    * committers must never be asked to publish anything.
    */
  def publish(fs: FileSystem, logDir: Path,
      commits: Seq[CatalogCommit]): Unit
}

/** Put-if-absent publisher for path-based tables (reference
  * committer/filesystem.rs `FileSystemCommitter`). SAFETY: incorrect
  * for catalog-managed tables — the write-side gate refuses before it
  * gets here.
  */
object FileSystemCommitter extends Committer {
  override def commit(fs: FileSystem, logDir: Path, version: Long,
      content: String): CommitResponse = {
    val dest = FileNames.commitFile(logDir, version)
    if (Storage.putIfAbsent(fs, dest, content))
      CommitResponse.Committed(version, dest)
    else CommitResponse.Conflict(version)
  }
  override def isCatalogCommitter: Boolean = false
  override def publish(fs: FileSystem, logDir: Path,
      commits: Seq[CatalogCommit]): Unit =
    require(commits.isEmpty,
      "the filesystem committer does not support publishing catalog commits")
}

/** The catalog client surface a [[CatalogCommitter]] and snapshot
  * builds need. Real systems implement this against their catalog's
  * commit RPCs; [[InMemoryCatalog]] is the in-process reference
  * implementation the reference crates model in their test engines.
  */
trait CatalogClient {
  /** Highest version the catalog has ratified for `table`, if any. */
  def maxRatifiedVersion(table: String): Option[Long]
  /** Ratified-but-unpublished commits, ascending and contiguous,
    * ending at [[maxRatifiedVersion]] (the snapshot builder's log
    * tail, reference snapshot/builder.rs:329-392).
    */
  def logTail(table: String): Seq[CatalogCommit]
  /** Atomically accept `commit` as THE commit for its version. Returns
    * false when that version is already ratified (the caller lost the
    * race and must rebase).
    */
  def ratify(table: String, commit: CatalogCommit): Boolean
  /** Record that commits `<= upTo` now exist at their published
    * locations, shrinking the log tail.
    */
  def markPublished(table: String, upTo: Long): Unit
}

/** Process-local catalog: a synchronized version → commit registry per
  * table. The arbitration rule — first ratification of a version wins,
  * versions must be ratified in order — is exactly the contract a
  * production catalog provides transactionally.
  */
class InMemoryCatalog extends CatalogClient {
  private case class State(
      commits: scala.collection.mutable.TreeMap[Long, CatalogCommit],
      var publishedUpTo: Long)
  private val tables =
    scala.collection.mutable.HashMap.empty[String, State]

  private def state(table: String): State = synchronized {
    tables.getOrElseUpdate(table,
      State(scala.collection.mutable.TreeMap.empty, -1L))
  }

  override def maxRatifiedVersion(table: String): Option[Long] =
    synchronized { state(table).commits.lastOption.map(_._1) }

  override def logTail(table: String): Seq[CatalogCommit] = synchronized {
    val s = state(table)
    s.commits.valuesIterator.filter(_.version > s.publishedUpTo).toSeq
  }

  override def ratify(table: String, commit: CatalogCommit): Boolean =
    synchronized {
      val s = state(table)
      val expected = s.commits.lastOption.map(_._1 + 1).getOrElse(0L)
      if (commit.version != expected) false
      else { s.commits.put(commit.version, commit); true }
    }

  override def markPublished(table: String, upTo: Long): Unit =
    synchronized {
      val s = state(table)
      require(upTo <= s.commits.lastOption.map(_._1).getOrElse(-1L),
        s"cannot mark unratified version $upTo published")
      s.publishedUpTo = math.max(s.publishedUpTo, upTo)
    }
}

/** Durable directory-backed catalog: the same arbitration contract as
  * [[InMemoryCatalog]] serialized through an external store, proving
  * the [[CatalogClient]] abstraction beyond one process. Layout under
  * `dir` (one subdirectory per table, keyed by a sanitized table id):
  *
  *   <dir>/<table>/ratified/<version>.json  — one file per ratified
  *     commit ({"version":N,"location":"..."}); RATIFICATION IS
  *     put-if-absent ON THIS FILE, so exactly one writer wins a
  *     version (the same atomic-create primitive a production catalog
  *     implements transactionally; reference committer/mod.rs — the
  *     catalog, not the filesystem, is the commit authority)
  *   <dir>/<table>/published/<version>      — publish watermarks; the
  *     high-water mark is the max (marker files are immutable, so a
  *     slow publisher can never REGRESS the watermark)
  *
  * Scale note: the catalog holds one tiny file per commit — metadata
  * growth is the log's own growth, and `markPublished` lets an
  * implementation garbage-collect ratified entries below the mark.
  */
class FileCatalog(fs: FileSystem, dir: Path) extends CatalogClient {

  private def key(table: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(table.getBytes("UTF-8"))

  private def ratifiedDir(table: String) =
    new Path(new Path(dir, key(table)), "ratified")
  private def publishedDir(table: String) =
    new Path(new Path(dir, key(table)), "published")

  private def ratifiedVersions(table: String): Seq[Long] = {
    val d = ratifiedDir(table)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json").toLong)
      .sorted
  }

  override def maxRatifiedVersion(table: String): Option[Long] =
    ratifiedVersions(table).lastOption

  private def publishedUpTo(table: String): Long = {
    val d = publishedDir(table)
    if (!fs.exists(d)) -1L
    // numeric names only: putIfAbsent's hidden temp files (and any
    // orphan a crashed publisher leaves) must never crash the listing
    else fs.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).filter(_.nonEmpty).map(_.toLong)
      .maxOption.getOrElse(-1L)
  }

  override def logTail(table: String): Seq[CatalogCommit] = {
    val published = publishedUpTo(table)
    ratifiedVersions(table).filter(_ > published).map { v =>
      val p = new Path(ratifiedDir(table), s"$v.json")
      val node = JsonLog.parseLine(Storage.readLines(fs, p).mkString)
      CatalogCommit(v, new Path(node.get("location").asText))
    }
  }

  override def ratify(table: String, commit: CatalogCommit): Boolean = {
    val expected = maxRatifiedVersion(table).map(_ + 1).getOrElse(0L)
    if (commit.version != expected) return false
    fs.mkdirs(ratifiedDir(table))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val content = s"""{"version":${commit.version},"location":""" +
      s"""${mapper.writeValueAsString(commit.location.toString)}}"""
    // atomic create arbitrates the race: one winner per version
    Storage.putIfAbsent(fs,
      new Path(ratifiedDir(table), s"${commit.version}.json"), content)
  }

  override def markPublished(table: String, upTo: Long): Unit = {
    require(upTo <= maxRatifiedVersion(table).getOrElse(-1L),
      s"cannot mark unratified version $upTo published")
    fs.mkdirs(publishedDir(table))
    Storage.putIfAbsent(fs, new Path(publishedDir(table), upTo.toString), "")
    ()
  }
}

/** Stage-then-ratify committer for catalog-managed tables (reference
  * committer/mod.rs catalog-committer semantics): the actions are
  * durably staged under `_delta_log/_staged_commits/` with a UUID name
  * (never addressable by version alone — losers leave harmless
  * orphans), then the catalog atomically ratifies exactly one staged
  * file per version.
  */
class CatalogCommitter(catalog: CatalogClient, table: String)
    extends Committer {
  override def commit(fs: FileSystem, logDir: Path, version: Long,
      content: String): CommitResponse = {
    val staged = FileNames.stagedCommitFile(logDir, version,
      UUID.randomUUID().toString)
    fs.mkdirs(staged.getParent)
    Storage.put(fs, staged, content)
    if (catalog.ratify(table, CatalogCommit(version, staged)))
      CommitResponse.Committed(version, staged)
    else CommitResponse.Conflict(version)
  }

  override def isCatalogCommitter: Boolean = true

  /** Copy ratified commits to their published names (idempotent: a
    * version already published — by us or a racing publisher — is
    * byte-identical, so an existing destination is success), then
    * shrink the catalog's log tail (reference Committer::publish +
    * PublishMetadata invariants: non-empty, contiguous, ending at the
    * publish-to version).
    */
  override def publish(fs: FileSystem, logDir: Path,
      commits: Seq[CatalogCommit]): Unit = {
    require(commits.nonEmpty, "nothing to publish")
    commits.sliding(2).foreach {
      case Seq(a, b) => require(a.version + 1 == b.version,
        s"catalog commits to publish are not contiguous: " +
          s"${a.version} then ${b.version}")
      case _ => ()
    }
    commits.foreach { c =>
      val dest = c.publishedLocation(logDir)
      if (!fs.exists(dest)) {
        val content = Storage.readLines(fs, c.location)
          .mkString("", "\n", "\n")
        Storage.putIfAbsent(fs, dest, content)
      }
    }
    catalog.markPublished(table, commits.last.version)
  }
}

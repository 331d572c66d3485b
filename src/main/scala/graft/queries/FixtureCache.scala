package graft.queries

import java.nio.file.{Files, Path, Paths}

/** Build-once immutable fixture prefixes for oracle/bench rows (the
  * tree5m marker pattern): a row whose scenario starts from a state
  * that is a pure function of the scale-factor dir — CREATE + initial
  * appends, a trained index, batch-1 dedup state — builds that prefix
  * ONCE under target/tmp and copies it into the row's own scratch dir
  * per invocation. Only the prefix is reused; every mutating step the
  * row actually measures reruns fresh on the copy. Delta/tree paths
  * are table-relative, so a byte-copy of the directory is a valid
  * table at the new location.
  */
private[queries] object FixtureCache {

  /** One lock for every cached build: fixture construction is a few
    * seconds once per JVM per (name, sfDir); serializing builds is
    * simpler than per-key locks and contention-free after warmup.
    */
  private[queries] val lock = new Object

  private[queries] def rmTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.delete(q))

  private[queries] def copyDir(from: Path, to: Path): Unit =
    Files.walk(from).forEach { p =>
      val q = to.resolve(from.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(q)
      else {
        Files.createDirectories(q.getParent)
        Files.copy(p, q)
      }
    }

  /** Build-once immutable fixture prefix, marker-cached per sfDir
    * under target/tmp and COPIED into `dest` per invocation. A marker
    * file gates completeness — a half-built base (crashed builder) is
    * wiped and rebuilt, never served. Returns the base path so callers
    * can resolve sibling marker files they stored next to the base.
    */
  private[queries] def cachedBase(name: String, d: String, dest: String)(
      build: String => Unit): Path =
    lock.synchronized {
      val key = d.replaceAll("[^A-Za-z0-9.]", "_")
      val root = Paths.get("/root/repo/target/tmp")
      Files.createDirectories(root)
      val base = root.resolve(s"$name-base-$key")
      val done = base.resolve("_base_complete.marker")
      // cross-PROCESS exclusion: a concurrent JVM (a verify run racing
      // a bench run) must not see a half-built base and wipe it while
      // this one is still writing — the in-JVM monitor above cannot
      // cover that. FileChannel.lock blocks until the peer finishes.
      val lockCh = java.nio.channels.FileChannel.open(
        root.resolve(s"$name-base-$key.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val fl = lockCh.lock()
        try {
          if (!Files.exists(done)) {
            rmTree(base) // wipe a half-built base
            build(base.toString)
            Files.write(done, Array.emptyByteArray)
          }
          copyDir(base, Paths.get(dest))
        } finally fl.release()
      } finally lockCh.close()
      base
    }
}

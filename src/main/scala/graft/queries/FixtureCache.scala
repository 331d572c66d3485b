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
  *
  * Measurement scope (r12 VERDICT item 2): a cached prefix removes
  * SETUP from a row's timed region, which is not an operator speedup.
  * The bench therefore (a) warms every cache in an untimed pre-pass,
  * (b) stamps each affected row `"cached_prefix":true` in its stats
  * entry, and (c) reports each base's one-time build cost as its own
  * `fixture_build_<name>` stats row — see [[cachedPrefixRows]] and
  * [[buildSecs]].
  */
private[graft] object FixtureCache {

  /** One lock for every cached build: fixture construction is a few
    * seconds once per JVM per (name, sfDir); serializing builds is
    * simpler than per-key locks and contention-free after warmup.
    */
  private[queries] val lock = new Object

  /** Wall seconds of each base build that ran in THIS JVM, keyed by
    * cache name. Empty entries mean the base was already on disk
    * (warm across processes — target/tmp persists). The bench reports
    * these as `fixture_build_<name>` stats rows so setup cost is
    * visible and separate from every operator row.
    */
  private[graft] val buildSecs =
    scala.collection.concurrent.TrieMap.empty[String, Double]

  /** Query rows whose immutable fixture PREFIX is served from this
    * cache, mapped to the cache/base name each uses. Kept in ONE
    * place so the bench's scope flags can never drift from the call
    * sites (update both when adding/removing a cached row).
    */
  private[graft] val cachedPrefixRows: Map[String, String] = Map(
    "q_dedup_fuzzy_incremental" -> "fuzzinc",
    "q_knn_ivf_incremental" -> "ivfinc",
    "q_content_tree_incremental" -> "ctinc",
    "q_delta_props" -> "props",
    "q_delta_kitchen_sink" -> "sink",
    "q_delta_cdf_wide" -> "cdfw",
    "q_tree_eq_delete" -> "eqdel",
    "q_tree_eq_convert" -> "eqconv",
    "q_tree_eq_materialize" -> "eqmat",
    "q_tree_eq_append" -> "eqapp",
    "q_cdc_ingest" -> "cdci",
    "q_delta_cdf_pruned" -> "cdfpr",
    "q_delta_cdf_net" -> "cdfnet",
    "q_delta_merge" -> "mrg")

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
    *
    * `rev` is the RECIPE revision: the cache key is otherwise only
    * (name, sfDir), so an edit that changes what `build` writes
    * (filters, partitioning, table properties) would silently serve a
    * stale base persisted by an earlier process. Bump the call site's
    * `rev` with any such edit and the old base is simply abandoned
    * (a fresh `<name>-base-<sf>-r<rev>` dir builds on first use).
    */
  private[queries] def cachedBase(name: String, d: String, dest: String,
      rev: Int = 1)(build: String => Unit): Path =
    lock.synchronized {
      val key = d.replaceAll("[^A-Za-z0-9.]", "_")
      val root = Paths.get("/root/repo/target/tmp")
      Files.createDirectories(root)
      val base = root.resolve(
        if (rev == 1) s"$name-base-$key" else s"$name-base-$key-r$rev")
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
            val t0 = System.nanoTime()
            build(base.toString)
            Files.write(done, Array.emptyByteArray)
            buildSecs(name) = (System.nanoTime() - t0) / 1e9
          }
          copyDir(base, Paths.get(dest))
        } finally fl.release()
      } finally lockCh.close()
      base
    }
}

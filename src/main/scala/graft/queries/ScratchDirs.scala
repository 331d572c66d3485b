package graft.queries

/** In-JVM registry of the per-invocation scratch table dirs the query
  * closures create under target/tmp. Bench/Verify drain it right
  * after each row's execution completes (outside any timed region) so
  * a sweep no longer accumulates thousands of dirs — and, because
  * only paths REGISTERED BY THIS JVM are ever deleted, a concurrent
  * process (a test suite racing a verify run) can never lose its own
  * fresh dirs to another process's hygiene pass (a directory-diff
  * cleanup did exactly that when first tried).
  */
private[graft] object ScratchDirs {

  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private[queries] def register(p: String): String = { created.add(p); p }

  /** Delete (recursively, best-effort) every dir registered since the
    * last drain. Call only after the work reading those dirs finished.
    */
  private[graft] def dropRegistered(): Unit = {
    var s = created.poll()
    while (s != null) {
      try {
        val p = java.nio.file.Paths.get(s)
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.walk(p)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(q => java.nio.file.Files.deleteIfExists(q))
      } catch { case _: Throwable => () }
      s = created.poll()
    }
  }
}

package graft

/** Temp-dir hygiene for replay/demo state.
  *
  * Every graft temp directory (streaming replay stores, catalog demos,
  * DSv2 scratch) registers here, and ONE JVM shutdown hook deletes them
  * all recursively at process exit. Deletion must wait for exit — the
  * serving twins return LAZY DataFrames that read parquet from these
  * dirs, so an eager delete would race the caller's collect. Exit-time
  * cleanup is exactly right for the measurement harnesses too: bench
  * and soak run one JVM per unit/query, so each measurement cleans up
  * after itself and state from one query can never slow a later one.
  *
  * Why this exists: by round 16 the leaked dirs had accumulated to
  * 4,499 entries (~10 GB) under /tmp on the build box, and the
  * I/O-heavy stream twins' sequential medians measurably inflated
  * (stream_graph_maintain 17.7 s on the littered disk vs 15.1 s after a
  * manual sweep, same code, median of 3) — the leak was quietly taxing
  * every round's numbers.
  */
object TmpDirs {
  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    import scala.jdk.CollectionConverters._
    dirs.forEach { root =>
      try {
        val walk = java.nio.file.Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala
          .foreach(p => { java.nio.file.Files.deleteIfExists(p); () })
        finally walk.close()
      } catch { case _: Throwable => () } // exit path: best effort
    }
  }))

  /** `Files.createTempDirectory` + registration for exit-time delete. */
  def create(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }
}

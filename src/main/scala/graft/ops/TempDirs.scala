package graft.ops

/** Self-cleaning temp dirs for query fixture staging: every fixture a
  * query entry writes under java.io.tmpdir is registered here and
  * recursively deleted on JVM exit — a long-lived host running repeated
  * Bench/Verify JVMs otherwise accumulates them unboundedly (found
  * live: six 1.7 GB zillow input fixtures from one afternoon of sf100
  * draws drove the disk to 95% and killed a staging job). In-process
  * fixture caches (e.g. ZillowOps.listingsDirs) keep working — the
  * hook runs at JVM exit, never between queries. */
object TempDirs {

  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val installHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach(p => delete(p))
    }, "graft-tempdir-cleanup"))

  private def delete(p: java.nio.file.Path): Unit = try {
    import java.nio.file.Files
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder()).forEach { q =>
        try { Files.deleteIfExists(q); () } catch { case _: Throwable => () }
      } finally walk.close()
    }
  } catch { case scala.util.control.NonFatal(_) => () }

  /** Create a tracked temp dir; recursively deleted at JVM exit. */
  def tempDir(prefix: String): String = {
    installHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }
}

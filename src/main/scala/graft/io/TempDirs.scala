package graft.io

/** JVM-exit cleanup registry for staging directories under
  * java.io.tmpdir: bench (min-of-2 → two invocations per query), verify,
  * and spec runs each stage parquet copies of corpus slices; without a
  * registered delete every run leaves them behind. One hook serves every
  * registered path in the process; registration is idempotent and
  * failures are isolated per path (a vanished file must not stop the
  * remaining dirs from being swept). */
object TempDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Register `dir` for recursive deletion at JVM exit; returns it. */
  def registerForCleanup(dir: java.nio.file.Path): java.nio.file.Path = {
    registered.add(dir)
    if (hooked.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        registered.forEach { p =>
          // NonFatal, not IOException: Files.walk throws
          // UncheckedIOException (a RuntimeException) when entries vanish
          // mid-walk — that must not abort the sweep of the OTHER dirs
          try deleteRecursively(p)
          catch { case scala.util.control.NonFatal(_) => }
        }
      }, "graft-tempdir-cleanup"))
    }
    dir
  }

  /** Create a temp dir under java.io.tmpdir already registered for
    * JVM-exit deletion. */
  def createTracked(prefix: String): java.nio.file.Path =
    registerForCleanup(java.nio.file.Files.createTempDirectory(prefix))

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }
}

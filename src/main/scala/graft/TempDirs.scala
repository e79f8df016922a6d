package graft

import java.nio.file.{Files, Path}

/** Session-scoped scratch directories. Every temp dir the library or
  * its mains create goes through here, so repeated Verify/Bench runs
  * can't accumulate unbounded /tmp usage: each dir is registered once
  * and deleted recursively by a single JVM shutdown hook. */
object TempDirs {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.forEach { root =>
        try {
          Files.walk(root)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
        } catch { case _: Exception => () }
      }))

  /** Create a fresh temp dir under the default tmp root and register
    * it for deletion at JVM exit. */
  def create(prefix: String): String = {
    hookInstalled
    val dir = Files.createTempDirectory(prefix)
    registered.add(dir)
    dir.toString
  }
}

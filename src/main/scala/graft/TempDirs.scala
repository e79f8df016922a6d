package graft

import java.nio.file.{Files, Path}

/** Session-scoped scratch directories. Every temp dir the library or
  * its mains create goes through here, so repeated Verify/Bench runs
  * can't accumulate unbounded /tmp usage: each dir is registered once
  * and deleted recursively by a single JVM shutdown hook. */
object TempDirs {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      // Drain with poll() so a dir registered concurrently with hook
      // execution is either deleted here or knowingly left to the OS
      // tmp reaper — forEach over a live queue could skip it silently.
      var root = registered.poll()
      while (root != null) {
        // Files.walk holds directory handles until closed; a leaked
        // stream during shutdown can starve the remaining deletions
        // of file descriptors. Using() closes it either way.
        try scala.util.Using.resource(Files.walk(root)) { s =>
          s.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
        } catch { case _: Exception => () }
        root = registered.poll()
      }
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

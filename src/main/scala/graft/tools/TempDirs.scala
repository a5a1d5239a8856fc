package graft.tools

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Session-scoped temp directories: created under java.io.tmpdir and
  * deleted recursively on JVM exit, so repeated Bench/Verify/test
  * invocations of the round-trip queries (each of which materializes a
  * corpus copy) don't accumulate orphaned directories on disk.
  */
object TempDirs {
  private val dirs = java.util.concurrent.ConcurrentHashMap
    .newKeySet[String]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach { d =>
        try {
          val p = Paths.get(d)
          if (Files.exists(p))
            Files.walk(p).sorted(Comparator.reverseOrder[Path]())
              .forEach(f => { Files.deleteIfExists(f); () })
        } catch { case _: Exception => () }
      }))

  def create(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    dirs.add(p.toString)
    p.toString
  }
}

package graft.core

/** JVM-lifetime temp directories for queries that materialize write-side
  * artifacts (format round-trips, partitioned layouts, checkpoints): the
  * read-back DataFrame must stay valid for the session's lifetime, so the
  * dirs can't be deleted eagerly — instead one shutdown hook removes them
  * all, so repeated smoke/bench runs don't accumulate table copies under
  * /tmp. (`File.deleteOnExit` alone can't do this: it only removes empty
  * directories.)
  */
object TempDirs {

  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach(p => Warehouse.deleteRecursively(p.toFile))))
    ()
  }

  /** Create a temp directory registered for recursive delete on JVM exit. */
  def create(prefix: String): String = {
    hookInstalled
    val d = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(d)
    d.toString
  }
}

package graft.core

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Per-session memo of session-bound values (resolved DataFrames and
  * similar plan-shaped state).
  *
  * Why not a WeakHashMap keyed on the session: the cached values
  * strongly reference their SparkSession (a DataFrame pins it through
  * its QueryExecution/SessionState), so the weak key stays strongly
  * reachable FROM ITS OWN VALUE and is never collectable — a
  * session-cycling JVM would grow monotonically despite the weak keys
  * (ADVICE r14). Eviction is therefore explicit instead of GC-driven:
  * the first touch per session registers a context-stop listener, and
  * the stop event evicts every entry whose session rides a stopped
  * context. `SparkSession.stop()` stops the shared SparkContext, so
  * `newSession()` clones are evicted together with their parent —
  * correct, since their cached plans are unusable after stop anyway.
  * Sessions abandoned without `stop()` keep their entries exactly as
  * the weak map (ineffectively) did; no regression on that path.
  */
final class SessionCache[K, V] {
  private val maps = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[K, V]]()

  private def perSession(spark: SparkSession) =
    maps.computeIfAbsent(spark, s => {
      // SparkContext.stop() flips isStopped BEFORE posting
      // ApplicationEnd, so the sweep below observes the stopping
      // context as stopped. One listener per cached session: cheap,
      // and each sweep clears every already-stopped session's entries
      // (including sessions whose own listener already ran).
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit =
          evictStopped()
      })
      new java.util.concurrent.ConcurrentHashMap[K, V]()
    })

  /** Drop every entry keyed by a session whose context has stopped.
    * Called from the stop listener; exposed for direct use in tests. */
  private[graft] def evictStopped(): Unit = {
    val it = maps.keySet().iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
  }

  /** Memoized build under the map's per-bin lock — use when `build` is
    * cheap driver-side work (a read plan, schema inference) that never
    * runs a Spark job. Exactly-once per key.
    */
  def getOrBuild(spark: SparkSession, key: K)(build: => V): V =
    perSession(spark).computeIfAbsent(key, _ => build)

  /** Memoized build WITHOUT holding the map lock during `build` — use
    * when the build runs Spark jobs (an eager localCheckpoint): a
    * lock-held job would block unrelated keys hashing to the same bin
    * for the job's whole duration. Racing builders may both run; the
    * first `putIfAbsent` wins and everyone returns the winner.
    */
  def getOrBuildRacy(spark: SparkSession, key: K)(build: => V): V = {
    val per = perSession(spark)
    val cur = per.get(key)
    if (cur != null) cur
    else {
      val built = build
      val prev = per.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  /** Entry count across all sessions (test observability). */
  private[graft] def size: Int = {
    var n = 0
    maps.forEach((_, m) => n += m.size())
    n
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** SessionCache (ADVICE r14): the session-keyed memo behind
  * Tables.catalog and Graph.edgeMemo. The WeakHashMap it replaced could
  * never reclaim an entry — each cached DataFrame strongly references
  * the session it is keyed by — so eviction is now explicit on context
  * stop. Stop-driven eviction itself cannot run inside the shared-session
  * test JVM (stopping the context would kill every other suite); the
  * sweep is exercised directly and the stop listener is a code-read
  * guarantee (registered in perSession, fires on ApplicationEnd, which
  * Spark posts after isStopped flips).
  */
class SessionCacheSpec extends AnyFunSuite with SparkTest {

  test("getOrBuild memoizes per (session, key) and builds exactly once") {
    val cache = new graft.core.SessionCache[String, AnyRef]
    var builds = 0
    def build(): AnyRef = { builds += 1; new Object }
    val a1 = cache.getOrBuild(spark, "a")(build())
    val a2 = cache.getOrBuild(spark, "a")(build())
    val b1 = cache.getOrBuild(spark, "b")(build())
    assert(a1 eq a2)
    assert(!(a1 eq b1))
    assert(builds == 2)
    assert(cache.size == 2)
  }

  test("getOrBuildRacy memoizes without holding the bin lock during the build") {
    val cache = new graft.core.SessionCache[String, AnyRef]
    // The racy variant may build twice under a genuine race, but must
    // hand every caller the single winning instance.
    val results = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[AnyRef, java.lang.Boolean]())
    val threads = (1 to 8).map(_ => new Thread(() => {
      results.add(cache.getOrBuildRacy(spark, "k")(new Object)); ()
    }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(results.size == 1)
    val winner = results.iterator().next()
    assert(cache.getOrBuildRacy(spark, "k")(fail("already cached")) eq winner)
  }

  test("evictStopped keeps entries of live sessions") {
    val cache = new graft.core.SessionCache[String, String]
    cache.getOrBuild(spark, "x")("v")
    cache.evictStopped()
    assert(cache.size == 1)
    assert(cache.getOrBuild(spark, "x")(fail("evicted a live session's entry")) == "v")
  }
}

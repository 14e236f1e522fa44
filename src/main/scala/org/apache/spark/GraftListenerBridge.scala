package org.apache.spark

/** `SparkContext.listenerBus` is `private[spark]`, but a measurement
  * harness that counts per-stage shuffle metrics through a
  * `SparkListener` needs a deterministic "all in-flight events
  * delivered" barrier — a fixed sleep truncates or bleeds counts under
  * load. This shim re-exports the bus's `waitUntilEmpty` from inside
  * the `org.apache.spark` package (the standard extension-library
  * access trick; no Spark behavior is altered).
  */
object GraftListenerBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}

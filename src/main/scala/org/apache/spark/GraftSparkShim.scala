package org.apache.spark

/** Bridge into `private[spark]` listener-bus draining. Stage-metric
  * events (shuffle bytes, spill) are delivered asynchronously on the
  * listener thread; a benchmark snapshotting per-query counters must
  * wait for the queue to drain or the last stages of query N get
  * charged to query N+1. `LiveListenerBus.waitUntilEmpty` is the
  * supported test-side primitive for exactly this, but it is
  * `private[spark]` — hence this one-method shim (same pattern as
  * sql.graftshim for the Column↔Expression bridge). */
object GraftSparkShim {
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: Throwable => () }
}

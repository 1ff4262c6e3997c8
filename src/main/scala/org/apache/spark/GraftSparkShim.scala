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
  /** Blocks until the listener queue is empty (10 s budget). A timeout
    * means byte attribution may bleed into the next query — that must
    * stay observable, so it warns on stderr instead of passing silently;
    * interruption re-sets the thread's interrupt flag. */
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        System.err.println(
          "[bench] listener bus not drained in 10s — byte attribution may bleed into the next query")
      case _: InterruptedException =>
        Thread.currentThread().interrupt()
      case e: Throwable =>
        System.err.println(s"[bench] listener bus drain failed: ${e.getClass.getName}: ${e.getMessage}")
    }
}

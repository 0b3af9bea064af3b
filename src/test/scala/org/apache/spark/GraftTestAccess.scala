package org.apache.spark

/** Test-only bridge into `private[spark]` surface: deterministic
  * listener-bus draining for assertions that count posted events
  * (sleep-based draining is flaky under load and adds fixed latency).
  */
object GraftTestAccess {
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}

package org.apache.spark

/** Test-only bridge to the private[spark] listener-bus flush, so specs
  * that collect query-execution events (BroadcastGuardSpec) can wait for
  * the async bus to drain instead of sleeping.
  */
object GraftListenerFlush {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(60000)
}

package org.apache.spark

/** Test-only accessor for `private[spark]` listener-bus draining.
  *
  * ADVICE r3: PlanSpec's zero-job assertions used `Thread.sleep(500)` to
  * let asynchronously-posted job-start events arrive before checking the
  * counter — timing-flaky under load. `waitUntilEmpty` blocks until the
  * bus has actually delivered everything (or throws on timeout), so the
  * assertion is deterministic.
  */
object GraftTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}

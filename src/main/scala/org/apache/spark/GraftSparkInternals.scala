package org.apache.spark

/** Narrow bridge to `private[spark]` surfaces the bench harness needs.
  * Lives in the org.apache.spark package for visibility only; nothing
  * here runs in a query plan.
  */
object GraftSparkInternals {

  /** Block until the LiveListenerBus has dispatched every queued
    * event. The bench drains between queries so a listener backlog
    * accumulated by one query's thousands of task events is not paid
    * inside whichever later query happens to saturate the queue
    * (spread hypothesis, VERDICT r14 #4). */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

package org.apache.spark

/** Test-only accessor for `SparkContext.listenerBus` (private[spark]):
  * metric-measuring specs must drain the async listener queue before
  * reading their counters, or they race the events they assert on.
  */
object GraftTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

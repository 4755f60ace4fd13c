package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; ShuffleBudgetSpec needs
  * to drain the async listener bus before reading its byte counters (the
  * same shim pattern as `org.apache.spark.sql.graft.bridge`, test-only).
  */
object listenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}

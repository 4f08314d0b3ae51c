package org.apache.spark

/** Test-only access shim (the GraftPlanBridge pattern): the listener bus
  * drain is `private[spark]`, and the plan-budget harness must wait for all
  * task-end events before reading its stage counters — otherwise a fast
  * query's counts race the async bus.
  */
object GraftTestBridges {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

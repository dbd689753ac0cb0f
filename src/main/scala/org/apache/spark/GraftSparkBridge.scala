package org.apache.spark

/** Bridge into `private[spark]` internals used by the bench telemetry
  * (graft.Bench): listener events are posted asynchronously, so per-lap
  * metric DELTAS (GC/shuffle/spill) only attribute to the lap that
  * produced them if the bus is drained between laps. `waitUntilEmpty()`
  * is the exact mechanism Spark's own test harness uses for this.
  */
object GraftSparkBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

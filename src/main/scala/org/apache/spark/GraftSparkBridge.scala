package org.apache.spark

import scala.jdk.CollectionConverters._

/** Bridge into `private[spark]` internals used by the bench telemetry
  * (graft.Bench): listener events are posted asynchronously, so per-lap
  * metric DELTAS (GC/shuffle/spill) only attribute to the lap that
  * produced them if the bus is drained between laps. `waitUntilEmpty()`
  * is the exact mechanism Spark's own test harness uses for this.
  *
  * The two depth probes exist for the r9 tail anomaly: control samples
  * at positions 168–179 read sched-latency ×9 with FLAT GC and low
  * loadavg — matching neither co-tenant contention nor memory pressure.
  * The unprobed candidate was driver-internal accumulation after ~170
  * queries (listener-bus backlog, context-cleaner reference population),
  * so both are now sampled alongside every control lap.
  */
object GraftSparkBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Summed depth of every async listener queue (the `queue.<name>.size`
    * gauges Spark registers per AsyncEventQueue). A persistent non-zero
    * reading means event producers outrun the bus — every
    * `waitUntilEmpty()` in the lap protocol then stalls the measured
    * path.
    */
  def listenerQueueDepth(sc: SparkContext): Long =
    sc.listenerBus.metrics.metricRegistry.getGauges.asScala.iterator
      .collect {
        case (name, g) if name.startsWith("queue.") && name.endsWith(".size") =>
          g.getValue match { case n: Number => n.longValue; case _ => 0L }
      }.sum

  /** Population of the ContextCleaner's reference buffer — every RDD /
    * broadcast / shuffle / accumulator registered for GC-driven cleanup
    * and not yet collected. Monotone growth across a long suite is the
    * "driver fills up" signature; the field is plain-private so this is
    * the one reflective access in the repo (harness-only, never on a
    * query path).
    */
  def cleanerRefCount(sc: SparkContext): Long =
    sc.cleaner.map { c =>
      try {
        val f = c.getClass.getDeclaredField(
          "org$apache$spark$ContextCleaner$$referenceBuffer")
        f.setAccessible(true)
        f.get(c).asInstanceOf[java.util.Set[_]].size.toLong
      } catch {
        case _: Throwable =>
          try {
            val f = c.getClass.getDeclaredField("referenceBuffer")
            f.setAccessible(true)
            f.get(c).asInstanceOf[java.util.Set[_]].size.toLong
          } catch { case _: Throwable => -1L }
      }
    }.getOrElse(-1L)
}

package org.apache.spark

/** Minimal bridge into `private[spark]` surface needed by the graft
  * bench harness: the listener bus drain. Telemetry listeners receive
  * task-end events asynchronously; per-query attribution is only exact
  * if the bus is empty before the snapshot is read and the counters are
  * reset for the next query.
  */
object GraftSparkInternals {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

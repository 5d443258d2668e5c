package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** `private[spark]` scheduler access needed by graft's Loader:
  * the listener bus is asynchronous, so a caller that registers a
  * bridging SparkListener for the duration of one write job must drain
  * the bus before deregistering, or trailing task-end events are lost
  * nondeterministically. */
object GraftScheduler {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

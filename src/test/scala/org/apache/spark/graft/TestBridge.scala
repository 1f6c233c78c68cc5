package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` scheduler internals: metric
  * assertions (Round11Spec's shuffle-byte comparison) must drain the
  * async listener bus before reading their accumulators, and
  * `listenerBus.waitUntilEmpty()` is the supported way Spark's own test
  * utilities do it.
  */
object TestBridge {
  def waitListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge to `private[spark]` members (the standard Spark
  * testing idiom — Spark's own SQLTestUtils does the same). Used by
  * specs that assert a code path launches NO job: the status tracker
  * is fed asynchronously by the listener bus, so asserting absence
  * requires draining the bus first, not sleeping.
  */
object SparkTestAccess {
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only accessor for the `private[spark]` listener bus: spec
  * helpers that read task metrics off a SparkListener must DRAIN the
  * bus before asserting, not sleep a fixed interval (advisor r19 — the
  * Thread.sleep(500) form was race-prone under a loaded box). */
object ListenerBusShim {
  /** Block until every queued listener event has been delivered. */
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(60000L)
}

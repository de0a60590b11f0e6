package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` surface used by the probe tools:
  * deterministic listener-bus drain, so task-metric counters read
  * AFTER an action reflect every task of that action (a fixed sleep
  * undercounts on a slow bus — round-9 ADVICE item).
  */
object Listeners {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}

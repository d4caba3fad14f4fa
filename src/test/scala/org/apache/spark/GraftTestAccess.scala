package org.apache.spark

/** Test-only bridge to `private[spark]` members: deterministic listener
  * drain for assertions on "no job ran" (a fixed sleep is both slower
  * and racy under load). */
object GraftTestAccess {
  def drainListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

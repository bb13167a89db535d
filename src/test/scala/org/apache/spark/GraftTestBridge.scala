package org.apache.spark

/** Test-only bridge into `private[spark]` surface: listener events are
  * delivered asynchronously, so a job-count assertion must drain the
  * bus first or it races the events it counts.
  */
object GraftTestBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

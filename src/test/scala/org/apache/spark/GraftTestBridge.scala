package org.apache.spark

/** Test-only bridge into `private[spark]` listener plumbing: lets specs
  * flush the listener bus so per-stage metrics (shuffle bytes) are
  * complete before asserting on them. */
object GraftTestBridge {
  def waitForListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` listener-bus internals. Stage/job events
  * are delivered on an async queue; a tool that attributes events to the
  * query it just ran must drain the bus before advancing its label (and
  * before reading its results at exit), or events land on the wrong query
  * — or are silently dropped when the JVM exits first.
  */
object ListenerBridge {
  /** Block until every event posted so far has been delivered to all
    * registered listeners. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

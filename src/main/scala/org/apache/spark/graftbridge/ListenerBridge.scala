package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` listener-bus internals: the bench profiler
  * must drain the async listener queue before snapshotting per-query metrics,
  * and `SparkContext.listenerBus` is spark-private. Same pattern as
  * [[org.apache.spark.sql.graftbridge.ColumnBridge]].
  */
object ListenerBridge {
  /** Block until every event posted so far has been delivered to listeners. */
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

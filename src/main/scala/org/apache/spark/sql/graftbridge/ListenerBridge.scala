package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext

/** Bridge into the `private[spark]` listener-bus drain — the bench's
  * bounded-collect audit attributes QueryExecutionListener events to
  * the key that produced them by reading a volatile current-key marker,
  * so the bus must be EMPTY before the marker moves to the next key
  * (events are delivered on the shared bus thread, not the caller's).
  * Same minimal-bridge pattern as [[ColumnBridge]].
  */
object ListenerBridge {

  /** Blocks until every queued listener event has been delivered, or
    * the timeout elapses (swallowed — an audit attribution slip must
    * never fail a bench run). */
  def flushListenerBus(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}

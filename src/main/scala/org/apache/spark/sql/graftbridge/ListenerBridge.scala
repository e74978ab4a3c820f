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
    * the timeout elapses. Returns true on a clean drain, false when the
    * timeout (or any bus error) cut the wait short — callers record
    * that, because an un-drained bus means the NEXT key may inherit
    * this key's collect events (r15 advice: a violation raised near a
    * timed-out drain must be distinguishable from a clean attribution).
    * Never throws — an audit attribution slip must not fail a bench
    * run. */
  def flushListenerBus(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: Throwable => false }
}

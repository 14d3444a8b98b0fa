package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Measurement-hygiene shim: block until every queued listener event has
  * been delivered to every registered listener.
  *
  * [[graft.core.CacheScope]] releases cached intermediates from a
  * QueryExecutionListener, and since Spark 2.3 those callbacks ride the
  * shared ASYNC listener bus — they fire some time AFTER the action that
  * triggered them returns. In a back-to-back bench loop that means query
  * N's unpersist work can execute inside query N+1's timed window,
  * charging one query's cleanup to another's wall-clock (the x2/s3
  * in-suite variance class). `SparkContext.listenerBus` is
  * `private[spark]`, hence this one-method shim in the spark package;
  * graft.Bench calls it between runs so each timed window starts with an
  * empty bus.
  */
object ListenerDrain {
  /** @return false if the bus did not empty within `timeoutMs`. */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}

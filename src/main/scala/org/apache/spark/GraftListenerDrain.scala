package org.apache.spark

/** Accessor for the driver's LiveListenerBus drain, which Spark scopes
  * `private[spark]`. [[graft.Materialize.releaseTransient]] drops the
  * checkpoint blocks of a finished query; task-end / SQL-metric events of
  * that query still queued on the bus then resolve their accumulators
  * AFTER the release's GC has cleared them from AccumulatorContext, and
  * every such event logs `Failed to update accumulator` at ERROR level —
  * metrics-only noise that masks real errors. Draining the queue first
  * lets every in-flight event resolve against live accumulators.
  * Read-only: no state is mutated beyond waiting. */
object GraftListenerDrain {
  /** Block until the listener bus has dispatched every queued event, or
    * `timeoutMs` elapsed (a stuck listener must not deadlock a benchmark
    * loop — on timeout the release proceeds as before). */
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}

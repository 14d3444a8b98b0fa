package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Measurement-hygiene shim for stateful streaming residue.
  *
  * Every streaming run loads one StateStoreProvider per (operator,
  * partition) into a JVM-global registry keyed by checkpoint location,
  * and a background maintenance thread periodically snapshots EVERY
  * loaded provider. The bench's s5/s6 queries create a fresh checkpoint
  * per run, so providers from finished runs accumulate (8 partitions x
  * operators x 4 runs each), and when the 60s maintenance tick lands
  * inside a later timed window it snapshots dozens of orphaned
  * providers whose checkpoint dirs are already deleted — retry/IO noise
  * charged to whatever query is running (the round-5 run-A s5/s6
  * elevation: every run in one suite invocation ~2x, the next
  * invocation clean). `StateStore` is in a `private[sql]`-guarded
  * package space, hence this shim; graft.Bench calls it from the
  * inter-run barrier, where no stream is active, so unloading all
  * providers is safe (an active stream would transparently reload).
  */
object StateDrain {
  /** Unload every loaded state-store provider (no-op when none). */
  def unloadAll(): Unit = StateStore.unloadAll()
}

// Lives under org.apache.spark.sql for the same reason as the native
// expressions (see Sketches.scala): StateStore is sql-internal. Only
// used by graft.Bench's shutdown sequence.
package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Deterministic teardown of Structured Streaming state machinery.
  *
  * Why this exists: streaming queries (stateful dedup, stream-stream
  * join) leave loaded StateStoreProviders behind after the query stops.
  * Their background maintenance threads keep running and, once
  * `spark.stop()` tears down the RpcEnv, throw RpcEnvStoppedException
  * stack traces — in round 2 that noise flooded the driver's captured
  * output tail and pushed graft.Bench's metric JSON line out of it
  * (BENCH_r02.json parsed: null). Stopping the maintenance task and
  * unloading all providers BEFORE `spark.stop()` makes the shutdown
  * silent.
  */
object StateStoreHooks {
  /** Stop the maintenance thread pool and unload every loaded provider.
    * Safe to call when no streaming query ever ran (no-op). */
  def stopAll(): Unit = StateStore.stop()
}

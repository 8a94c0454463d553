package graft.plans

import org.apache.spark.sql.DataFrame

/**
 * Session-lifetime cache registry. Operators that need a persist barrier
 * (the ring-widening kNN levels, the dedup signature projections, the
 * similarity norm/vector bases) register their cached frames here instead
 * of calling `.persist()` directly; a long-lived session then releases
 * them between jobs with [[flush]] — otherwise cached blocks accumulate
 * across operator calls until the executors' storage memory is exhausted
 * (each `persist` is still lazy; `track` changes nothing about when or
 * whether the frame materializes).
 *
 * `Verify` flushes after every query and `Bench` after every timing; a
 * user embedding the library calls `Caches.flush()` at their own job
 * boundaries (or leaves it — an un-flushed frame is evicted LRU like any
 * other cached block, this registry only makes the release deterministic).
 */
object Caches {
  private val reg = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and register it for the next [[flush]]. */
  def track(df: DataFrame): DataFrame = synchronized { reg += df.persist(); df }

  /** Unpersist (non-blocking) every tracked frame and clear the registry. */
  def flush(): Unit = synchronized { reg.foreach(_.unpersist(false)); reg.clear() }
}

package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for the engine's COMPUTE-ONCE persists — the sketch / feature
  * / candidate mid-frames several subtrees of one analysis plan consume
  * ([[graft.dedup.Dedup]]'s `cachedSketch`, [[graft.multimodal
  * .Multimodal]]'s `cachedFeature`). These are session-lifetime by
  * default (the CacheManager holds them until `unpersist`), which is
  * right for a one-shot job but lets a long multi-query session (Bench's
  * interleaved sweeps, Verify's 104-query dump) accumulate every query's
  * entries: measured at the 100× tier the eviction/GC churn of upstream
  * leftovers DOUBLED later queries' walls. Harnesses call [[clear]]
  * between queries to release exactly the engine's transient entries —
  * and nothing else: fixture memoization (e.g. the synthetic media
  * tables, deliberately cached so benches measure decode, not
  * re-encoding) registers nowhere and survives.
  *
  * Entries are held strongly but the queue is drained on every [[clear]],
  * so retention is bounded by the call sites of one query run. Streaming
  * writers do NOT register here — they own their per-wave persists
  * explicitly ([[graft.streaming.NearDupStream.writer]]'s wave scope).
  */
object TransientCache {
  private val entries =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Persist `df` (idempotent — a semantically-equal cached plan short-
    * circuits via the CacheManager lookup `storageLevel` performs) and
    * register it for the next [[clear]].
    */
  def persist(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist()
      entries.add(df)
    }
    df
  }

  /** Unpersist every registered frame (lazily — blocking eviction buys
    * nothing here) and empty the registry.
    */
  def clear(): Unit = {
    var d = entries.poll()
    while (d != null) {
      d.unpersist(false)
      d = entries.poll()
    }
  }
}

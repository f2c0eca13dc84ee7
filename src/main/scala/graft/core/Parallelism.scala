package graft.core

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for CPU-dense per-row expansion operators
  * (n-gram explode, shingle/signature hashing, span segmentation).
  *
  * Spark sizes scan splits by BYTES (`spark.sql.files.maxPartitionBytes`,
  * 128 MB default) — correct for IO-bound relational work, but an
  * operator whose per-row CPU is 10-100× its input bytes can receive a
  * single split for a small-but-expensive table and serialize the whole
  * stage on one core (measured: the cross-doc 8-gram histogram over a
  * one-file 5 MB corpus ran 45 s on one task while the 10× corpus, split
  * across 32 files, took 26 s). At 100 TB every table spans thousands of
  * splits and [[ensure]] is a provable no-op; it exists for the
  * degenerate single-split tail — small lookup corpora, local test
  * tiers, the last compacted file of a partition.
  */
object Parallelism {

  /** Repartition `df` to the session's default parallelism IFF its
    * planned partition count is below half the session's cores; no-op
    * (and no added exchange) otherwise. Call on the NARROW projection
    * that feeds the expansion, so the exchange moves raw rows, not the
    * expanded form.
    */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(2, target / 2)) df
    else df.repartition(target)
  }
}

package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

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

  /** Guard `df` against the single-split collapse before a CPU-dense
    * expansion; call on the NARROW projection that feeds the expansion,
    * so any exchange this inserts moves raw rows, not the expanded form.
    *
    * Two plan shapes, two decisions:
    *
    *  - NARROW scan-rooted plans (no exchange, no cache scan): probe the
    *    actual partition count (`df.rdd` — free here, such plans have no
    *    AQE query stages to materialize) and round-robin repartition to
    *    the session parallelism iff below half the cores — the original
    *    contract, unchanged.
    *  - SHUFFLE- or CACHE-rooted plans: the partition count is decided
    *    at RUNTIME (AQE coalescing), and probing it with `df.rdd` is not
    *    a metadata read — under AQE it materializes every upstream query
    *    stage just to expose the partition layout, i.e. it EXECUTES the
    *    wave's whole pipeline once and throws the result away (measured
    *    on the q116 fold: 1-9 s of executor time per wave, every wave,
    *    plus one scheduled job each). Decide from the optimizer's SIZE
    *    ESTIMATE instead: a small input repartitions unconditionally
    *    (the exchange moves ≤ [[smallInputBytesPerCore]] per core of
    *    narrow rows — noise next to the kernel it feeds, and exactly
    *    the case where AQE's byte-targeted coalescing under-parallelizes
    *    CPU-dense work); a large input keeps its shuffle/cache layout
    *    (scan splits and shuffle partitioning already spread it, and a
    *    blind repartition would add a real exchange at scale).
    */
  def ensure(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val runtimeSized = df.queryExecution.sparkPlan.exists {
      case _: ShuffleExchangeLike => true
      case _: InMemoryTableScanExec => true
      case _ => false
    }
    if (!runtimeSized) {
      if (df.rdd.getNumPartitions >= math.max(2, target / 2)) df
      else df.repartition(target)
    } else {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (bytes <= BigInt(target) * smallInputBytesPerCore(spark)) {
        df.repartition(target)
      } else df
    }
  }

  /** Size cutoff per core below which a runtime-sized (shuffle/cache
    * rooted) input is unconditionally repartitioned for CPU density —
    * `spark.graft.parallelism.smallInputBytes` (default 8 MB/core). At
    * the default a local[32] session repartitions runtime-sized inputs
    * estimated ≤ 256 MB; a 100 TB-tier input blows past any sane value
    * and keeps its layout.
    */
  private def smallInputBytesPerCore(
      spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.parallelism.smallInputBytes")
      .map(_.toLong).getOrElse(8L << 20)
}

package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
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

  /** Does executing `df.rdd` on this plan run jobs? True when the plan —
    * recursing through cache scans into their cached plans — contains a
    * shuffle or an AQE subtree: AdaptiveSparkPlanExec materializes every
    * intermediate query stage (i.e. EXECUTES the upstream) just to
    * expose the final partition layout, and a cache scan over an AQE
    * cachedPlan does the same the moment its RDD is requested. Narrow
    * scan-rooted chains (even through a narrow cache) build their RDD
    * lazily — probing them is a metadata read.
    */
  private def runtimeSized(p: SparkPlan): Boolean =
    p.exists {
      case _: ShuffleExchangeLike => true
      case _: AdaptiveSparkPlanExec => true
      case i: InMemoryTableScanExec => runtimeSized(i.relation.cachedPlan)
      case _ => false
    }

  /** Guard `df` against the single-split collapse before a CPU-dense
    * expansion; call on the NARROW projection that feeds the expansion,
    * so any exchange this inserts moves raw rows, not the expanded form.
    *
    * Two plan shapes, two decisions:
    *
    *  - NARROW scan-rooted plans (no shuffle/AQE anywhere, including
    *    inside cache scans): probe the actual partition count (`df.rdd`
    *    — a metadata read here) and round-robin repartition to the
    *    session parallelism iff below half the cores — the original
    *    contract, unchanged. This branch keeps the guard EXACT for the
    *    hazard it exists for: a big narrow single-file table collapsing
    *    to one split.
    *  - RUNTIME-SIZED plans (a shuffle or AQE subtree somewhere): the
    *    partition count is decided at runtime by AQE coalescing, and
    *    probing it with `df.rdd` is not a metadata read — it EXECUTES
    *    the wave's whole upstream once and throws the result away
    *    (measured on the q116 fold: 1-9 s of executor time per wave,
    *    every wave, plus one scheduled job each). Decide from the
    *    optimizer's size estimate instead: inputs estimated ≤
    *    [[smallInputBytesPerCore]] × cores repartition unconditionally
    *    for CPU density (the exchange moves wave-sized narrow rows —
    *    noise next to the kernels it feeds, and exactly the case where
    *    AQE's byte-targeted coalescing under-parallelizes CPU-dense
    *    work); larger inputs keep their shuffle layout (AQE sizes
    *    post-shuffle parallelism proportionally to bytes, and a blind
    *    repartition would add a real exchange at scale).
    */
  def ensure(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (!runtimeSized(df.queryExecution.sparkPlan)) {
      if (df.rdd.getNumPartitions >= math.max(2, target / 2)) df
      else df.repartition(target)
    } else {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (bytes <= BigInt(target) * smallInputBytesPerCore(spark)) {
        df.repartition(target)
      } else df
    }
  }

  /** Size cutoff per core below which a runtime-sized (shuffle/AQE
    * rooted) input is unconditionally repartitioned for CPU density —
    * `spark.graft.parallelism.smallInputBytes` (default 8 MB/core). At
    * the default a local[32] session repartitions runtime-sized inputs
    * estimated ≤ 256 MB; a 100 TB-tier input blows past any sane value
    * and keeps its layout.
    */
  private def smallInputBytesPerCore(
      spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.parallelism.smallInputBytes")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .getOrElse(8L << 20)
}

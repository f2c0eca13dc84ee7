package graft.sampling

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling operators for training-data curation — the standard knobs for
  * carving corpora at 100 TB, all seed-deterministic so a pipeline rerun
  * reproduces the same sample (replayability is the property that matters;
  * the exact row set was engine-specific until the portable-hash draws —
  * the gated queries (q63/q64/q65) are oracle-hash-exact, with property
  * coverage in ScalaTest).
  */
object Sampling {

  /** Bernoulli sample at `fraction` with a fixed seed: each row tosses an
    * independent coin — fully distributed, no shuffle, no coordination.
    */
  def seeded(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Stratified sample: per-stratum Bernoulli fractions (e.g. downsample
    * the dominant language, keep all of a rare one). Map-side only, like
    * [[seeded]] — the stratum column just selects the coin's bias.
    */
  def stratified(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Stratified sample whose membership rule is a pure, ENGINE-INDEPENDENT
    * function of (id, seed): keep a row iff
    * `((id mod 2³¹)·2654435761 + seed) mod 2²⁰ < fraction(stratum)·2²⁰`.
    *
    * [[stratified]] draws with Spark's internal RNG — replayable within
    * Spark but not reproducible by any other engine, so a downstream
    * system can never re-derive (or audit) the membership set. This
    * variant uses Knuth's multiplicative scramble instead: for the odd
    * multiplier, `k ↦ k·A mod 2²⁰` permutes the bucket space, so
    * consecutive ids spread uniformly and each stratum keeps ≈ its
    * requested fraction — and the identical arithmetic runs in plain SQL
    * in any engine (every product stays below 2⁶³: (2³¹−1)·2654435761 <
    * 5.8·10¹⁸), which is what lets the driver's DuckDB oracle hash-gate
    * q63 instead of taking row counts on faith. Strata absent from
    * `fractions` are dropped (rate 0), matching `sampleBy`. Fully
    * map-side, no shuffle, no RNG state.
    */
  def stratifiedByHash(df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame = {
    val buckets = 1L << 20
    val h = pmod(
      pmod(col(idCol).cast("long"), lit(1L << 31)) * lit(2654435761L) +
        lit(seed), lit(buckets))
    val rate = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(h.cast("double") < rate * lit(buckets.toDouble))
  }

  /** Frequent values of a column above `support` (Karp-Papadimitriou-
    * Shenker sketch via `stat.freqItems`): the bounded-memory frequent-
    * items pass for vocabulary/boilerplate analysis where an exact
    * group-by-count (q24) would carry the full long tail through a
    * shuffle. May over-report (includes false positives near the support
    * threshold), never under-reports — callers filter with an exact count
    * of the candidate set when precision matters.
    */
  def frequentValues(df: DataFrame, column: String, support: Double): DataFrame =
    df.stat.freqItems(Seq(column), support)

  /** EXACT heavy hitters at bounded memory — the textbook two-pass
    * composition over [[frequentValues]]: pass 1 sketches a candidate set
    * (≤ ~1/support items, KPS guarantees no false negatives above the
    * threshold), pass 2 exact-counts ONLY the candidates (broadcast
    * membership join — the long tail never enters a shuffle) and keeps
    * those with true count strictly above `support · N`. Strict `>` on
    * both the sketch guarantee and the filter keeps the boundary
    * deterministic. Output: (column, n), exact — hash-gateable against
    * any engine's full group-by, at a fraction of its shuffle.
    */
  def heavyHitters(df: DataFrame, column: String, support: Double): DataFrame = {
    val cands = frequentValues(df, column, support)
      .select(explode(col(s"${column}_freqItems")).as(column))
    val total = df.agg(count(lit(1)).as("n_tot"))
    df.join(broadcast(cands), Seq(column))
      .groupBy(column).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n").cast("double") > lit(support) * col("n_tot").cast("double"))
      .select(col(column), col("n"))
  }
}

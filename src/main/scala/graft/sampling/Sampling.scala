package graft.sampling

import org.apache.spark.sql.DataFrame

/** Sampling operators for training-data curation — the standard knobs for
  * carving corpora at 100 TB, all seed-deterministic so a pipeline rerun
  * reproduces the same sample (replayability is the property that matters;
  * the exact row set is engine-specific, so these verify rows-only at the
  * driver and by property in ScalaTest).
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
}

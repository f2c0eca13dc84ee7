package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Corpus-curation operators beyond per-document filtering: benchmark
  * decontamination, sequence packing, and domain-mixture rebalancing —
  * the three set-level transforms every large-scale training-data
  * pipeline runs between "clean documents" and "training batches".
  */
object Curation {

  /** Benchmark decontamination: flag every corpus document sharing at
    * least one token n-gram with the benchmark (eval) set — the standard
    * n-gram-overlap rule for keeping test data out of training data.
    *
    * Scale shape: both sides explode to DISTINCT (doc, gram) pairs
    * map-side; the benchmark side collapses to distinct grams (a
    * benchmark is orders of magnitude smaller than the corpus, so
    * Catalyst broadcasts it when it fits and shuffle-joins on the gram
    * otherwise); one partial-agg count per corpus doc; a left join back
    * onto the corpus keeps never-matching (and gramless) docs with
    * n_shared = 0. Nothing is O(corpus²).
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 5): DataFrame = {
    def grams(df: DataFrame) = df.select(col(idCol),
      explode(array_distinct(
        TextFunctions.tokenNgrams(TextFunctions.tokens(col(textCol)), n))).as("g"))
    val benchGrams = grams(benchmark).select("g").distinct()
    val hits = grams(corpus).join(benchGrams, "g")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** GPT-style sequence packing: concatenate each partition's documents
    * in id order and cut at `cap`-token boundaries. Every document gets
    * the chunk its first token falls in, its token offset, and whether it
    * straddles a chunk boundary (the consumer decides: split, mask, or
    * drop). `cap` must be a power of two — chunk ids are then a pure bit
    * shift of the int64 offset, exact over the full int64 range and
    * trivially hash-verifiable against `floor(start_off / cap)` in any
    * engine.
    *
    * One window shuffle on the partition column; everything else is
    * map-side. The running sum is int64 (exact to 2^63 tokens — any
    * corpus).
    *
    * `tokenCount` is pluggable: the default bills by whitespace tokens
    * (SQL-checkable against the oracle); pass
    * `graft.text.Bpe.countCol(_, model)` to bill by EXACT trained-tokenizer
    * tokens — the unit a training run actually consumes.
    */
  def packSequences(docs: DataFrame, partCol: String, idCol: String,
      textCol: String, cap: Int = 256,
      tokenCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        TextFunctions.tokenCount): DataFrame = {
    require(cap > 0 && (cap & (cap - 1)) == 0, s"cap must be a power of two, got $cap")
    val shift = java.lang.Integer.numberOfTrailingZeros(cap)
    val w = Window.partitionBy(partCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), col(partCol),
        tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("start_off",
        coalesce(sum(col("n_tokens").cast("long")).over(w), lit(0L)))
      .withColumn("chunk_id", shiftright(col("start_off"), shift))
      .withColumn("spans_boundary",
        shiftright(col("start_off") + col("n_tokens") - 1, shift)
          > col("chunk_id"))
  }

  /** Deterministic train/val/test split: bucket on the first md5 byte of
    * the id — stable across runs, engines, partitionings, and corpus
    * growth (a document's split never changes when other documents are
    * added, unlike ratio-based `randomSplit`). Boundaries compare the hex
    * prefix LEXICOGRAPHICALLY ('cd' ≈ 80.1%, 'e7' ≈ 90.2%), which both
    * Java and DuckDB string orders agree on for lowercase hex. Pure
    * map-side projection.
    */
  def splitAssign(df: DataFrame, idCol: String,
      trainHex: String = "cd", valHex: String = "e7"): DataFrame = {
    val bucket = substring(md5(col(idCol).cast("string").cast("binary")), 1, 2)
    df.withColumn("split_bucket", bucket)
      .withColumn("split",
        when(col("split_bucket") < trainHex, "train")
          .when(col("split_bucket") < valHex, "val")
          .otherwise("test"))
  }

  /** Domain-mixture rebalancing: per-domain token shares and the sampling
    * rate that moves the corpus toward a UNIFORM target mix — rate =
    * min(target_share / actual_share, 1) (downsample the over-represented,
    * keep the rest). Domain cardinality is tiny, so the share window over
    * the aggregated frame is effectively free; the only real shuffle is
    * the per-domain aggregation.
    */
  def domainMix(docs: DataFrame, domainCols: Seq[String],
      textCol: String): DataFrame = {
    val all = Window.partitionBy()
    docs
      .groupBy(domainCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
      .withColumn("token_share",
        col("n_tokens").cast("double") / sum("n_tokens").over(all).cast("double"))
      .withColumn("target_share",
        lit(1.0) / count(lit(1)).over(all).cast("double"))
      .withColumn("sample_rate",
        least(col("target_share") / col("token_share"), lit(1.0)))
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
    * map-side; the benchmark side collapses to distinct grams. The
    * membership test is the asymmetric step — a benchmark is a FIXED
    * eval set, orders of magnitude smaller than a 100 TB corpus, so the
    * corpus side must never shuffle on the gram key. `benchSide` picks
    * how:
    *
    *  - `"broadcast"` (default): the distinct hashed benchmark grams are
    *    broadcast and the membership join is a map-side broadcast-hash
    *    join — ZERO corpus-gram exchange. Right whenever the gram set
    *    fits the broadcast budget (8-byte longs: tens of millions of
    *    grams).
    *  - `"bloom"`: a Bloom filter over the benchmark grams (built lazily
    *    as a scalar subquery — no eager driver job) prunes corpus grams
    *    MAP-SIDE first; only the tiny surviving fraction shuffles into
    *    the exact membership join, which removes the Bloom's false
    *    positives, so results are bit-identical to `"broadcast"`. Right
    *    when the gram set outgrows the broadcast budget.
    *  - `"shuffle"`: the plain shuffle join (both sides exchange on the
    *    gram key). Kept for comparison and as the no-assumptions
    *    fallback.
    *
    * After membership: one partial-agg count per corpus doc; a left join
    * back onto the corpus keeps never-matching (and gramless) docs with
    * n_shared = 0. Nothing is O(corpus²).
    *
    * `bloomExpectedGrams`/`bloomNumBits` size the `"bloom"` filter
    * (defaults: 4M grams in 64M bits ≈ 8 MB, ~0.4% FP — false positives
    * cost only wasted shuffle rows, never correctness).
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 5,
      benchSide: String = "broadcast",
      bloomExpectedGrams: Long = 4000000L,
      bloomNumBits: Long = 67108864L): DataFrame = {
    val benchGrams = benchGramSet(benchmark, textCol, idCol, n)
    val corpusGrams = docGrams(corpus, textCol, idCol, n)
    val matched = benchSide match {
      case "broadcast" => corpusGrams.join(broadcast(benchGrams), "g")
      case "bloom" =>
        // lazy Bloom build: bloom_filter_agg over the (small) benchmark
        // side, delivered to every corpus task as a scalar subquery —
        // Spark's own runtime-filter machinery, requested explicitly.
        // The follow-up exact join removes false positives.
        val bloom = benchGrams.agg(call_function("bloom_filter_build",
          col("g"), lit(bloomExpectedGrams), lit(bloomNumBits)).as("bf"))
          .scalar()
        corpusGrams
          .filter(call_function("bloom_might_contain", bloom, col("g")))
          .join(benchGrams, "g")
      case "shuffle" => corpusGrams.join(benchGrams.hint("shuffle_merge"), "g")
      case other => throw new IllegalArgumentException(
        s"decontaminate: benchSide must be broadcast|bloom|shuffle, got $other")
    }
    val hits = matched.groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** Distinct hashed token n-grams of a document frame — (id, g) pairs,
    * one row per distinct gram per doc. Grams travel as xxhash64 keys,
    * never strings: the membership join shuffles/sorts 8-byte longs
    * instead of ~n·wordlen-byte gram texts (measured at the 100× tier,
    * where the benchmark side outgrows the broadcast threshold and the
    * join becomes a sort-merge over ~60M gram strings: 99 s → the hashed
    * join's fraction of it). A 64-bit collision would count one phantom
    * shared gram per ~2⁶⁴ pairs — negligible against the operator's job
    * (a contamination FLAG), and the same accepted trade as the dedup
    * family's fingerprint keys. The hashes come from the NATIVE shingle
    * loop (one JVM pass per doc, same XXH64-seed-42 values as the old
    * string-gram + xxhash64 chain) — after the join strategy stopped
    * shuffling corpus grams, the interpreted transform/concat_ws gram
    * builder WAS the operator's remaining cost (measured sf10: ~52 s of
    * ~54 s total); docs shorter than n grams are filtered first, which
    * the loop's sub-width shingle would otherwise phantom-match.
    */
  def docGrams(df: DataFrame, textCol: String, idCol: String,
      n: Int): DataFrame =
    graft.core.Parallelism.ensure(df.select(col(idCol), col(textCol)))
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol),
        explode(graft.functions.Sketches.shingleSetN(col("toks"), n)).as("g"))

  /** The distinct hashed gram set of a benchmark (eval) frame — the
    * single-column (`g`) table a decontamination gate probes. Build once
    * and persist (or hand straight to [[contaminationFlags]]); a
    * benchmark is a FIXED eval set, so in a streaming pipeline this is
    * at-rest state computed at setup time, not per wave.
    */
  def benchGramSet(benchmark: DataFrame, textCol: String, idCol: String,
      n: Int = 5): DataFrame =
    docGrams(benchmark, textCol, idCol, n).select("g").distinct()

  /** Contamination HITS against a PREBUILT benchmark gram set: one row
    * per document sharing at least one gram — (idCol, n_shared). This is
    * the minimal stage state for composed pipelines: the hit set is
    * bounded by the documents that actually overlap the eval set (≪
    * corpus by the operator's purpose), so a pipeline can join it back
    * onto its corpus with a BROADCAST — preserving the corpus frame's
    * partitioning instead of funneling it through a corpus-sized
    * shuffle join (measured in the q119 fold: the shuffle join-back let
    * AQE coalesce the cached corpus to ~1 partition and serialized
    * every downstream wave kernel, +11 s at sf0.1). The gram set rides
    * a broadcast too — ZERO corpus-gram exchange, the right plan for
    * any benchmark that fits the broadcast budget (8-byte longs: tens
    * of millions of grams; past that, gate through [[decontaminate]]'s
    * `"bloom"` path instead).
    */
  def contaminationHits(docs: DataFrame, benchGrams: DataFrame,
      textCol: String, idCol: String, n: Int = 5): DataFrame =
    docGrams(docs, textCol, idCol, n)
      .join(broadcast(benchGrams), "g")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))

  /** Per-document contamination flags against a PREBUILT benchmark gram
    * set — [[contaminationHits]] joined back onto every input doc
    * (gramless and never-matching docs count 0). The hit side is small
    * by the operator's purpose, so the join-back is broadcast.
    *
    * Output: one row per input doc — (idCol, n_shared_grams,
    * contaminated).
    */
  def contaminationFlags(docs: DataFrame, benchGrams: DataFrame,
      textCol: String, idCol: String, n: Int = 5): DataFrame =
    docs.select(col(idCol))
      .join(broadcast(contaminationHits(docs, benchGrams, textCol, idCol, n)),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))

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

  /** Token-budget-constrained, quality-prioritized corpus selection: per
    * domain, admit documents in descending quality order until the
    * domain's token budget is exhausted — the selection step a curation
    * pipeline runs once quality scores and mixture targets exist ("give
    * me the best `budget` tokens of each domain").
    *
    * Quality here is the unique-token ratio (exact integer division on
    * both engines — the q20 gate proves the parity); ties break on
    * doc_id, so the running sum's visit order is fully deterministic.
    * A document is selected iff the cumulative token count THROUGH it
    * stays ≤ budget (first-fit prefix rule, not knapsack — deliberately:
    * prefix selection is deterministic, one-pass, and what production
    * pipelines actually ship).
    *
    * Scale shape: one hash shuffle on the domain key, then a per-domain
    * sort window whose state is a running long. A skew-heavy domain makes
    * that window's sort the bottleneck; the remedy at 100 TB is the same
    * two-phase value-histogram selection as the quality-binning op (cut
    * the quality axis first, sort only the boundary bucket) — worth it
    * only when a single domain outgrows a task's sort budget.
    */
  def budgetSelect(docs: DataFrame, textCol: String, idCol: String,
      domainCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    val toks = TextFunctions.tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"),
      col(domainCol).as("domain"),
      size(toks).cast("long").as("n_tokens"),
      (size(array_distinct(toks)).cast("double")
        / size(toks).cast("double")).as("quality"))
    val w = Window.partitionBy("domain")
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("selected", col("cum_tokens") <= budget)
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic between every pair of
    * the [[splitAssign]] splits over one numeric column — the standard
    * "did my train/val/test distributions diverge" gate a curation
    * pipeline runs after splitting (reference pipeline's quality checks
    * are per-column bounds, `tfl_transform_dag.py:50-61`; this is the
    * distribution-level generalization).
    *
    * D = max over v of |ecdf_a(v) − ecdf_b(v)|, computed EXACTLY: one
    * shuffle aggregates the corpus to a per-distinct-value histogram with
    * one count column per split; the cumulative window then runs over the
    * HISTOGRAM, whose size is bounded by the value domain (|distinct v|),
    * not the corpus — the same bounded-state argument as q83's quantile
    * histogram. For genuinely unbounded domains, bin the value first (the
    * statistic degrades gracefully to the binned KS). The max itself is
    * order-independent, and every double division is a single
    * (cum::double / n::double) mirrored on both engines, so the result is
    * hash-exact.
    */
  def ksDrift(df: DataFrame, valueCol: String, idCol: String): DataFrame = {
    val assigned = splitAssign(df.select(col(idCol), col(valueCol)), idCol)
    val hist = assigned.groupBy(col(valueCol).as("v")).agg(
      count(when(col("split") === "train", 1)).as("c_train"),
      count(when(col("split") === "val", 1)).as("c_val"),
      count(when(col("split") === "test", 1)).as("c_test"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.select(col("v"),
      sum("c_train").over(w).as("a"),
      sum("c_val").over(w).as("b"),
      sum("c_test").over(w).as("c"))
    val totals = assigned.groupBy().agg(
      count(when(col("split") === "train", 1)).as("n_train"),
      count(when(col("split") === "val", 1)).as("n_val"),
      count(when(col("split") === "test", 1)).as("n_test"))
    def ecdfGap(cumA: Column, nA: Column, cumB: Column, nB: Column) =
      max(abs(cumA.cast("double") / nA.cast("double")
        - cumB.cast("double") / nB.cast("double")))
    val stats = cum.crossJoin(broadcast(totals)).groupBy(
        col("n_train"), col("n_val"), col("n_test"))
      .agg(
        ecdfGap(col("a"), col("n_train"), col("b"), col("n_val")).as("d_tv"),
        ecdfGap(col("a"), col("n_train"), col("c"), col("n_test")).as("d_tt"),
        ecdfGap(col("b"), col("n_val"), col("c"), col("n_test")).as("d_vt"))
    stats.select(
      explode(array(
        struct(lit("train_val").as("pair"), col("n_train").as("n_a"),
          col("n_val").as("n_b"), col("d_tv").as("d_stat")),
        struct(lit("train_test").as("pair"), col("n_train").as("n_a"),
          col("n_test").as("n_b"), col("d_tt").as("d_stat")),
        struct(lit("val_test").as("pair"), col("n_val").as("n_a"),
          col("n_test").as("n_b"), col("d_vt").as("d_stat")))).as("r"))
      .select(col("r.pair").as("pair"), col("r.n_a").as("n_a"),
        col("r.n_b").as("n_b"), col("r.d_stat").as("d_stat"))
  }

  /** Two-sample KS drift of an incoming WAVE against a REFERENCE
    * distribution — the ingest-monitoring form of [[ksDrift]]: "does
    * this batch's value distribution still look like the corpus I
    * accepted so far?" The returned single row carries the exact D
    * statistic plus `drifted` = D > c(α)·√((n_ref+n_wave)/(n_ref·n_wave))
    * — the large-sample KS rejection bound at level α (c(0.05) = 1.358),
    * so the trigger is statistical, not an arbitrary knob: it tightens
    * automatically as both sides grow, exactly what a drift-triggered
    * maintenance policy needs (the text-distribution sibling of the IVF
    * occupancy trigger).
    *
    * Same bounded-state shape as [[ksDrift]]: one histogram aggregate
    * over reference ∪ wave (state = |distinct v|, never the corpus),
    * cumulative window over the histogram, order-independent max. Every
    * double op is mirrored — hash-exact in any engine. In a streaming
    * pipeline the reference side is at-rest state (e.g. the committed
    * verdicts' quality column, or a maintained per-value count ledger);
    * the wave side is the micro-batch.
    */
  def ksDriftAgainst(reference: DataFrame, wave: DataFrame,
      valueCol: String, alpha05C: Double = 1.358): DataFrame = {
    val hist = reference.select(col(valueCol).as("v"), lit(1).as("side"))
      .unionByName(wave.select(col(valueCol).as("v"), lit(2).as("side")))
      .groupBy("v").agg(
        count(when(col("side") === 1, 1)).as("c_ref"),
        count(when(col("side") === 2, 1)).as("c_wave"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.select(col("v"),
      sum("c_ref").over(w).as("a"), sum("c_wave").over(w).as("b"))
    val totals = hist.groupBy().agg(
      sum("c_ref").as("n_ref"), sum("c_wave").as("n_wave"))
    cum.crossJoin(broadcast(totals))
      .groupBy(col("n_ref"), col("n_wave"))
      .agg(max(abs(col("a").cast("double") / col("n_ref").cast("double")
        - col("b").cast("double") / col("n_wave").cast("double")))
        .as("d_stat"))
      .select(col("n_ref"), col("n_wave"), col("d_stat"),
        (col("d_stat") > lit(alpha05C) * sqrt(
          (col("n_ref") + col("n_wave")).cast("double")
            / (col("n_ref") * col("n_wave")).cast("double")))
          .as("drifted"))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType,
  StructField, StructType}

import graft.dedup.Dedup

/** END-TO-END streaming curation: quality gate → exact dedup against the
  * fingerprint ledger of every SEEN survivor → approximate near-dup
  * admission against the sig/band ledgers of every ADMITTED doc — the
  * full training-data ingest path as ONE exactly-once `foreachBatch`
  * pipeline (the streaming form of q116, which gates the composed stage
  * semantics hash-exact against a four-wave unrolled DuckDB oracle).
  *
  * Stage choices, and why these ledgers hold what they hold:
  *  - the FP ledger records every exact-stage survivor (SEEN, not just
  *    admitted): an identical copy of a doc that later failed near-dup
  *    admission is rejected at the cheap fingerprint anti-join instead of
  *    re-running banding + estimator verify for the same inevitable
  *    verdict;
  *  - the band/sig ledgers hold ADMITTED docs only — the admission
  *    contract ([[NearDupStream]]): "near-dup of anything admitted",
  *    256 B/doc state, no token-sized ledger anywhere in the pipeline.
  *
  * Verdict rows carry STAGE ATTRIBUTION — (doc_id, quality, q_pass,
  * exact_new, admitted, first_match) — so downstream consumers can split
  * rejects by cause without re-deriving anything.
  *
  * Exactly-once: every stage reads COMMITTED ledger state only, so the
  * whole verdict is a pure function of (batch, committed ledgers);
  * verdict commits FIRST, ledgers LAST (fps → bands → sigs), and the
  * ledger rows are re-derived from the DURABLE verdict parquet
  * ([[NearDupStream.writer]]'s recacheByPath argument — the in-memory
  * plans read the very dirs the appends touch).
  */
object CurationStream {

  val VerdictSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("quality", DoubleType),
    StructField("q_pass", BooleanType),
    StructField("exact_new", BooleanType),
    StructField("admitted", BooleanType),
    StructField("first_match", LongType)))

  /** [[VerdictSchema]] plus the decontamination stage's attribution:
    * shared-gram count and the clean flag (non-NULL/true only for
    * quality passers — the stage's input). */
  val VerdictSchemaDecontam: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("quality", DoubleType),
    StructField("q_pass", BooleanType),
    StructField("n_shared_grams", LongType),
    StructField("clean", BooleanType),
    StructField("exact_new", BooleanType),
    StructField("admitted", BooleanType),
    StructField("first_match", LongType)))

  /** Committed per-doc verdicts across all batches. */
  def verdicts(spark: SparkSession, verdictDir: String): DataFrame =
    IdempotentSink.readCommitted(spark, verdictDir, Some(VerdictSchema))

  /** Committed per-doc verdicts of a [[decontamWriter]] pipeline. */
  def verdictsDecontam(spark: SparkSession, verdictDir: String): DataFrame =
    IdempotentSink.readCommitted(spark, verdictDir,
      Some(VerdictSchemaDecontam))

  /** Build the benchmark gram ledger a [[decontamWriter]] probes — the
    * distinct hashed n-grams of the eval set, written ONCE at pipeline
    * setup (a benchmark is fixed data; the stream never re-grams it).
    */
  def writeBenchGrams(benchmark: DataFrame, textCol: String, idCol: String,
      dir: String, n: Int = 5): Unit =
    graft.pipeline.Curation.benchGramSet(benchmark, textCol, idCol, n)
      .write.mode("overwrite").parquet(dir)

  /** Compact all three ledgers on the usual maintenance cadence: fps
    * fp-bucketed ([[DedupStream.compactLedger]]), bands/sigs via
    * [[NearDupStream.compactLedgersApprox]]. */
  def compactLedgers(spark: SparkSession, fpsDir: String, bandsDir: String,
      sigsDir: String, buckets: Int = 8): Unit = {
    DedupStream.compactLedger(spark, fpsDir, buckets)
    NearDupStream.compactLedgersApprox(spark, bandsDir, sigsDir, buckets)
    ()
  }

  /** The `foreachBatch` function:
    * {{{
    * docs.writeStream.foreachBatch(CurationStream.writer(
    *   out, fps, bands, sigs, "text", "doc_id"))
    * }}}
    */
  def writer(verdictDir: String, fpsDir: String, bandsDir: String,
      sigsDir: String, textCol: String, idCol: String,
      qualityThreshold: Double = 0.7, simThreshold: Double = 0.5,
      portable: Boolean = false,
      compactEvery: Int = 0): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      val scoped = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]
      val waveScope: DataFrame => DataFrame =
        d => { val p = d.persist(); scoped.add(p); p }
      // quality + fingerprint in one pass over the batch source; every
      // downstream frame reads this cache (lineage = batch source only,
      // safe from the ledger appends' recacheByPath invalidation)
      val scored = waveScope(batch.select(
        col(idCol).as("id"), col(textCol).as("text"),
        graft.text.TextFunctions.qualityScore(col(textCol)).as("quality"),
        graft.text.TextFunctions.fingerprint(col(textCol)).as("fp")))
      val exactNew = waveScope(scored
        .filter(col("quality") >= qualityThreshold)
        .join(DedupStream.ledgerFps(spark, fpsDir).select("fp").distinct(),
          Seq("fp"), "left_anti")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("fp").orderBy("id")))
        .filter(col("rn") === 1).drop("rn"))
      val toks = graft.text.TextFunctions.tokens(col("text"))
      val sk = waveScope(exactNew.select(col("id"),
        (if (portable) graft.functions.Sketches.minhashTokensPortable(toks)
         else graft.functions.Sketches.minhashTokens(toks)).as("sig")))
      val admission = Dedup.MinHashLsh.nearDupAdmitApproxSketched(
        sk, NearDupStream.ledgerBandsApprox(spark, bandsDir),
        NearDupStream.ledgerSigs(spark, sigsDir), simThreshold, waveScope,
        hotBandCap = 4096)
      val verdict = scored
        .select(col("id").as("doc_id"), col("quality"),
          (col("quality") >= qualityThreshold).as("q_pass"))
        .join(exactNew.select(col("id").as("doc_id"),
          lit(true).as("en")), Seq("doc_id"), "left")
        .join(admission.select(col("doc_id"),
          col("admitted").as("adm"), col("first_match")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("quality"), col("q_pass"),
          coalesce(col("en"), lit(false)).as("exact_new"),
          coalesce(col("adm"), lit(false)).as("admitted"),
          col("first_match"))
        .persist()
      try {
        IdempotentSink.writer(verdictDir,
          onReplay = _ => batch.foreach(_ => ()))(verdict, batchId)
        // ledger rows from the JUST-COMMITTED verdict parquet (see the
        // class doc); the joins hit the persisted scored/sk caches —
        // batch-sized work, no stage re-runs
        val durable = spark.read.parquet(s"$verdictDir/batch=$batchId")
        IdempotentSink.writer(fpsDir, onReplay = _ => ())(
          scored.join(durable.filter(col("exact_new"))
            .select(col("doc_id").as("id")), Seq("id"))
            .select("fp"), batchId)
        val admittedSk = sk.join(durable.filter(col("admitted"))
          .select(col("doc_id").as("id")), Seq("id"))
        IdempotentSink.writer(bandsDir, onReplay = _ => ())(
          Dedup.MinHashLsh.bandRowsOfSigs(admittedSk), batchId)
        IdempotentSink.writer(sigsDir, onReplay = _ => ())(
          admittedSk.select("id", "sig"), batchId)
      } finally {
        verdict.unpersist()
        scoped.forEach(_.unpersist())
      }
      if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
        compactLedgers(spark, fpsDir, bandsDir, sigsDir)
      ()
    }

  /** [[writer]] with the remaining production stage composed in: quality
    * gate → BENCHMARK DECONTAMINATION against the gram ledger
    * [[writeBenchGrams]] built at setup → exact dedup → approx near-dup
    * admission (the streaming form of q119, which gates the composed
    * semantics hash-exact against a four-wave unrolled DuckDB oracle).
    *
    * Decontamination runs BEFORE the dedup ledgers on purpose: a
    * contaminated doc never enters the fp/band/sig ledgers, so eval-set
    * text can never become the retained survivor that knocks out a CLEAN
    * near-copy. The stage is ledger-FREE on the stream side — the gram
    * set is fixed at-rest state probed via broadcast — so the per-wave
    * cost over [[writer]] is one map-side gram pass on that wave's
    * quality survivors, and the exactly-once argument is unchanged (the
    * verdict stays a pure function of (batch, committed ledgers, static
    * gram set)).
    */
  def decontamWriter(verdictDir: String, fpsDir: String, bandsDir: String,
      sigsDir: String, benchGramsDir: String, textCol: String,
      idCol: String, qualityThreshold: Double = 0.7,
      simThreshold: Double = 0.5, gramN: Int = 5,
      portable: Boolean = false,
      compactEvery: Int = 0): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      val scoped = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]
      val waveScope: DataFrame => DataFrame =
        d => { val p = d.persist(); scoped.add(p); p }
      val scored = waveScope(batch.select(
        col(idCol).as("id"), col(textCol).as("text"),
        graft.text.TextFunctions.qualityScore(col(textCol)).as("quality"),
        graft.text.TextFunctions.fingerprint(col(textCol)).as("fp")))
      val qp = scored.filter(col("quality") >= qualityThreshold)
      // static at-rest state: never appended by this pipeline, so the
      // cached flags plan is safe from recacheByPath invalidation
      val benchGrams = spark.read.parquet(benchGramsDir)
      // localCheckpoint, not a waveScope persist: the gram/broadcast
      // subtree would otherwise be re-ANALYZED by each of the wave's ~6
      // commit actions (persist substitutes the cache only after
      // analysis) — measured +17 s/wave at sf0.1 with CPU flat, the
      // q119 fold's driver-analysis lesson in streaming form. The
      // checkpoint is wave-sized and eager; its blocks free via the
      // ContextCleaner once the wave's frames are unreachable.
      val flags = graft.pipeline.Curation.contaminationFlags(
        qp.select("id", "text"), benchGrams, "text", "id", gramN)
        .localCheckpoint()
      val cleanDocs = qp.join(
        flags.filter(!col("contaminated")).select("id"), Seq("id"))
      val exactNew = waveScope(cleanDocs
        .join(DedupStream.ledgerFps(spark, fpsDir).select("fp").distinct(),
          Seq("fp"), "left_anti")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("fp").orderBy("id")))
        .filter(col("rn") === 1).drop("rn"))
      val toks = graft.text.TextFunctions.tokens(col("text"))
      val sk = waveScope(exactNew.select(col("id"),
        (if (portable) graft.functions.Sketches.minhashTokensPortable(toks)
         else graft.functions.Sketches.minhashTokens(toks)).as("sig")))
      val admission = Dedup.MinHashLsh.nearDupAdmitApproxSketched(
        sk, NearDupStream.ledgerBandsApprox(spark, bandsDir),
        NearDupStream.ledgerSigs(spark, sigsDir), simThreshold, waveScope,
        hotBandCap = 4096)
      val verdict = scored
        .select(col("id").as("doc_id"), col("quality"),
          (col("quality") >= qualityThreshold).as("q_pass"))
        .join(flags.select(col("id").as("doc_id"),
          col("n_shared_grams"), col("contaminated")), Seq("doc_id"), "left")
        .join(exactNew.select(col("id").as("doc_id"),
          lit(true).as("en")), Seq("doc_id"), "left")
        .join(admission.select(col("doc_id"),
          col("admitted").as("adm"), col("first_match")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("quality"), col("q_pass"),
          col("n_shared_grams"),
          // flags rows exist iff q_pass — already (q_pass AND clean)
          coalesce(!col("contaminated"), lit(false)).as("clean"),
          coalesce(col("en"), lit(false)).as("exact_new"),
          coalesce(col("adm"), lit(false)).as("admitted"),
          col("first_match"))
        .persist()
      try {
        IdempotentSink.writer(verdictDir,
          onReplay = _ => batch.foreach(_ => ()))(verdict, batchId)
        val durable = spark.read.parquet(s"$verdictDir/batch=$batchId")
        IdempotentSink.writer(fpsDir, onReplay = _ => ())(
          scored.join(durable.filter(col("exact_new"))
            .select(col("doc_id").as("id")), Seq("id"))
            .select("fp"), batchId)
        val admittedSk = sk.join(durable.filter(col("admitted"))
          .select(col("doc_id").as("id")), Seq("id"))
        IdempotentSink.writer(bandsDir, onReplay = _ => ())(
          Dedup.MinHashLsh.bandRowsOfSigs(admittedSk), batchId)
        IdempotentSink.writer(sigsDir, onReplay = _ => ())(
          admittedSk.select("id", "sig"), batchId)
      } finally {
        verdict.unpersist()
        scoped.forEach(_.unpersist())
      }
      if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
        compactLedgers(spark, fpsDir, bandsDir, sigsDir)
      ()
    }
}

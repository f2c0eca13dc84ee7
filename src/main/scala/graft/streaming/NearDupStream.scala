package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, BooleanType, LongType, StructField, StructType}

import graft.dedup.Dedup

/** Streaming near-dup ADMISSION: the streaming form of
  * [[graft.dedup.Dedup.MinHashLsh.nearDupIncrementalLedger]] (q104), as
  * [[DedupStream]] is of exact incremental dedup (q100) — each
  * micro-batch's documents are admitted unless they verify
  * `jaccard >= threshold` against anything ALREADY ADMITTED or a
  * smaller id in the same batch, with exactly-once output.
  *
  * Note the semantics are STRONGER than q104's one-pass batch rule
  * against a raw corpus: the persisted ledgers hold only ADMITTED
  * documents, so the cross-batch check is the true "near-dup of anything
  * admitted" — only the within-batch tie-break keeps the order-free
  * smaller-id rule (documented in `nearDupIncrementalLedger`).
  *
  * State = two persisted ledgers on the sink filesystem, not a state
  * store (the [[DedupStream]] argument — unbounded sketch state cannot
  * live in executor checkpoints at corpus scale):
  *
  *  - `bandsDir`: (band, bkey, id, kpfx, sz) rows of admitted docs — the
  *    LSH candidate index plus the first-shared-band prefix and
  *    shingle-set size the q31-shape candidate join prunes with;
  *    [[compactLedgers]] absorbs the per-batch dirs into ONE table
  *    bucketed on (band, bkey), so the per-batch candidate join's ledger
  *    side plans with zero Exchange (spec-pinned), and backfills kpfx/sz
  *    for rows persisted before those columns existed;
  *  - `setsDir`:  (id, sset) rows — exact-verification shingle sets,
  *    consulted only for verified-candidate ids; compacted to an
  *    id-bucketed table the verification join reads exchange-free.
  *
  * [[approxWriter]] is the SIGNATURE-ONLY mode: the sset ledger — the
  * one state component above that scales with corpus TOKENS rather than
  * corpus rows — is replaced by a 256 B/doc signature ledger, and
  * verification by the `sig_agreement / 32` estimator (banding recall
  * < 1 by design; this writer's `jaccard` is exact). Same exactly-once
  * protocol, same compaction contract, ~O(corpus rows) total state.
  *
  * Run [[compactLedgers]] on the same maintenance cadence as
  * [[DedupStream.compactLedger]] (it shares [[LedgerCompaction]]'s
  * crash-safety and deferred-cleanup contract): without it a long-running
  * stream accumulates one `batch=` dir per micro-batch and every batch
  * re-lists and re-reads all of them — per-batch cost growing with
  * stream age, the exact small-file pathology compaction kills.
  *
  * Exactly-once across crash/replay with NO cross-write transaction,
  * by [[DedupStream]]'s argument extended to three sinks: admission is a
  * pure function of (batch data, COMMITTED ledgers), and the verdict
  * commits FIRST, the ledgers LAST. At any kill point a replay
  * recomputes the identical verdict (committed ledgers unchanged —
  * foreachBatch replays batch N before N+1 ever runs) and rebuilds
  * whichever ledger batches lack markers; the reverse order would let a
  * committed ledger without its verdict reject the replay's own
  * documents.
  */
object NearDupStream {

  private val BandsSchema = StructType(Seq(
    StructField("band", org.apache.spark.sql.types.IntegerType),
    StructField("bkey", LongType),
    StructField("id", LongType),
    // the two columns nearDupIncrementalLedger's q31-shape candidate join
    // needs on the LEDGER side (see Dedup.MinHashLsh.bandsFor): nullable,
    // because rows persisted before the columns existed read as null
    // (LedgerCompaction scans batch dirs WITH this schema, null-filling
    // per pre-upgrade file) until [[compactLedgers]]' backfill rebuilds
    // them — without them every micro-batch runs the admission join's
    // null fallback: per-shared-band duplicated candidates and no size
    // prefilter, strictly more verify work per batch forever
    StructField("kpfx", ArrayType(LongType), nullable = true),
    StructField("sz", org.apache.spark.sql.types.IntegerType, nullable = true)))
  private val SetsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("sset", ArrayType(LongType, containsNull = false))))
  // the APPROXIMATE (signature-only) mode's ledgers: band rows without
  // `sz` (no shingle-set size exists — the estimator verify needs none)
  // and a 256 B/doc signature ledger in place of the O(tokens) sset one
  private val ApproxBandsSchema = StructType(Seq(
    StructField("band", org.apache.spark.sql.types.IntegerType),
    StructField("bkey", LongType),
    StructField("id", LongType),
    StructField("kpfx", ArrayType(LongType), nullable = true)))
  private val SigsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("sig", ArrayType(LongType, containsNull = false))))
  private val VerdictSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("admitted", BooleanType),
    StructField("first_match", LongType)))
  // the incremental CLUSTER ledgers ([[clusterWriter]]): one label row per
  // doc, written in its own wave, plus append-only merge redirects — see
  // [[graft.dedup.IncrementalClusters]] for the state model
  private[streaming] val LabelsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("label", LongType)))
  private[streaming] val MergesSchema = StructType(Seq(
    StructField("old_label", LongType),
    StructField("new_label", LongType)))

  /** Committed band ledger (typed-empty on cold start): the (band,bkey)-
    * bucketed compacted table unioned with dirs committed since — the
    * table alone, partitioning intact, once fully compacted. */
  def ledgerBands(spark: SparkSession, bandsDir: String): DataFrame =
    LedgerCompaction.read(spark, bandsDir, BandsSchema)

  /** Committed shingle-set ledger (typed-empty on cold start); id-bucketed
    * at rest after [[compactLedgers]]. */
  def ledgerSets(spark: SparkSession, setsDir: String): DataFrame =
    LedgerCompaction.read(spark, setsDir, SetsSchema)

  /** Committed APPROX band ledger (typed-empty on cold start); (band,
    * bkey)-bucketed at rest after [[compactLedgersApprox]]. */
  def ledgerBandsApprox(spark: SparkSession, bandsDir: String): DataFrame =
    LedgerCompaction.read(spark, bandsDir, ApproxBandsSchema)

  /** Committed signature ledger (typed-empty on cold start); id-bucketed
    * at rest after [[compactLedgersApprox]] — 256 B per admitted doc,
    * the approx mode's ENTIRE verification state. */
  def ledgerSigs(spark: SparkSession, sigsDir: String): DataFrame =
    LedgerCompaction.read(spark, sigsDir, SigsSchema)

  /** Absorb both ledgers' `batch=` dirs into their bucketed tables —
    * bands on (band, bkey) (the candidate join's exact key), ssets on id
    * (the verification join's key) — via [[LedgerCompaction.compact]],
    * whose marker discipline makes each ledger's switch individually
    * atomic to readers. The two ledgers compact INDEPENDENTLY: admission
    * only needs each read to be complete for its committed batches, and a
    * crash between the two calls just leaves one ledger compacted and the
    * other absorbed on the next invocation (rows, not generations, carry
    * the semantics). Returns the active (bands, sets) table names.
    *
    * Band rows persisted BEFORE the kpfx/sz columns existed are BACKFILLED
    * here (see [[backfillBands]]), so one compaction upgrades a
    * pre-upgrade ledger in place and the admission join's null fallback
    * (per-shared-band duplicate candidates, no size prefilter) stops
    * firing for absorbed history. The bands compaction reads the sset
    * ledger's CURRENT committed rows for sz — safe, because a doc's sset
    * row commits in the same batch as its band rows ([[writer]]) and
    * compaction never removes rows.
    */
  def compactLedgers(spark: SparkSession, bandsDir: String, setsDir: String,
      buckets: Int = 8): (Option[String], Option[String]) =
    (LedgerCompaction.compact(spark, bandsDir, BandsSchema,
        Seq("band", "bkey"), buckets,
        backfillBands(ledgerSets(spark, setsDir))),
      LedgerCompaction.compact(spark, setsDir, SetsSchema,
        Seq("id"), buckets))

  /** [[compactLedgers]] for the APPROX mode's ledgers — bands bucketed on
    * (band, bkey) with the same kpfx backfill (minus `sz`, which this
    * mode's schema doesn't carry), signatures bucketed on id (the
    * estimator verify's join key, so a compacted sig ledger ships
    * nothing per batch). The two compact independently, as in the exact
    * mode: rows, not generations, carry the semantics.
    */
  def compactLedgersApprox(spark: SparkSession, bandsDir: String,
      sigsDir: String, buckets: Int = 8): (Option[String], Option[String]) =
    (LedgerCompaction.compact(spark, bandsDir, ApproxBandsSchema,
        Seq("band", "bkey"), buckets, backfillKpfx),
      LedgerCompaction.compact(spark, sigsDir, SigsSchema,
        Seq("id"), buckets))

  /** Rebuild kpfx/sz for band rows written before the columns existed
    * (read as null through [[BandsSchema]]): a doc's `kpfx` at band b is
    * the slice of its full band-key array below b, and the ledger holds
    * ALL of the doc's (band, bkey) rows — written atomically in one batch
    * — so the array reconstructs exactly from the doc's own rows, sorted
    * by band; `sz` is the doc's shingle-set size, joined from the sset
    * ledger (left join: a row whose sset is unreachable keeps sz null,
    * which every consumer treats as "prefilter passes"). Pure and
    * deterministic, as [[LedgerCompaction.compact]]'s transform contract
    * requires. Rows that already carry the columns pass through untouched;
    * a doc can never hold a MIX of pre- and post-upgrade rows (its 8 band
    * rows commit in one batch with one writer binary), so the group-by
    * always sees the doc's complete band set.
    */
  private def backfillBands(sets: DataFrame)(bands: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val legacy = bands.filter(col("kpfx").isNull)
    val ok = bands.filter(col("kpfx").isNotNull)
    val rebuilt = rebuildKpfx(legacy)
      .join(sets.select(col("id"), size(col("sset")).as("sz")).distinct(),
        Seq("id"), "left")
      .select("band", "bkey", "id", "kpfx", "sz")
    ok.unionByName(rebuilt)
  }

  /** [[backfillBands]] for the APPROX band ledger: kpfx-only (this
    * schema carries no `sz`). Null-kpfx rows exist only when a foreign
    * producer appended bare (band, bkey, id) rows — the same rebuild
    * restores the admission join's first-shared-band pruning for them.
    */
  private def backfillKpfx(bands: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    bands.filter(col("kpfx").isNotNull)
      .unionByName(rebuildKpfx(bands.filter(col("kpfx").isNull)))
  }

  /** Reconstruct (band, bkey, id, kpfx) from bare (band, bkey, id) rows:
    * a doc's `kpfx` at band b is the slice of its full band-key array
    * below b, and the ledger holds ALL of the doc's band rows (written
    * atomically in one batch), so the array rebuilds exactly from the
    * doc's own rows sorted by band. Pure and deterministic, as
    * [[LedgerCompaction.compact]]'s transform contract requires.
    */
  private def rebuildKpfx(legacy: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    legacy.select("band", "bkey", "id")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("band"), col("bkey")))).as("bb"))
      .select(col("id"),
        transform(col("bb"), e => e.getField("bkey")).as("bkeys"),
        explode(col("bb")).as("e"))
      .select(col("e.band").as("band"), col("e.bkey").as("bkey"), col("id"),
        slice(col("bkeys"), lit(1), col("e.band")).as("kpfx"))
  }

  /** Committed verdicts across all batches. */
  def verdicts(spark: SparkSession, verdictDir: String): DataFrame =
    IdempotentSink.readCommitted(spark, verdictDir, Some(VerdictSchema))

  /** Committed per-doc label ledger (typed-empty on cold start);
    * id-bucketed at rest after [[compactClusterLedgers]]. */
  def ledgerLabels(spark: SparkSession, labelsDir: String): DataFrame =
    LedgerCompaction.read(spark, labelsDir, LabelsSchema)

  /** Committed merge-redirect ledger (typed-empty on cold start);
    * old_label-bucketed and rewritten to depth-1 closure form by
    * [[compactClusterLedgers]]. */
  def ledgerMerges(spark: SparkSession, mergesDir: String): DataFrame =
    LedgerCompaction.read(spark, mergesDir, MergesSchema)

  /** Current cluster assignments from the ledger state — q107's output
    * shape ((doc_id, comp, csize), clusters of ≥ 2 only), equal to the
    * from-scratch pair plan + closure over everything the stream absorbed
    * (spec-pinned parity; q108 gates the batch fold against the same
    * oracle). */
  def clusterAssignments(spark: SparkSession, labelsDir: String,
      mergesDir: String): DataFrame =
    graft.dedup.IncrementalClusters.clusters(
      ledgerLabels(spark, labelsDir), ledgerMerges(spark, mergesDir))

  /** The `foreachBatch` function:
    * {{{
    * stream.writeStream.foreachBatch(
    *   NearDupStream.writer(out, bands, sets, "text", "doc_id", 0.5))
    * }}}
    * Emits one (doc_id, admitted, first_match) verdict row per batch doc
    * under `verdictDir/batch=<id>`, and the band/sset rows of ADMITTED
    * docs under the two ledger dirs.
    *
    * `compactEvery > 0` runs [[compactLedgers]] from inside the batch
    * function once per that many batches — the built-in maintenance
    * cadence, single-writer-safe by construction (foreachBatch IS the
    * micro-batch); see [[DedupStream.writer]] for the contract.
    */
  def writer(verdictDir: String, bandsDir: String, setsDir: String,
      textCol: String, idCol: String, threshold: Double = 0.5,
      portable: Boolean = false,
      compactEvery: Int = 0): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      // ONE persisted sketch frame for the whole batch: sig and sset come
      // from a single shingle traversal (graft.functions.MinHashSigSet,
      // sz = set length), and admission plus BOTH ledger writes read it
      // from cache — the previous independent bandsFor/setsFor plans paid
      // the shingle-hashing pass (the sketch stage's dominant cost) four
      // times per wave: twice inside admission, twice re-sketching the
      // admitted docs. Lineage reads only the batch source (never the
      // ledger dirs), so the ledger writes below cannot invalidate it.
      // Batch-bounded memory, same persist contract as the verdict.
      val toks = graft.text.TextFunctions.tokens(col(textCol))
      val sk = batch
        .select(col(idCol).as("id"),
          (if (portable) graft.functions.Sketches.minhashSigSetPortable(toks)
           else graft.functions.Sketches.minhashSigSet(toks)).as("ms"))
        .select(col("id"), col("ms.sig").as("sig"), col("ms.sset").as("sset"))
        .withColumn("sz", org.apache.spark.sql.functions.size(col("sset")))
        .persist()
      // tracked persist for the admission plan's internal mid-frames
      // (banded batch rows, candidate pairs — each consumed by several
      // subtrees): the default session-lifetime cache would accumulate
      // one entry per wave forever on an unbounded stream, so the writer
      // owns the lifecycle and releases them with the wave
      val scoped = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]
      val waveScope: DataFrame => DataFrame =
        d => { val p = d.persist(); scoped.add(p); p }
      // hotBandCap = 4096: the long-lived at-rest band ledger is exactly
      // the hot-bucket-guard exposure (see Dedup.guardedCorpusCandidates)
      // — on the EXACT path identically to the approx one
      val verdict = Dedup.MinHashLsh.nearDupAdmitSketched(
        sk, batch,
        ledgerBands(spark, bandsDir), ledgerSets(spark, setsDir),
        threshold, waveScope, hotBandCap = 4096).persist()
      try {
        // on a marker-hit replay evaluate only the SOURCE batch, not the
        // discarded admission plan: there is no state store between the
        // file source and this sink (the admission joins are stateless),
        // so the default full evaluation would pay the pipeline's most
        // expensive plan twice per replayed batch for nothing — and in
        // the crash window where this batch's ledger rows are already
        // committed, pay it against ledgers containing the batch's own
        // rows (result discarded either way; verdicts stay correct via
        // the durable parquet read below)
        IdempotentSink.writer(verdictDir,
          onReplay = _ => batch.foreach(_ => ()))(verdict, batchId)
        // the ledger writes re-derive the admitted set from the
        // JUST-COMMITTED verdict parquet, not from the in-memory verdict
        // plan: that plan's lineage reads the very ledger dirs the next
        // two writes append to, and any cache invalidation
        // (CacheManager.recacheByPath fires when a written path overlaps
        // a cached scan's roots) would re-derive the verdict against
        // ledgers that already contain this batch — every doc then
        // rejects against itself. Reading the durable verdict severs
        // that lineage entirely; on a replay whose verdict marker
        // already exists the batch dir is present and identical, so the
        // read is the same either way. The admitted filter joins the
        // PERSISTED sketch to the durable verdict — batch-sized work, no
        // re-traversal, and sk's lineage (batch source only) keeps it
        // safe from the recacheByPath invalidation the ledger writes fire.
        val admittedSk = sk.join(
          spark.read.parquet(s"$verdictDir/batch=$batchId")
            .filter(col("admitted"))
            .select(col("doc_id").as("id")), Seq("id"))
        // ledger sinks: a marker-hit replay needs no evaluation at all —
        // the verdict sink above already evaluated the batch source, and
        // these frames are projections of the durable verdict ⨝ sketch
        IdempotentSink.writer(bandsDir, onReplay = _ => ())(
          Dedup.MinHashLsh.bandRowsOf(admittedSk.select("id", "sig", "sz")),
          batchId)
        IdempotentSink.writer(setsDir, onReplay = _ => ())(
          admittedSk.select("id", "sset"), batchId)
      } finally {
        verdict.unpersist(); sk.unpersist()
        scoped.forEach(_.unpersist())
      }
      if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
        compactLedgers(spark, bandsDir, setsDir)
      ()
    }

  /** APPROXIMATE (signature-only) streaming admission — [[writer]] with
    * [[graft.dedup.Dedup.MinHashLsh.nearDupIncrementalLedgerApprox]]'s
    * estimator contract: a batch doc is rejected iff it shares ≥ 1
    * signature band with an ADMITTED doc or a smaller-id batch doc AND
    * the estimated similarity (signature agreement / 32) is ≥
    * `threshold`. Banding recall < 1 by design — the standard
    * LSH-approximate contract; [[writer]] remains the exact-verified
    * mode.
    *
    * The 100 TB payoff is the STATE: per admitted doc this mode persists
    * 8 band rows plus one 256 B signature — constant in document length —
    * where the exact mode's sset ledger re-encodes the corpus' tokens
    * (already 2× the band ledger's bytes at sf1, and at 100 TB it IS the
    * corpus). Per-wave compute drops too: ONE minhash kernel pass per
    * batch, no shingle-set materialization, no per-pair array
    * intersections — the verify stage is a codegen `sig_agreement` over
    * two 32-long arrays.
    *
    * Same exactly-once protocol as [[writer]] (verdict-first /
    * ledgers-last, marker-skipped replays, re-derive-from-durable-verdict
    * severing the recacheByPath invalidation) — the argument there is
    * mode-agnostic: admission is a pure function of (batch data,
    * COMMITTED ledgers) in both modes. `compactEvery` runs
    * [[compactLedgersApprox]] on the same cadence contract.
    */
  def approxWriter(verdictDir: String, bandsDir: String, sigsDir: String,
      textCol: String, idCol: String, threshold: Double = 0.5,
      portable: Boolean = false,
      compactEvery: Int = 0): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      val toks = graft.text.TextFunctions.tokens(col(textCol))
      // ONE persisted (id, sig) frame per wave: admission and both ledger
      // writes read it from cache; lineage reads only the batch source,
      // so the ledger writes below cannot invalidate it
      val sk = batch
        .select(col(idCol).as("id"),
          (if (portable) graft.functions.Sketches.minhashTokensPortable(toks)
           else graft.functions.Sketches.minhashTokens(toks)).as("sig"))
        .persist()
      // one count materializes the wave persist AND feeds the verify-
      // broadcast gate (knownRows) — the admission plan then schedules no
      // extra driver job per wave (spec-pinned: constructing the verdict
      // frame with knownRows runs zero jobs)
      val waveRows = sk.count()
      val scoped = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]
      val waveScope: DataFrame => DataFrame =
        d => { val p = d.persist(); scoped.add(p); p }
      val verdict = Dedup.MinHashLsh.nearDupAdmitApproxSketched(
        sk, ledgerBandsApprox(spark, bandsDir), ledgerSigs(spark, sigsDir),
        threshold, waveScope, knownRows = Some(waveRows),
        hotBandCap = 4096).persist()
      try {
        IdempotentSink.writer(verdictDir,
          onReplay = _ => batch.foreach(_ => ()))(verdict, batchId)
        val admittedSk = sk.join(
          spark.read.parquet(s"$verdictDir/batch=$batchId")
            .filter(col("admitted"))
            .select(col("doc_id").as("id")), Seq("id"))
        IdempotentSink.writer(bandsDir, onReplay = _ => ())(
          Dedup.MinHashLsh.bandRowsOfSigs(admittedSk), batchId)
        IdempotentSink.writer(sigsDir, onReplay = _ => ())(
          admittedSk.select("id", "sig"), batchId)
      } finally {
        verdict.unpersist(); sk.unpersist()
        scoped.forEach(_.unpersist())
      }
      if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
        compactLedgersApprox(spark, bandsDir, sigsDir)
      ()
    }

  /** Incrementally-maintained APPROX duplicate CLUSTERS — the streaming
    * consumer the admission writers don't cover: every arriving doc (no
    * admission filter — clustering tracks the full corpus, as q107 does)
    * is folded into persisted per-doc cluster labels, so
    * [[clusterAssignments]] is current after every wave without re-running
    * the corpus-wide pair plan + closure. State model and per-wave
    * algorithm: [[graft.dedup.IncrementalClusters]]; the wave's edges come
    * from the same banded-candidate + estimator-verify kernel as
    * [[approxWriter]] (signature-only — no shingle set anywhere).
    *
    * Exactly-once across crash/replay, [[writer]]'s argument specialized:
    * the fold is a pure function of (batch, COMMITTED ledgers), and the
    * four sinks commit in the order labels → merges → bands → sigs. At any
    * kill point the replay's fold re-derives the uncommitted suffix
    * exactly: with the wave's labels already committed, edge endpoints
    * resolve to their final components and the fold re-emits identical
    * rows (a lost merge row re-emerges because the stale label it
    * redirects still resolves to itself — [[graft.dedup.IncrementalClusters
    * .foldWave]]'s replay analysis); committed sinks skip via markers.
    * Cache safety needs no durable-verdict re-read here (contrast
    * [[writer]]): the label rows are evaluated exactly once, by the FIRST
    * sink, before any ledger dir is appended — the later sinks' frames
    * read only the wave sketch (batch-source lineage) and the CC result
    * (driver- or checkpoint-backed, lineage severed from the ledgers), so
    * no recacheByPath invalidation can re-derive them against ledgers
    * containing this batch.
    *
    * `compactEvery` runs [[compactClusterLedgers]] on [[writer]]'s cadence
    * contract. Unlike the admission writers it DEFAULTS ON (every 16
    * waves): uncompacted merge chains grow one level per merging wave,
    * and while [[graft.dedup.IncrementalClusters.resolveThrough]] now
    * degrades gracefully past depth 64 (full-closure fallback, never a
    * wedge), a cluster deployment that never compacts pays
    * ledger-sized resolution every wave — the cadence keeps steady-state
    * chains shallow. Pass 0 to manage maintenance externally.
    */
  def clusterWriter(labelsDir: String, mergesDir: String, bandsDir: String,
      sigsDir: String, textCol: String, idCol: String,
      threshold: Double = 0.5, portable: Boolean = false,
      compactEvery: Int = 16): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      val toks = graft.text.TextFunctions.tokens(col(textCol))
      val sk = batch
        .select(col(idCol).as("id"),
          (if (portable) graft.functions.Sketches.minhashTokensPortable(toks)
           else graft.functions.Sketches.minhashTokens(toks)).as("sig"))
        .persist()
      // one count materializes the wave persist AND threads the verify-
      // broadcast gate (knownRows) — no second driver job inside the fold
      val waveRows = sk.count()
      val scoped = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]
      val waveScope: DataFrame => DataFrame =
        d => { val p = d.persist(); scoped.add(p); p }
      try {
        // the fold is EAGER (resolution counts + the wave-local CC run
        // inside), so the batch source is always evaluated on a replay
        // before any marker check — the onReplay hooks can all no-op
        val (labelRows, mergeRows) = graft.dedup.IncrementalClusters.foldWave(
          sk, ledgerBandsApprox(spark, bandsDir), ledgerSigs(spark, sigsDir),
          ledgerLabels(spark, labelsDir), ledgerMerges(spark, mergesDir),
          threshold, waveScope, knownRows = Some(waveRows),
          hotBandCap = 4096)
        IdempotentSink.writer(labelsDir, onReplay = _ => ())(labelRows, batchId)
        IdempotentSink.writer(mergesDir, onReplay = _ => ())(mergeRows, batchId)
        IdempotentSink.writer(bandsDir, onReplay = _ => ())(
          Dedup.MinHashLsh.bandRowsOfSigs(sk), batchId)
        IdempotentSink.writer(sigsDir, onReplay = _ => ())(
          sk.select("id", "sig"), batchId)
      } finally {
        sk.unpersist()
        scoped.forEach(_.unpersist())
      }
      if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
        compactClusterLedgers(spark, labelsDir, mergesDir, bandsDir, sigsDir)
      ()
    }

  /** [[clusterWriter]] under the EXACT-Jaccard contract: the wave's edges
    * come from [[graft.dedup.Dedup.MinHashLsh.exactVerifiedPairs]] (band
    * candidates verified on shingle sets), and the corpus state is the
    * exact admission mode's band + SSET ledgers — O(corpus tokens) at
    * rest, the price of exact semantics ([[clusterWriter]] is the
    * signature-only scale mode). Same labels → merges → bands → sets
    * commit order and replay argument; the fold's label/merge outputs are
    * driver-built frames with no ledger lineage at all, so the
    * cache-invalidation analysis is trivial here. Gated end-to-end by
    * q110 (the batch fold against q109's from-scratch-closure oracle) and
    * the StreamingNearDupSpec exact-cluster case. `compactEvery` runs
    * [[compactClusterLedgersExact]] on the usual cadence contract,
    * defaulting ON every 16 waves for [[clusterWriter]]'s chain-depth
    * reason.
    */
  def clusterWriterExact(labelsDir: String, mergesDir: String,
      bandsDir: String, setsDir: String, textCol: String, idCol: String,
      threshold: Double = 0.5, portable: Boolean = false,
      compactEvery: Int = 16): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      val toks = graft.text.TextFunctions.tokens(col(textCol))
      val sk = batch
        .select(col(idCol).as("id"),
          (if (portable) graft.functions.Sketches.minhashSigSetPortable(toks)
           else graft.functions.Sketches.minhashSigSet(toks)).as("ms"))
        .select(col("id"), col("ms.sig").as("sig"), col("ms.sset").as("sset"))
        .withColumn("sz", org.apache.spark.sql.functions.size(col("sset")))
        .persist()
      val scoped = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]
      val waveScope: DataFrame => DataFrame =
        d => { val p = d.persist(); scoped.add(p); p }
      try {
        val (labelRows, mergeRows) =
          graft.dedup.IncrementalClusters.foldWaveExact(
            sk, batch, ledgerBands(spark, bandsDir),
            ledgerSets(spark, setsDir), ledgerLabels(spark, labelsDir),
            ledgerMerges(spark, mergesDir), threshold, waveScope,
            hotBandCap = 4096)
        IdempotentSink.writer(labelsDir, onReplay = _ => ())(labelRows, batchId)
        IdempotentSink.writer(mergesDir, onReplay = _ => ())(mergeRows, batchId)
        IdempotentSink.writer(bandsDir, onReplay = _ => ())(
          Dedup.MinHashLsh.bandRowsOf(sk.select("id", "sig", "sz")), batchId)
        IdempotentSink.writer(setsDir, onReplay = _ => ())(
          sk.select("id", "sset"), batchId)
      } finally {
        sk.unpersist()
        scoped.forEach(_.unpersist())
      }
      if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
        compactClusterLedgersExact(spark, labelsDir, mergesDir, bandsDir,
          setsDir)
      ()
    }

  /** [[compactClusterLedgers]] for the exact-mode cluster deployment:
    * labels/merges as there; bands under the EXACT schema with the
    * kpfx/sz backfill reading the sset ledger ([[compactLedgers]]' hook);
    * ssets id-bucketed. */
  def compactClusterLedgersExact(spark: SparkSession, labelsDir: String,
      mergesDir: String, bandsDir: String, setsDir: String,
      buckets: Int = 8): (Option[String], Option[String], Option[String],
        Option[String]) = {
    lazy val closure = graft.dedup.IncrementalClusters
      .mergeClosure(ledgerMerges(spark, mergesDir))
    (LedgerCompaction.compact(spark, labelsDir, LabelsSchema, Seq("id"),
        buckets, resolveLabelRows(closure)),
      LedgerCompaction.compact(spark, mergesDir, MergesSchema,
        Seq("old_label"), buckets, closureFormOf(closure)),
      LedgerCompaction.compact(spark, bandsDir, BandsSchema,
        Seq("band", "bkey"), buckets,
        backfillBands(ledgerSets(spark, setsDir))),
      LedgerCompaction.compact(spark, setsDir, SetsSchema,
        Seq("id"), buckets))
  }

  /** [[compactLedgersApprox]] extended to the cluster deployment's four
    * ledgers. Labels compact id-bucketed with their stored labels
    * REWRITTEN through the current merge closure (read from the merges
    * ledger's committed rows at compact time — safe for the same reason
    * [[compactLedgers]]' sz backfill reads the sset ledger: rows are only
    * ever added, and applying a merge redirect twice is a no-op). Merges
    * compact old_label-bucketed and rewritten to DEPTH-1 CLOSURE FORM
    * (old_label → final root): rows are never dropped — labels batch dirs
    * committed after the labels compaction still carry stale labels that
    * must keep resolving — but every chain collapses, so per-wave
    * resolution is one join until chains regrow. Bands/sigs compact as in
    * [[compactLedgersApprox]]. The four compact INDEPENDENTLY (rows, not
    * generations, carry the semantics); a crash between any two resumes
    * idempotently.
    */
  def compactClusterLedgers(spark: SparkSession, labelsDir: String,
      mergesDir: String, bandsDir: String, sigsDir: String,
      buckets: Int = 8): (Option[String], Option[String], Option[String],
        Option[String]) = {
    lazy val closure = graft.dedup.IncrementalClusters
      .mergeClosure(ledgerMerges(spark, mergesDir))
    (LedgerCompaction.compact(spark, labelsDir, LabelsSchema, Seq("id"),
        buckets, resolveLabelRows(closure)),
      LedgerCompaction.compact(spark, mergesDir, MergesSchema,
        Seq("old_label"), buckets, closureFormOf(closure)),
      LedgerCompaction.compact(spark, bandsDir, ApproxBandsSchema,
        Seq("band", "bkey"), buckets, backfillKpfx),
      LedgerCompaction.compact(spark, sigsDir, SigsSchema,
        Seq("id"), buckets))
  }

  /** Labels-compaction transform: redirect every stored label through the
    * merge closure. Pure and schema-preserving; no-op on already-resolved
    * rows. The closure frame is SHARED with the merges transform of the
    * same maintenance call (one closure computation per call, not two —
    * the closure's driver union-find recurs on every read-path use, so
    * sharing halves the maintenance cadence's recurring cost); under the
    * driver gate it is a parallelized local result, free to reuse. */
  private[streaming] def resolveLabelRows(closure: => DataFrame)(labels: DataFrame): DataFrame =
    labels
      .join(closure.withColumnRenamed("old_label", "label"),
        Seq("label"), "left")
      .select(col("id"),
        org.apache.spark.sql.functions.coalesce(
          col("root"), col("label")).as("label"))

  /** Merges-compaction transform: rewrite each redirect to its transitive
    * root (depth-1 closure form), keeping every old_label. The shared
    * closure is computed from the LEDGER's committed rows at apply time —
    * the same row SET as the transform's own input (batch dirs at or
    * below the generation version duplicate generation rows, and the
    * closure is duplicate-insensitive), so the rewrite stays pure. */
  private[streaming] def closureFormOf(closure: => DataFrame)(merges: DataFrame): DataFrame =
    closure
      .filter(col("old_label") =!= col("root"))
      .select(col("old_label"), col("root").as("new_label"))
}

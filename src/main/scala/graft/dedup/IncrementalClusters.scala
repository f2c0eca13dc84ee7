package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incrementally-maintained APPROXIMATE duplicate clusters — the streaming
  * close of the signature-only near-dup family (pairs: q105, admission:
  * q106, batch clusters: q107): fold each arriving wave's estimator-
  * verified edges into persisted per-doc cluster labels, so cluster
  * assignments stay current per wave instead of re-running the full q105
  * pair plan + transitive closure over the whole corpus (q107 re-sketches
  * every document per run — ~25 s at the 100× tier and growing with
  * corpus; a wave fold sketches only the wave).
  *
  * == State model ==
  * Two append-only ledgers (parquet row sets under the
  * [[graft.streaming.IdempotentSink]]/[[graft.streaming.LedgerCompaction]]
  * contracts — duplicate rows are tolerated everywhere):
  *
  *  - `labels` (id, label): ONE row per document, written in the
  *    document's own wave, carrying the min-id of its cluster AS OF that
  *    wave. Never rewritten per wave — corpus-sized state must not be
  *    rewritten by wave-sized work.
  *  - `merges` (old_label, new_label): appended when a wave's edges join
  *    two existing clusters — the affected docs' stored labels stay put
  *    and the merge row redirects them. `new_label < old_label` always
  *    (the new label is the merged component's min, which includes the
  *    old label), so merge chains strictly decrease: a forest with no
  *    cycles, each `old_label` appearing exactly once (a label that was
  *    merged away is never a resolved label again).
  *
  * A document's CURRENT label = follow its stored label through the merge
  * forest to the root. Per-wave work is wave-sized: the wave's edges (the
  * same banded-candidate + estimator-verify plan as approx admission, via
  * [[Dedup.MinHashLsh.approxVerifiedPairs]]), a wave-sized resolution
  * probe against the id-bucketed labels ledger, a wave-local connected-
  * components pass, and wave-sized appends. Nothing corpus-sized shuffles
  * or rewrites; the corpus-dependent cost is the same slim band-ledger
  * probe scan admission already pays.
  *
  * == Exactness (q108 ≡ q107) ==
  * [[Dedup.MinHashLsh.approxVerifiedPairs]] emits, per wave, every
  * thresholded pair whose LATER endpoint is in the wave — so the union
  * over waves is exactly [[Dedup.MinHashLsh.nearDupPairsApprox]]'s pair
  * relation over the full corpus, and folding each wave's edges into the
  * label/merge state computes the same connected components incrementally
  * (labels are component minima at every step; a wave merging components
  * relabels to the union's min, which is the global min of the merged
  * set). q108 gates this hash-exact against q107's recursive-CTE oracle.
  */
object IncrementalClusters {

  /** Root-resolution of a wave-sized probe's `lbl` column through the
    * merge forest: repeatedly join `lbl` against the merges ledger
    * (bucketed on old_label after compaction — the ledger side ships
    * nothing) and step to `new_label`, until a round matches no row.
    * Chain depth — and so the round count — is bounded by the number of
    * waves since the last [[compactionClosure]] rewrite (which collapses
    * every chain to depth 1), so the steady-state cost is ONE wave-sized
    * join + one count per wave. Duplicate merge rows (crash replays)
    * multiply probe rows transiently; the per-round min-groupBy
    * re-collapses them (resolution is a function, so min is exact).
    */
  private[graft] def resolveThrough(probe: DataFrame, merges: DataFrame,
      scope: DataFrame => DataFrame): DataFrame = {
    val m = merges.select(col("old_label"), col("new_label"))
    var cur = scope(probe) // (id, lbl)
    var rounds = 0
    var done = false
    while (!done && rounds < 64) {
      val stepped = scope(cur
        .join(m.withColumnRenamed("old_label", "lbl"), Seq("lbl"), "left"))
      if (stepped.agg(count(col("new_label"))).head().getLong(0) == 0L) {
        done = true
      } else {
        cur = scope(stepped
          .select(col("id"), coalesce(col("new_label"), col("lbl")).as("lbl"))
          .groupBy("id").agg(min(col("lbl")).as("lbl")))
      }
      rounds += 1
    }
    if (!done) throw new IllegalStateException(
      "IncrementalClusters.resolveThrough: merge chains deeper than 64 — " +
        "run compaction more often than every 64 waves, or the merges " +
        "ledger violates the strictly-decreasing forest contract")
    cur
  }

  /** The merge forest's transitive ROOTS: (old_label, root) for every
    * label ever merged away. Each tree's root is its minimum label
    * (every merge row decreases), so the closure is exactly connected
    * components over the merge rows as an undirected edge list —
    * delegated to [[Dedup.connectedComponents]] (driver union-find under
    * the gate, delta pointer-jumping above it). Root self-rows
    * (root, root) ride along harmlessly: resolution coalesces through
    * them as no-ops. Used by the read path ([[clusters]]) and by ledger
    * compaction (rewriting merges to depth-1 closure form); the per-wave
    * fold resolves its wave-sized probe iteratively instead
    * ([[resolveThrough]]) so a wave never closes the whole forest.
    */
  def mergeClosure(merges: DataFrame): DataFrame =
    Dedup.connectedComponents(merges, "old_label", "new_label")
      .select(col("id").as("old_label"), col("comp").as("root"))

  /** Current per-doc labels: stored labels redirected through the merge
    * closure. One corpus-sized left join against the (small) closure —
    * the read path for "what cluster is doc X in today". */
  def resolve(labels: DataFrame, merges: DataFrame): DataFrame =
    labels
      // one row per doc even while a replayed-after-sweep batch transiently
      // duplicates rows (identical, so min is exact); the groupBy runs
      // exchange-free on the id-bucketed compacted table
      .groupBy("id").agg(min(col("label")).as("label"))
      .join(mergeClosure(merges).withColumnRenamed("old_label", "label"),
        Seq("label"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("root"), col("label")).as("comp"))

  /** q107-shaped cluster assignments from the ledger state: every doc in
    * a cluster of ≥ 2, with its component (min reachable id) and cluster
    * size — byte-identical to running
    * [[Dedup.MinHashLsh.nearDupPairsApprox]] + [[Dedup.connectedComponents]]
    * from scratch over the corpus the ledgers absorbed (q108's gate).
    * Singleton docs (no thresholded pair ever) are labeled with their own
    * id in the ledger and excluded here, matching q107's output domain.
    */
  def clusters(labels: DataFrame, merges: DataFrame): DataFrame = {
    val w = Window.partitionBy("comp")
    resolve(labels, merges)
      .withColumn("csize", count(lit(1)).over(w))
      .filter(col("csize") >= 2)
      .select(col("doc_id"), col("comp"), col("csize"))
  }

  /** One wave's fold: the (labelRows, mergeRows) deltas to append, both
    * wave-sized, computed as a PURE function of (wave sketch, committed
    * ledgers) — the property the streaming writer's exactly-once argument
    * needs ([[graft.streaming.NearDupStream.clusterWriter]]).
    *
    * Steps: (1) wave edges from the shared admission kernel
    * ([[Dedup.MinHashLsh.approxVerifiedPairs]] — banded candidates vs the
    * corpus band ledger and within-wave smaller ids, estimator-verified
    * against the sig ledger); (2) resolve every edge endpoint to its
    * CURRENT label (stored label → merge roots; a doc absent from the
    * labels ledger is its own label); (3) wave-local connected components
    * over the resolved-label graph (self-loops dropped — wave-sized, so
    * the driver union-find gate almost always takes it); (4) labelRows =
    * every wave doc labeled with its component's min (its own id when
    * edgeless), mergeRows = every EXISTING label whose component min
    * changed (wave doc ids are excluded — their labelRows already carry
    * the final value; no stored row points at them).
    *
    * Replay-safe at every crash point of the writer's labels → merges →
    * bands → sigs commit order: with the wave's labels already committed,
    * endpoints resolve to their final components, the wave graph
    * degenerates toward self-loops, and the fold re-derives exactly the
    * first run's rows (lost merge rows re-emerge because the stale labels
    * they redirect still resolve to themselves); with everything
    * committed, the sinks' markers skip the writes entirely.
    *
    * `knownRows` threads the writer's once-per-wave batch count into the
    * verify-broadcast gate (no extra driver job); `scope` is the wave
    * persist for the mid-frames several subtrees consume.
    */
  def foldWave(sk: DataFrame, corpusBands: DataFrame, corpusSigs: DataFrame,
      labels: DataFrame, merges: DataFrame, threshold: Double,
      scope: DataFrame => DataFrame = Dedup.cachedSketch,
      knownRows: Option[Long] = None): (DataFrame, DataFrame) = {
    val edges = scope(Dedup.MinHashLsh.approxVerifiedPairs(
      sk, corpusBands, corpusSigs, threshold, scope, knownRows))
    val eps = edges.select(col("bid").as("id"))
      .unionByName(edges.select(col("mid").as("id")))
      .distinct()
    // stored label (own id when unseen) → merge roots. The labels join is
    // the wave's one corpus-ledger touch besides the band probe: id-
    // bucketed at rest, so the ledger side plans exchange-free. The
    // wave-sized min-groupBy collapses the ledger's transient duplicate
    // rows (a batch replayed after its dir was swept lives in table AND
    // dir until the next sweep — identical rows, so min is exact)
    val stored = eps.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("lbl"))
      .groupBy("id").agg(min(col("lbl")).as("lbl"))
    val nodeOf = scope(resolveThrough(stored, merges, scope)
      .select(col("id"), col("lbl").as("node")))
    val g = edges
      .join(nodeOf.select(col("id").as("bid"), col("node").as("na")), Seq("bid"))
      .join(nodeOf.select(col("id").as("mid"), col("node").as("nb")), Seq("mid"))
      .filter(col("na") =!= col("nb"))
      .select("na", "nb")
    // wave-local CC: nodes are current labels + wave doc ids, edge count
    // is wave-sized — the driver union-find gate takes it in one pass
    val cc = Dedup.connectedComponents(g, "na", "nb")
    val labelRows = sk.select(col("id"))
      .join(nodeOf, Seq("id"), "left")
      .select(col("id"), coalesce(col("node"), col("id")).as("node"))
      .join(cc.select(col("id").as("node"), col("comp")), Seq("node"), "left")
      .select(col("id"), coalesce(col("comp"), col("node")).as("label"))
    val mergeRows = cc
      .join(sk.select(col("id")), Seq("id"), "left_anti")
      .filter(col("comp") =!= col("id"))
      .select(col("id").as("old_label"), col("comp").as("new_label"))
    (labelRows, mergeRows)
  }
}

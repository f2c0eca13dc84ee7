package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.similarity.VectorFunctions
import graft.text.TextFunctions

/** Deduplication operator family for training-data pipelines:
  *
  *  - [[exact]] — hash-groupBy on a normalized fingerprint. One shuffle on
  *    the 128-bit key; survivor = min id (deterministic).
  *  - [[MinHashLsh]] — near-dup via shingle→minhash→band→bucket-join. The
  *    LSH bands turn the O(n²) pair space into a shuffle join on band keys;
  *    candidates are then verified with EXACT Jaccard, so false positives
  *    never escape (false negatives bounded by the band/row parameters).
  *  - [[simhash]] — 64-bit charge-accumulation sketch; near-dups = small
  *    Hamming distance, candidate-blocked on 16-bit chunks (any pair within
  *    Hamming ≤ 3 shares at least one of 4 chunks — pigeonhole).
  *  - [[ngramJaccardPairs]] — exact n-gram Jaccard within a blocking key
  *    (the oracle-verifiable reference implementation of near-dup).
  *  - [[embeddingNearDup]] — semantic near-dup: cosine over embeddings.
  *
  * All sketches use deterministic seeds → replayable at any parallelism.
  */
object Dedup {

  /** Exact dedup: survivors + duplicate counts per normalized fingerprint. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Quality-aware exact dedup: per normalized fingerprint keep the row the
    * training pipeline most wants to keep — highest `scoreCol`, ties to the
    * smallest id (deterministic). One shuffle on the fingerprint (window
    * partition key); survivors carry the duplicate count.
    */
  def exactBest(df: DataFrame, textCol: String, idCol: String,
      scoreCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy(col("score").desc, col(idCol))
    df.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fp"),
        scoreCol.as("score"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_dups", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("rn") === 1)
      .select(col("fp"), col(idCol).as("keep_id"), col("score").as("keep_score"),
        col("n_dups"))
  }

  // --- MinHash + LSH --------------------------------------------------------

  object MinHashLsh {
    val NumHashes = 32
    val Bands = 8
    val RowsPerBand: Int = NumHashes / Bands

    /** Candidate pairs from banded signatures, verified with exact Jaccard
      * over distinct shingle sets; returns pairs with `jaccard >= threshold`.
      *
      * Shuffle hygiene: only (band, key, id) rows enter the banded
      * self-join — the shingle sets stay out of that shuffle and are joined
      * back onto the DISTINCT candidate pairs, so Jaccard is computed
      * exactly once per candidate pair. The join-back is a plain equi-join
      * on id: the per-document shingle-set table grows with the corpus, so
      * forcing a broadcast of it would cap the operator at driver/executor
      * memory — Catalyst still picks a broadcast on its own when the side
      * is under the auto-broadcast threshold, which is the right call at
      * fixture scale and the safe one at 100 TB.
      */
    def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
        threshold: Double = 0.5): DataFrame = {
      // signature/shingle hashing is 10-100x the input bytes in CPU —
      // guard against a degenerate single-split scan serializing it
      val src = graft.core.Parallelism.ensure(
        df.select(col(idCol), col(textCol)))
      val toks = TextFunctions.tokens(col(textCol))
      val sigs = src.select(col(idCol).as("id"),
        graft.functions.Sketches.minhashTokens(toks).as("sig"))
      val banded = sigs.select(col("id"), posexplode(
        array((0 until Bands).map { b =>
          xxhash64(concat_ws("_",
            (0 until RowsPerBand).map(r =>
              element_at(col("sig"), b * RowsPerBand + r + 1)): _*), lit(b))
        }: _*)).as(Seq("band", "bkey")))
      val l = banded.select(col("band"), col("bkey"), col("id").as("id_a"))
      val r = banded.select(col("band"), col("bkey"), col("id").as("id_b"))
      val candidates = l.join(r, Seq("band", "bkey"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      // exact verification over sorted hashed shingle sets: merge-scan
      // intersection, |∪| = |A|+|B|−|∩| — no per-pair hash sets or arrays
      val sets = src.select(col(idCol).as("sid"),
        graft.functions.Sketches.shingleSet(toks).as("sset"))
      val inter = graft.functions.Sketches
        .sortedIntersectCount(col("set_a"), col("set_b")).cast("double")
      candidates
        .join(sets.withColumnRenamed("sid", "id_a")
          .withColumnRenamed("sset", "set_a"), Seq("id_a"))
        .join(sets.withColumnRenamed("sid", "id_b")
          .withColumnRenamed("sset", "set_b"), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (inter / (size(col("set_a")) + size(col("set_b")) - inter))
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
  }

  // --- SimHash --------------------------------------------------------------

  /** 64-bit simhash of the token array: bit b is set iff at least half the
    * token hashes have bit b set (charge accumulation with majority sign).
    * Native [[graft.functions.SimHash64]] expression — the declarative form
    * (64 `filter` passes per row) is interpreted and measured ~10× slower.
    */
  def simhash(toks: Column): Column = graft.functions.Sketches.simhash(toks)

  /** Near-dup pairs by simhash Hamming distance. Blocking: split the 64-bit
    * sketch into 4 16-bit chunks; by pigeonhole any pair with Hamming ≤ 3
    * agrees on ≥ 1 chunk, so the chunk join is lossless at maxHamming ≤ 3.
    * (8-bit chunks would extend the guarantee to Hamming ≤ 7 but measured
    * 2× slower here: smaller keys → denser buckets → more candidate pairs.)
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame =
    hammingPairs(
      graft.core.Parallelism.ensure(df.select(col(idCol), col(textCol)))
        .select(col(idCol).as("id"),
          simhash(TextFunctions.tokens(col(textCol))).as("sh")),
      "id", "sh", maxHamming)

  /** Near-dup pairs over ANY precomputed 64-bit sketch column (simhash,
    * image dHash, audio fingerprint …) by Hamming distance — the shared
    * blocking engine behind [[simhashPairs]] and
    * [[graft.multimodal.Multimodal]] image dedup.
    *
    * The sketch splits into `nChunks` equal bit chunks; by pigeonhole any
    * pair within Hamming ≤ nChunks−1 agrees on ≥ 1 chunk, so the chunk
    * equi-join is LOSSLESS for `maxHamming < nChunks` (enforced). More
    * chunks admit larger distances but shrink keys → denser buckets → more
    * candidate pairs (4×16-bit measured 2× faster than 8×8-bit on text
    * sketches); callers needing Hamming > 3 pay that knowingly via
    * `nChunks = 8`.
    */
  def hammingPairs(sketches: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 3, nChunks: Int = 4): DataFrame = {
    require(64 % nChunks == 0, s"nChunks must divide 64, got $nChunks")
    require(maxHamming < nChunks,
      s"pigeonhole blocking is lossy for maxHamming=$maxHamming at " +
        s"$nChunks chunks — need maxHamming < nChunks")
    val bits = 64 / nChunks
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val sh = sketches.select(col(idCol).as("id"), col(hashCol).as("sh"))
    val chunked = sh.select(col("id"), col("sh"), posexplode(array(
      (0 until nChunks).map(c =>
        shiftright(col("sh"), c * bits).bitwiseAND(lit(mask))): _*))
      .as(Seq("chunk", "ckey")))
    val l = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("sh").as("sh_b"))
    // filter BEFORE dedup: hamming is a pure function of the pair, so
    // duplicates across chunk meetings agree — dedup then shuffles only
    // the surviving near-dups, not every candidate pair
    l.join(r, Seq("chunk", "ckey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Near-dup EDGES sufficient for connected-component clustering over a
    * 64-bit sketch — NOT the full pair list. Rows with IDENTICAL sketches
    * collapse into one representative (star edges member→group-min
    * connect them), and Hamming blocking runs over DISTINCT sketch values
    * only. The component closure is provably identical to
    * [[hammingPairs]] + CC — within-group members chain through the star,
    * cross-group near-dups chain through their representatives — but pair
    * volume scales with distinct-sketch count², not corpus²: perceptual
    * hashes (image dHash) are low-entropy by design, so exact-duplicate
    * media otherwise flood every chunk bucket (measured: 100× shuffle
    * growth at a 10× tier through the full-pair path; distinct-collapsed,
    * the same tier is ~linear). Use [[hammingPairs]] when the pairs
    * themselves (with distances) are the product.
    */
  def hammingClusterEdges(sketches: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 3, nChunks: Int = 4): DataFrame = {
    val sh = sketches.select(col(idCol).as("id"), col(hashCol).as("sh"))
    val groups = sh.groupBy("sh").agg(min("id").as("rep"))
    val stars = sh.join(groups, "sh").filter(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"))
    val repPairs = hammingPairs(
        groups.select(col("rep").as("id"), col("sh")),
        "id", "sh", maxHamming, nChunks)
      .select("id_a", "id_b")
    stars.unionByName(repPairs)
  }

  // --- exact n-gram Jaccard (oracle-verifiable reference path) --------------

  /** Exact token-set Jaccard for all pairs within a blocking column. The
    * pair space is bounded by the block key AND a lossless SIZE BAND
    * (below); at 100 TB the block would be an LSH band, here it is a
    * semantic key (e.g. lang).
    *
    * Size-band blocking (lossless): jaccard(A,B) ≤ min/max of the set
    * sizes, so j ≥ t forces max_size ≤ min_size/t — in log-space the two
    * sizes lie within `ln(1/t)` of each other, i.e. mathematically in the
    * SAME or ADJACENT geometric bands of width ln(1/t). The bands are
    * computed with FLOATING-POINT logs, though, and a pair sitting
    * exactly on a band edge (e.g. sizes 243 vs 729 at t = 1/3 — both
    * powers of the band ratio) can see one floor() land an ulp on the
    * wrong side, pushing the computed band gap to 2. The right side
    * therefore registers under {band−1, band, band+1} always, PLUS
    * band±2 for the rows whose log-position sits within ε = 1e-9 of a
    * band edge — the only rows whose floor can have moved (FP log error
    * is ~1e-12 absolute, far inside ε; a blanket ±2 registration was
    * measured ~1.6× slower at the 10× tier for protection only
    * edge-rows need). The left side stays on its home band, so every
    * candidate pair still meets exactly once. The equi-join key becomes
    * (block, band) and per-key pair volume is O(band²), not O(block²).
    * Measured at the 10× tier this turned a 34× superlinear wall into
    * ~linear; the tighter exact ratio check stays in the join condition,
    * the band only shrinks what the shuffle join must compare.
    *
    * Per-pair cost engineering (the O(m²) inner loop):
    *  - |∪| is derived as |A|+|B|−|A∩B| (exact for sets) — no union array
    *    is ever built, halving allocations;
    *  - the intersection runs over PRE-HASHED token sets (xxhash64 longs,
    *    computed once per row) instead of strings — long equality beats
    *    repeated UTF8 hashing; a 64-bit collision inside one document pair
    *    is vanishingly improbable, and the result is oracle-checked;
    *  - size-ratio prefilter in the join condition: j ≤ min/max size, so a
    *    pair below the threshold ratio never reaches the intersection;
    *  - the block join is left to Catalyst: under the auto-broadcast
    *    threshold it broadcasts on its own (the fixture case); above it,
    *    it plans a shuffle join on (block, band), and AQE's skew-join
    *    split keeps an oversized block from pinning one task — forcing a
    *    whole-corpus broadcast here would cap the operator at executor
    *    memory, the exact cliff the MinHash path already avoids.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"jaccard threshold must lie in (0, 1], got $threshold")
    val base = graft.core.Parallelism.ensure(
        df.select(col(blockCol), col(idCol), col(textCol)))
      .select(col(blockCol).as("block"), col(idCol).as("id"),
        array_sort(transform(array_distinct(TextFunctions.tokens(col(textCol))),
          t => xxhash64(t))).as("tset"))
      .withColumn("ts_n", size(col("tset")).cast("double"))
    // geometric size band; at threshold 1 only equal sizes can pair, so
    // the band IS the size and no neighbor registration is needed
    val bandW = math.log(1.0 / threshold)
    def bandPos(n: Column): Column = log(greatest(n, lit(1.0))) / lit(bandW)
    def bandOf(n: Column): Column =
      if (bandW == 0.0) n.cast("long") else floor(bandPos(n)).cast("long")
    // parallelism is guaranteed by the ensure() above — no second
    // exchange (a blanket repartition here would DOWN-shuffle a large
    // multi-split input at real scale)
    val l = base
      .select(col("block").as("block_a"), col("id").as("id_a"),
        col("tset").as("set_a"), col("ts_n").as("n_a"),
        bandOf(col("ts_n")).as("band_a"))
    val eps = 1e-9
    val rBands =
      if (bandW == 0.0) array(bandOf(col("ts_n")))
      else {
        val b = bandOf(col("ts_n"))
        val frac = bandPos(col("ts_n")) - floor(bandPos(col("ts_n")))
        // edge rows (frac within ε of 0 or 1) also register one band
        // further on that side — see the losslessness note above
        array_compact(array(
          when(frac <= eps, b - 2), b - 1, b, b + 1,
          when(frac >= 1 - eps, b + 2)))
      }
    val r = base.select(col("block").as("block_b"), col("id").as("id_b"),
      col("tset").as("set_b"), col("ts_n").as("n_b"),
      explode(rBands).as("band_b"))
    val inter = graft.functions.Sketches
      .sortedIntersectCount(col("set_a"), col("set_b")).cast("double")
    l.join(r,
        col("block_a") === col("block_b") && col("band_a") === col("band_b") &&
          col("id_a") < col("id_b") &&
          least(col("n_a"), col("n_b")) >= lit(threshold) * greatest(col("n_a"), col("n_b")))
      .select(col("block_a").as("block"), col("id_a"), col("id_b"),
        (inter / (col("n_a") + col("n_b") - inter)).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // --- embedding cosine near-dup --------------------------------------------

  /** Semantic near-dup: all pairs with cosine ≥ threshold. All-pairs here
    * (fixture-sized corpus); [[embeddingNearDupLsh]] is the blocked scale
    * path.
    */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      graft.functions.FloatVecDot.norm2(col(vecCol)).as("n2"))
    // repartition the stream side: a small-file corpus is one parquet split,
    // and the O(n²) broadcast pair loop must not run on a single task
    val l = base.repartition(par)
      .select(col("id").as("id_a"), col("v").as("v_a"), col("n2").as("n2_a"))
    val r = base.select(col("id").as("id_b"), col("v").as("v_b"), col("n2").as("n2_b"))
    l.join(broadcast(r), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosinePrenormed(
          graft.functions.FloatVecDot.dot(col("v_a"), col("v_b")),
          col("n2_a"), col("n2_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // --- duplicate-cluster connected components ------------------------------

  /** Connected components over an undirected pair list — turns near-dup
    * PAIRS (any of the pair operators above) into CLUSTER assignments, the
    * form a dedup pipeline actually consumes (keep one survivor per
    * component, not per pair).
    *
    * Algorithm: min-label propagation with pointer jumping. Every node
    * starts labeled with its own id; each round a node adopts the minimum
    * of (its label, its neighbors' labels, its label's label). The last
    * term — `comp(comp(u))`, a self-join of the label table — is the
    * pointer-jumping step: it doubles the effective propagation distance
    * per round, so convergence needs O(log diameter) rounds instead of
    * O(diameter) (measured on the sf0.1 near-dup graph: 8 rounds → 3).
    * Labels only decrease, so the global label sum is strictly decreasing
    * until fixpoint — convergence is detected from that single scalar
    * aggregate (no per-row change join, no driver-side data). At fixpoint
    * labels are constant per component and idempotent, hence the component
    * minimum. `maxIter` rounds cover graphs of diameter ~2^maxIter.
    *
    * Scale shape: each round is one shuffle join (edges ⋈ labels on node
    * id) plus one partial-agg shuffle (min per node) — both on the same
    * key, both skew-handled by AQE. `labels` feeds into itself TWICE per
    * round (union + join), so without lineage truncation the analyzed plan
    * doubles every iteration — exponential. Each round is therefore
    * checkpointed: reliably if the session has a checkpoint dir (the
    * cluster setting — survives executor loss), else `localCheckpoint`
    * (executor-block-backed; right for local mode and short jobs). Ids
    * must be numeric (min ordering); doc ids here are int64.
    *
    * Checkpoint hygiene: superseded rounds are RELEASED as the loop
    * advances (reliable checkpoint files deleted, local-checkpoint blocks
    * unpersisted — GraphFrames-style), and the edge checkpoint is released
    * on exit, so a long-running session accumulates nothing. The RETURNED
    * frame stays backed by the final round's checkpoint — one round's
    * labels, the irreducible storage of the result; a caller that persists
    * the assignment elsewhere may drop it via the session checkpoint dir.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    // resetStats after every checkpoint: the pointer-jump round self-joins
    // `labels`, so checkpoint-inherited sizeInBytes estimates SQUARE each
    // round and stats computation alone becomes the driver bottleneck
    // (million-bit BigInt products by round ~14 — see GraftShim.resetStats)
    def truncate(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftShim.resetStats(
        if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
        else df.localCheckpoint())
    // free a superseded truncated frame: the checkpointed RDD sits in the
    // plan as a LogicalRDD leaf — delete its files (reliable) or unpersist
    // its blocks (local). Safe immediately: checkpoint() is eager, so the
    // successor round was fully materialized before its parent is released.
    // the stats-reset wrapper (see truncate) puts a metrics RDD between
    // the LogicalRDD leaf and the checkpoint-backed ancestor, so walk the
    // (linear) dependency chain to the RDD that actually owns files/blocks
    @scala.annotation.tailrec
    def ckptAncestor(r: org.apache.spark.rdd.RDD[_]): Option[org.apache.spark.rdd.RDD[_]] =
      if (r.getCheckpointFile.isDefined ||
          r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE) Some(r)
      else r.dependencies.headOption.map(_.rdd) match {
        case Some(parent) => ckptAncestor(parent)
        case None => None
      }
    def release(df: DataFrame): Unit =
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }.flatMap(ckptAncestor).foreach { r =>
        r.getCheckpointFile match {
          case Some(f) =>
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
              .delete(p, true)
          case None => r.unpersist(false)
        }
      }
    val half = pairs.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    // no dedup on the edge list: min-aggregation is idempotent, duplicate
    // edges change nothing downstream — a distinct() here would buy one
    // full shuffle of the edge list for zero semantic effect. Instead the
    // one shuffle we do pay hash-partitions edges by the propagation join
    // key, so every round's edges⋈labels join and the init groupBy reuse
    // that layout instead of re-exchanging the (static) edge list
    val edges = truncate(
      half.union(half.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src")))
    // init fuses the first propagation round: label(u) = min({u} ∪ N(u))
    // straight off the grouped edge list — one aggregation, no join. For
    // the dominant near-dup shape (dense cliques) this alone is the
    // fixpoint, so the loop typically runs once to confirm convergence.
    var labels = truncate(edges.groupBy(col("src").as("id"))
      .agg(least(col("src"), min(col("dst"))).as("comp")))
    // decimal(38,0) sum: overflow-proof at any node count (int64 sums
    // overflow around 10^10 nodes with 10-digit ids). Empty input sums to
    // null → ZERO, so a pairless corpus converges immediately to an empty
    // assignment instead of NPE-ing.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var iter = 0
    // per-round observability for scale runs (stderr, one line per round):
    // the loop's cost model is "rounds × (join+agg+checkpoint)" — when a
    // corpus misbehaves the first question is always which round blew up
    val t0 = System.nanoTime()
    def logRound(tag: String): Unit =
      System.err.println(f"[cc] $tag iter=$iter%d t=${(System.nanoTime() - t0) / 1e9}%.1fs")
    logRound("init")
    // sum() over zero rows is null → ZERO, so a nonzero sum proves the graph
    // is non-empty without a separate isEmpty job; the structural check only
    // runs when the sum is 0 (empty graph, or labels summing to zero — the
    // latter just takes one confirming loop round)
    var converged = prevSum.signum == 0 && labels.isEmpty
    while (iter < maxIter && !converged) {
      val prop = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("comp"))
      // pointer jump: comp(u) ← comp(comp(u)). Every comp value is itself a
      // node id (it is the min of a set of node ids), so the inner join
      // drops nothing; the jump rows only ever LOWER a node's label.
      val jump = labels.join(
          labels.select(col("id").as("comp"), col("comp").as("comp2")), "comp")
        .select(col("id"), col("comp2").as("comp"))
      val next = truncate(
        labels.union(prop).union(jump).groupBy("id").agg(min("comp").as("comp")))
      val s = labelSum(next)
      release(labels)
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
      logRound("round")
    }
    release(edges)
    // partially propagated labels would silently split one component into
    // several "clusters" (several dedup survivors) — refuse instead; the
    // refused frame is useless to any caller, so release it too (otherwise
    // the failure path would be the one place checkpoints accumulate)
    if (!converged) release(labels)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds: the pair " +
        "graph has a longer chain than pointer-jumping can close in " +
        s"$maxIter rounds — raise maxIter (rounds needed ~ log2(diameter))")
    labels
  }

  /** Scale path for embedding near-dup: hyperplane-LSH bucket blocking
    * (multi-probe, same machinery as [[graft.similarity.Ann]]) turns the
    * all-pairs O(n²) into a shuffle join on bucket keys; candidates get
    * exact cosine. Recall is parameter-bounded (not exhaustive) — the
    * standard trade at corpus sizes where n² is impossible.
    */
  def embeddingNearDupLsh(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    import graft.similarity.Ann
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      graft.functions.FloatVecDot.norm2(col(vecCol)).as("n2"),
      Ann.signatureFor(col(vecCol), nPlanes, dim).as("bucket"))
    // probe own bucket + 1-bit neighbors; each unordered pair meets in at
    // least the bucket they share, dedup handles multi-bucket meetings
    val probes = array((Seq(0) ++ (0 until nPlanes).map(1 << _))
      .map(f => col("bucket").bitwiseXOR(lit(f))): _*)
    val l = base.select(col("id").as("id_a"), col("v").as("v_a"),
      col("n2").as("n2_a"), explode(probes).as("bkt"))
    val r = base.select(col("id").as("id_b"), col("v").as("v_b"),
      col("n2").as("n2_b"), col("bucket").as("bkt"))
    l.join(r, Seq("bkt")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosinePrenormed(
          graft.functions.FloatVecDot.dot(col("v_a"), col("v_b")),
          col("n2_a"), col("n2_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** Cross-document duplicated-span accounting: for every document, how
    * many of its DISTINCT token n-grams also appear in at least one other
    * document — the corpus-level repetition signal (MassiveText-style)
    * complementing the within-document fractions of
    * [[graft.text.TextFunctions.dupNgramFrac]]. Documents whose text is
    * largely boilerplate shared across the corpus score high and are
    * dedup/downweight candidates even when no whole-document near-dup
    * fires.
    *
    * Scale shape: grams are DISTINCT per document before the explode, so
    * the gram histogram aggregates (gram → doc count) in one partial-agg
    * shuffle; the join back is gram-keyed (AQE handles hot boilerplate
    * grams), and the per-doc rollup is one more partial-agg shuffle.
    * Nothing is O(corpus²) and no driver-side state exists.
    */
  /** C4-style cross-document span dedup with document REWRITE: segment
    * each document into consecutive `spanTokens`-token spans, keep exactly
    * one occurrence of every distinct span corpus-wide (the occurrence at
    * the smallest (doc_id, position)), and re-assemble each document from
    * its surviving spans. This is the curation step that strips shared
    * boilerplate (headers, nav bars, license blocks) even when whole-doc
    * dedup never fires — C4 did it at the line level; the fixture corpus
    * has no line structure, so spans are fixed-width token windows, which
    * is also what a tokenizer-centric pipeline would use.
    *
    * Scale shape: span texts never leave their executor except for the
    * one hash shuffle that ranks occurrences per distinct span (window
    * over span — partition state is the occurrence list of ONE span, i.e.
    * the corpus duplication factor, never the corpus); the rebuild is one
    * partial-agg shuffle on doc_id collecting (position, span) pairs
    * sorted per doc. Nothing is O(corpus²); a skewed mega-duplicated span
    * costs one hot window partition of its own occurrences only.
    */
  def spanDedup(df: DataFrame, textCol: String, idCol: String,
      spanTokens: Int = 10): DataFrame = {
    require(spanTokens > 0, s"spanTokens must be positive: $spanTokens")
    val toks = TextFunctions.tokens(col(textCol))
    val spans = graft.core.Parallelism.ensure(
        df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), posexplode(
        transform(
          sequence(lit(0),
            greatest(lit(0),
              ceil(size(col("toks")).cast("double") / spanTokens)
                .cast("int") - 1)),
          i => array_join(
            slice(col("toks"), i * spanTokens + 1, lit(spanTokens)), " "))))
      .toDF("doc_id", "pos", "span")
    val ranked = spans.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("span").orderBy(col("doc_id"), col("pos"))))
    val rebuilt = ranked.groupBy("doc_id").agg(
      count(lit(1)).as("n_spans"),
      count(when(col("rn") === 1, 1)).as("n_kept"),
      array_join(
        transform(
          array_sort(collect_list(
            when(col("rn") === 1, struct(col("pos"), col("span"))))),
          s => s.getField("span")), " ").as("text_kept"))
    df.select(col(idCol).as("doc_id")).join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  def crossDocShared(df: DataFrame, textCol: String, idCol: String,
      n: Int = 8): DataFrame = {
    val g = graft.core.Parallelism.ensure(
        df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokenNgrams(
          TextFunctions.tokens(lower(col(textCol))), n))).as("g"))
    val docsWith = g.groupBy("g").agg(count(lit(1)).as("docs_with"))
    val per = g.join(docsWith, "g")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_grams"),
        count(when(col("docs_with") >= 2, 1)).as("n_shared"))
    df.select(col(idCol).as("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("shared_frac",
        when(col("n_grams") > 0,
          col("n_shared").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)))
  }
}

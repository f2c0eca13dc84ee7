package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FloatVecDot
import graft.similarity.{Ann, VectorFunctions}

/** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space with k-means, call two
  * documents semantic duplicates when their cosine similarity exceeds a
  * high threshold WITHIN a cluster, and keep one exemplar per duplicate
  * group — the member FARTHEST from its cluster centroid (the paper's
  * rule: prefer the least prototypical member, it carries the most extra
  * information into training).
  *
  * This is the third rung of the dedup ladder the engine exposes:
  * exact (fingerprint equality), near (MinHash/SimHash token overlap),
  * SEMANTIC (paraphrases and re-renderings that share almost no tokens
  * but encode the same content — what the reference-corpus curation
  * pipelines prune before training).
  *
  * Scale shape, per the paper's own trick: pairwise cosine runs only
  * WITHIN a cell of the IVF k-means index ([[Ann.buildIvfIndex]], auto
  * √n cells), so pair volume is Σ|cell|² ≈ n·√n, not n² — and the
  * within-cell self-join is a plain equi-join on the cell id that
  * shuffles fixed-width rows. Before that pairwise, IDENTICAL embeddings
  * collapse to one representative per distinct vector ([[dupEdges]]) —
  * exact duplicates are the dominant mass in a dedup workload and would
  * otherwise pile into one cell and pay |group|² for cosine-1 pairs.
  * Cross-cell duplicate pairs are missed BY
  * DESIGN (the paper's documented approximation; raise `refineIters`
  * to tighten cells on clustered corpora). Components come from the
  * shared [[Dedup.connectedComponents]] engine — O(log d) rounds — so
  * a chain of paraphrases collapses into one group even when its ends
  * are below the pair threshold.
  *
  * Returns `(vec_id, cluster, centroid_sim, keep)` — every input row,
  * `cluster` = the duplicate-group label (singletons label themselves),
  * `keep` = the exemplar flag (exactly one true per group: the member
  * with the LOWEST centroid cosine, ties to the smaller id).
  */
object SemanticDedup {

  def semanticDedup(embeddings: DataFrame, threshold: Double = 0.97,
      nCells: Int = 0, refineIters: Int = 1): DataFrame =
    fromIndex(Ann.buildIvfIndex(embeddings, nCells, refineIters), threshold)

  /** [[semanticDedup]] over a caller-supplied IVF index — the
    * deterministic-ingest form (same split as
    * [[graft.similarity.Ann.indexWithCentroids]] vs
    * [[graft.similarity.Ann.buildIvfIndex]]): with centroids drawn by an
    * engine-independent rule ([[graft.similarity.Ann.strideCentroids]]),
    * every step — assignment, within-cell pairwise, component closure,
    * exemplar pick — is reproducible in plain SQL, which is how q91
    * carries a full DuckDB oracle despite being an approximate operator
    * (the approximation lives in the cell blocking, not the engine).
    */
  def fromIndex(idx: Ann.IvfIndex, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"semantic-dup cosine threshold must lie in (0, 1], got $threshold")
    // centroid similarity per member — broadcast the tiny centroid table.
    // The member table feeds SIX consumers downstream (the star collapse's
    // group-by and join-back, both sides of the within-cell self-join, the
    // label join, the exemplar pick), and each would otherwise replay the
    // whole O(n·√n) assignment-kernel pipeline: measured at the 100× tier
    // the un-materialized form ran ~80 stages / 2,567 tasks with the same
    // ~140 MB assignment exchange executed once PER consumer. One eager
    // truncation (same checkpoint discipline as
    // [[Dedup.connectedComponents]]) computes the kernel once and every
    // consumer starts from stored blocks — the standard shape for
    // iterative/multi-consumer frames, and strictly cheaper than k
    // kernel replays at any tier.
    val spark = idx.assigned.sparkSession
    val membersPlan = idx.assigned
      .join(broadcast(idx.centroids), Seq("cell"))
      .select(col("nid"), col("cell"), col("ce"), col("cn2"),
        VectorFunctions.cosinePrenormed(
          FloatVecDot.dot(col("ce"), col("cvec")), col("cn2"), col("cvn2"))
          .as("centroid_sim"))
    val members = org.apache.spark.sql.GraftShim.resetStats(
      if (spark.sparkContext.getCheckpointDir.isDefined) membersPlan.checkpoint()
      else membersPlan.localCheckpoint())

    val edges = dupEdges(members, threshold)

    val clusters = Dedup.connectedComponents(edges, "id_a", "id_b")
      .toDF("nid", "cluster")

    // exemplar per group: min centroid_sim, ties to the smaller id;
    // singletons (no edge) label themselves and are always kept
    val labeled = members
      .join(clusters, Seq("nid"), "left")
      .select(col("nid").as("vec_id"),
        coalesce(col("cluster"), col("nid")).as("cluster"),
        col("centroid_sim"))
    val keeper = labeled.groupBy("cluster")
      .agg(min_by(col("vec_id"), struct(col("centroid_sim"), col("vec_id")))
        .as("keep_id"))
    labeled.join(keeper, Seq("cluster"))
      .select(col("vec_id"), col("cluster"), col("centroid_sim"),
        (col("vec_id") === col("keep_id")).as("keep"))
  }

  /** Semantic-duplicate EDGES sufficient for component closure, with
    * IDENTICAL-vector collapse before the within-cell pairwise — the same
    * representative trick the image near-dup path uses
    * ([[Dedup.hammingClusterEdges]]): a dedup-heavy corpus (the actual
    * use case) concentrates exact-duplicate embeddings in ONE k-means
    * cell, where raw pairwise pays |group|² for pairs whose cosine is 1
    * by construction. Instead every distinct vector group collapses to
    * its min-id representative (star edges rep→member connect the group —
    * cosine(v, v) = 1 ≥ threshold always, for nonzero v), and pairwise
    * cosine runs over DISTINCT vectors per cell only. The component
    * closure is provably the one raw pairwise yields: within-group
    * members chain through the star, cross-group near-dups chain through
    * representatives, and identical vectors always share a cell (same
    * assignment), so no admissible edge is lost. Pair volume scales with
    * distinct-vectors-per-cell², not members².
    *
    * Zero vectors (n2 = 0) are NEVER edged — cosine with a zero vector
    * is undefined and raw pairwise filtered those pairs out via its
    * null-propagating comparison; the star edges must not resurrect them.
    */
  private[graft] def dupEdges(members: DataFrame,
      threshold: Double): DataFrame = {
    // the collapse keys on xxhash64(ce) — one long through the group-by
    // and join-back shuffles instead of a 256-byte float-array key
    // (measured at sf0.1: array keys cost ~1.7× wall and +55% tasks on
    // q91). Same trade as [[Dedup.embeddingNearDupLsh]]'s vfp: a 64-bit
    // collision between two DIFFERENT vectors in the same corpus is
    // ~n²/2⁶⁵ — negligible against the operator's own parameter-bounded
    // approximation. Zero vectors stay excluded on BOTH sides of the
    // star join (cn2 > 0), never by luck of the hash.
    // hash over a CANONICALIZED array: xxhash64 sees raw float bits, so
    // -0.0 vs 0.0 (bit-distinct, == -equal) would land one vector group
    // in two collapse keys and silently never pair them — semantics the
    // previous array-equality groupBy key (NormalizeFloatingNumbers) gave
    // for free. `x + 0.0f` maps -0.0 to +0.0 and re-quiets any exotic
    // NaN payload to the JVM's canonical NaN.
    def cefp(ce: Column): Column = xxhash64(transform(ce, x => x + lit(0.0f)))
    val nz = members.filter(col("cn2") > 0)
    val groups = nz.groupBy(cefp(col("ce")).as("cefp"))
      .agg(min("nid").as("rep"))
    val stars = nz.withColumn("cefp", cefp(col("ce")))
      .join(groups, Seq("cefp"))
      .filter(col("nid") =!= col("rep"))
      .select(col("rep").as("id_a"), col("nid").as("id_b"))
    val reps = members.join(groups.select(col("rep").as("nid")), Seq("nid"))
    val l = reps.select(col("cell"), col("nid").as("id_a"),
      col("ce").as("e_a"), col("cn2").as("n_a"))
    val r = reps.select(col("cell"), col("nid").as("id_b"),
      col("ce").as("e_b"), col("cn2").as("n_b"))
    val repPairs = l.join(r, Seq("cell")).filter(col("id_a") < col("id_b"))
      .filter(VectorFunctions.cosinePrenormed(
        FloatVecDot.dot(col("e_a"), col("e_b")), col("n_a"), col("n_b"))
        >= lit(threshold))
      .select(col("id_a"), col("id_b"))
    stars.unionByName(repPairs)
  }
}

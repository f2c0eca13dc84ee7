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

  // --- MinHash + LSH --------------------------------------------------------

  object MinHashLsh {
    val NumHashes = 32
    val Bands = 8
    val RowsPerBand: Int = NumHashes / Bands
    private val Mask = 0xffffffffL

    /** Deterministic (a, b) coefficient pairs via splitmix64(seed). */
    private[dedup] def coeffs(seed: Long = 42L): Array[(Long, Long)] = {
      var x = seed
      def next(): Long = {
        x += 0x9e3779b97f4a7c15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      Array.fill(NumHashes)(((next() & Mask) | 1L, next() & Mask))
    }

    /** Word n-gram shingles of the token array. */
    def shingles(toks: Column, n: Int = 3): Column =
      transform(
        sequence(lit(1), greatest(lit(1), size(toks) - (n - 1))),
        i => concat_ws(" ", slice(toks, i, lit(n))))

    /** 32-long minhash signature. Universal-ish hash family
      * h_i(x) = (a_i·x + b_i) mod 2^32 over xxhash64-folded shingles; long
      * multiply wraps mod 2^64 and 2^32 divides 2^64, so the masked result
      * is exact — no overflow hazard.
      */
    def signature(shingleCol: Column): Column = {
      val hashes = transform(shingleCol, s => xxhash64(s).bitwiseAND(lit(Mask)))
      val cs = coeffs()
      array(cs.map { case (a, b) =>
        aggregate(hashes, lit(Long.MaxValue),
          (acc, h) => least(acc, (lit(a) * h + lit(b)).bitwiseAND(lit(Mask))))
      }: _*)
    }

    /** Candidate pairs from banded signatures, verified with exact Jaccard
      * over distinct shingle sets; returns pairs with `jaccard >= threshold`.
      */
    def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
        threshold: Double = 0.5, shingleN: Int = 3): DataFrame = {
      val toks = TextFunctions.tokens(col(textCol))
      val withSig = df.select(col(idCol).as("id"),
          shingles(toks, shingleN).as("sh"))
        .withColumn("sig", signature(col("sh")))
        .withColumn("shset", array_distinct(col("sh")))
      val banded = withSig.select(col("id"), col("shset"), posexplode(
        array((0 until Bands).map { b =>
          xxhash64(concat_ws("_",
            (0 until RowsPerBand).map(r =>
              element_at(col("sig"), b * RowsPerBand + r + 1)): _*), lit(b))
        }: _*)).as(Seq("band", "bkey")))
      val l = banded.select(col("band"), col("bkey"),
        col("id").as("id_a"), col("shset").as("set_a"))
      val r = banded.select(col("band"), col("bkey"),
        col("id").as("id_b"), col("shset").as("set_b"))
      l.join(r, Seq("band", "bkey")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
            size(array_distinct(concat(col("set_a"), col("set_b")))).cast("double"))
            .as("jaccard"))
        .dropDuplicates("id_a", "id_b")
        .filter(col("jaccard") >= threshold)
    }
  }

  // --- SimHash --------------------------------------------------------------

  /** 64-bit simhash of the token array: bit b is set iff at least half the
    * token hashes have bit b set (charge accumulation with majority sign).
    */
  def simhash(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    val n = size(hashes)
    (0 until 64).map { b =>
      val cnt = size(filter(hashes,
        h => shiftright(h, b).bitwiseAND(lit(1L)) === lit(1L)))
      when(cnt * 2 >= n, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Near-dup pairs by simhash Hamming distance. Blocking: split the 64-bit
    * sketch into 4 16-bit chunks; by pigeonhole any pair with Hamming ≤ 3
    * agrees on ≥ 1 chunk, so the chunk join loses nothing at maxHamming ≤ 3.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      simhash(TextFunctions.tokens(col(textCol))).as("sh"))
    val chunked = sh.select(col("id"), col("sh"), posexplode(array(
      (0 until 4).map(c => shiftright(col("sh"), c * 16).bitwiseAND(lit(0xffffL))): _*))
      .as(Seq("chunk", "ckey")))
    val l = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("chunk", "ckey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  // --- exact n-gram Jaccard (oracle-verifiable reference path) --------------

  /** Exact token-set Jaccard for all pairs within a blocking column. The
    * blocking key bounds the pair space (per-block O(m²)); at 100 TB the
    * block would be an LSH band, here it is a semantic key (e.g. lang).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val base = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      array_distinct(TextFunctions.tokens(col(textCol))).as("tset"))
    val l = base.select(col("block"), col("id").as("id_a"), col("tset").as("set_a"))
    val r = base.select(col("block"), col("id").as("id_b"), col("tset").as("set_b"))
    l.join(r, Seq("block")).filter(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        (size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_distinct(concat(col("set_a"), col("set_b")))).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // --- embedding cosine near-dup --------------------------------------------

  /** Semantic near-dup: all pairs with cosine ≥ threshold. All-pairs here
    * (fixture-sized corpus); the scale path blocks through
    * [[graft.similarity.Ann.lshTopK]] buckets first.
    */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.norm2(col(vecCol)).as("n2"))
    val l = base.select(col("id").as("id_a"), col("v").as("v_a"), col("n2").as("n2_a"))
    val r = base.select(col("id").as("id_b"), col("v").as("v_b"), col("n2").as("n2_b"))
    l.join(r, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosinePrenormed(
          VectorFunctions.dot(col("v_a"), col("v_b")),
          col("n2_a"), col("n2_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}

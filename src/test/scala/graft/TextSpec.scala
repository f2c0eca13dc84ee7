package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextFunctions._

/** Planted-value tests for the repetition signal family — covers the short
  * and empty documents the oracle fixture never produces (its docs are all
  * dozens of tokens long), where the n-gram guards must kick in.
  */
class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(texts: (Long, String)*) =
    texts.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), tokens(col("text")).as("toks"))

  test("tokenNgrams: counts, contents, and short-doc guard") {
    val r = frame((0L, "a b c d e f"), (1L, "a b"), (2L, "a"))
      .select(col("doc_id"), tokenNgrams(col("toks"), 5).as("g5"),
        tokenNgrams(col("toks"), 2).as("g2"))
      .collect().map(x => x.getLong(0) ->
        (x.getSeq[String](1), x.getSeq[String](2))).toMap
    assert(r(0L)._1 == Seq("a b c d e", "b c d e f"))
    assert(r(0L)._2.length == 5 && r(0L)._2.head == "a b")
    assert(r(1L)._1.isEmpty && r(1L)._2 == Seq("a b"))
    assert(r(2L)._1.isEmpty && r(2L)._2.isEmpty)
  }

  test("dup fractions: fully repeated doc vs all-distinct doc") {
    val r = frame((0L, "a a a a a a"), (1L, "a b c d e f"))
      .select(col("doc_id"), dupTokenFrac(col("toks")).as("dt"),
        dupNgramFrac(col("toks"), 5).as("d5"))
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    // 6 tokens, 1 distinct → 5/6; two identical 5-grams → 1/2
    assert(math.abs(r(0L)._1 - 5.0 / 6.0) < 1e-15 && r(0L)._2 == 0.5)
    assert(r(1L)._1 == 0.0 && r(1L)._2 == 0.0)
  }

  test("PII redaction: emails and phones scrubbed, counts exact, rest intact") {
    val r = Seq(
      (0L, "mail bob.smith+x@corp.example.org or 555-0199 and 123-4567 end"),
      (1L, "no pii here, just 12-34 and almost@nothing"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        piiCount(col("text"), emailPattern).as("ne"),
        piiCount(col("text"), phonePattern).as("np"),
        redactPii(col("text")).as("red"))
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2), x.getString(3)))
      .toMap
    assert(r(0L) == (1, 2,
      "mail <EMAIL> or <PHONE> and <PHONE> end"))
    // "almost@nothing" has no dot-TLD → not an email; "12-34" too short
    assert(r(1L) == (0, 0, "no pii here, just 12-34 and almost@nothing"))
  }

  test("q77 composition handles docs below every n-gram threshold") {
    val d = Seq((0L, "x y x y x y"), (1L, "solo")).toDF("doc_id", "text")
    val base = d.select(col("doc_id"), tokens(col("text")).as("toks"))
    val rl = base.select(col("doc_id"), size(col("toks")).as("n_tokens"),
      dupNgramFrac(col("toks"), 5).as("d5"))
    val top = base
      .select(col("doc_id"), explode(tokenNgrams(col("toks"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("maxc"))
    val r = rl.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"),
        least((coalesce(col("maxc"), lit(0L)) * 2).cast("double")
          / col("n_tokens"), lit(1.0)).as("cover"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // "x y" appears 3× in 6 tokens → 2·3/6 = 1.0 (cap boundary exact)
    assert(r(0L) == 1.0)
    assert(r(1L) == 0.0) // no bigrams → null maxc → 0
  }

  test("topNgramCount: row-local mode multiplicity equals the " +
      "explode+groupBy count on adversarial docs") {
    // planted repeats, all-distinct, below-threshold, interleaved runs,
    // and a repeated-single-token doc whose bigrams are all equal
    val d = Seq(
      (0L, "x y x y x y"),           // "x y" ×3 (also "y x" ×2)
      (1L, "a b c d e f"),           // all distinct → mode 1
      (2L, "solo"),                  // no bigrams → 0
      (3L, ""),                      // empty → 0
      (4L, "a a a a"),               // "a a" ×3
      (5L, "p q r p q s p q"))       // "p q" ×3, non-adjacent occurrences
      .toDF("doc_id", "text")
    val base = d.select(col("doc_id"), tokens(col("text")).as("toks"))
    val local = base.select(col("doc_id"),
        topNgramCount(col("toks"), 2).as("maxc"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(local == Map(0L -> 3L, 1L -> 1L, 2L -> 0L, 3L -> 0L,
      4L -> 3L, 5L -> 3L), s"planted modes: $local")
    // parity with the distributed form on every doc that HAS bigrams
    val dist = base
      .select(col("doc_id"), explode(tokenNgrams(col("toks"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("maxc"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(dist.forall { case (id, c) => local(id) == c },
      s"row-local mode must equal the grouped count: $local vs $dist")
  }

  test("bm25: hand-computed scores, ranking, and non-matching doc exclusion") {
    val docs = Seq(
      (1L, "spark spark fast"),
      (2L, "merge spark slow engine"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val r = graft.text.Retrieval
      .bm25(docs, "text", "doc_id", Seq("spark", "merge"))
      .collect()
    // N=3, sum_dl=10, avgdl=10/3; df(spark)=2, df(merge)=1
    val avgdl = 10.0 / 3.0
    val idfS = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    val idfM = math.log(1.0 + (3.0 - 1.0 + 0.5) / (1.0 + 0.5))
    def k(dl: Double) = 1.2 * (0.25 + 0.75 * (dl / avgdl))
    val s1 = idfS * ((2.0 * 2.2) / (2.0 + k(3.0)))
    val s2 = idfS * ((1.0 * 2.2) / (1.0 + k(4.0))) +
      idfM * ((1.0 * 2.2) / (1.0 + k(4.0)))
    assert(r.map(_.getLong(0)).toSeq == Seq(2L, 1L)) // doc 3 matched nothing
    val byId = r.map(x => x.getLong(0) -> x.getDouble(4)).toMap
    assert(math.abs(byId(1L) - s1) < 1e-12)
    assert(math.abs(byId(2L) - s2) < 1e-12)
    // per-term column of a doc lacking that term is exactly 0.0
    val d1 = r.find(_.getLong(0) == 1L).get
    assert(d1.getDouble(3) == 0.0) // s_merge for doc 1
    assertThrows[IllegalArgumentException] {
      graft.text.Retrieval.bm25(docs, "text", "doc_id", Seq("a", "a"))
    }
  }

  test("bm25: adversarial terms (column-name and backtick) do not collide") {
    // the pivot runs on reserved t<i> keys, so a query term named like an
    // internal column ("doc_id", "dl") or carrying a backtick must score
    // normally instead of colliding with the schema
    val docs = Seq(
      (1L, "doc_id dl `tick` normal"),
      (2L, "normal words only here")).toDF("doc_id", "text")
    val r = graft.text.Retrieval
      .bm25(docs, "text", "doc_id", Seq("doc_id", "dl", "`tick`"))
      .collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L), "only doc 1 matches")
    val row = r.head
    assert(row.schema.fieldNames.toSeq ==
      Seq("doc_id", "dl", "s_doc_id", "s_dl", "s_`tick`", "score"))
    assert(row.getDouble(5) > 0.0)
  }

  test("rrf fusion: hand-derived ranks from both retrievers, full-outer union") {
    val docs = Seq(
      (1L, "spark spark fast"),
      (2L, "merge spark slow engine"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    // query vec = id 0; cosine to (1,0) ranks: doc 1 (aligned) > doc 2 > doc 3
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.5f, 0.5f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val r = graft.text.Retrieval
      .rrfFusion(docs, embs, Seq("spark", "merge"), queryVecId = 0L, topK = 2)
      .collect()
      .map(x => x.getLong(0) ->
        ((Option(x.get(1)), Option(x.get(2)), x.getDouble(3)))).toMap
    // lexical top-2 (bm25 spec above): doc 2 rank 1, doc 1 rank 2
    // dense top-2 vs vec 0: doc 1 rank 1, doc 2 rank 2
    def f(x: Int) = 1.0 / (60.0 + x)
    assert(r(1L) == ((Some(2L), Some(1L), f(2) + f(1))))
    assert(r(2L) == ((Some(1L), Some(2L), f(1) + f(2))))
    assert(!r.contains(3L)) // outside both top-2 lists
  }

  test("unigram NLL: hand-computed add-one-smoothed scores, integer-exact") {
    // corpus: a a b | b c  →  cnt(a)=2 cnt(b)=2 cnt(c)=1, T=5, V=3
    val docs = Seq((1L, "a A b"), (2L, "b c")).toDF("doc_id", "text")
    def u(p: Double): Long = math.floor(-math.log(p) * 1e6).toLong
    val pa = 3.0 / 8.0; val pb = 3.0 / 8.0; val pc = 2.0 / 8.0
    val r = graft.text.LanguageModel.unigramNll(docs, "text", "doc_id")
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    val d1 = 2 * u(pa) + u(pb)
    val d2 = u(pb) + u(pc)
    assert(r(1L) == ((3L, d1, d1 / 3)))
    assert(r(2L) == ((2L, d2, d2 / 2)))
  }

  test("orderBy-free queries (q77 decision): output is a deterministic " +
      "ROW SET across partitionings — the invariant the gates' " +
      "sort-before-hash relies on") {
    // q77 (and q31/q32/q105 by the same decision) drops its trailing
    // orderBy because both correctness gates (the driver's compare and
    // dev/check.py) sort rows before hashing. That makes the engine-side
    // contract "deterministic as a SET, any row order" — pinned here by
    // running the registered q77 under two different partitionings and
    // comparing SORTED rows exactly. If a future gate or consumer starts
    // assuming ordered output, this test is the place that documents the
    // contract it would be breaking.
    def rows(parts: String) = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try graft.SparkEntry.queries("q77_repetition")(spark, TestSpark.sfDir)
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val a = rows("2"); val b = rows("7")
    assert(a.nonEmpty && a == b,
      "q77 must be content-deterministic as a set across partitionings")
  }
}

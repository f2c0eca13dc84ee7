package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

/** Golden-vector tests for the byte-level BPE tokenizer: the merge
  * sequence on the classic BPE-paper corpus is hand-computed, token ids
  * are asserted exactly, and every byte sequence must round-trip.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the BPE-paper corpus: low×5 lower×2 newest×6 widest×3
  private def corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("text")

  test("golden vectors: merge order on the BPE-paper corpus") {
    val m = Bpe.train(corpus, "text", nMerges = 4)
    // hand-computed: (e,s) 9 beats (s,t) 9 on the lexicographic tie-break;
    // then (es,t) 9; then (l,o) 7 beats (o,w) 7; then (lo,w) 7
    assert(m.merges.toSeq == Seq(
      (101, 115), (256, 116), (108, 111), (258, 119)))
  }

  test("golden vectors: token ids") {
    val m = Bpe.train(corpus, "text", nMerges = 4)
    assert(m.encode("low").toSeq == Seq(259))
    assert(m.encode("lowest").toSeq == Seq(259, 257)) // low + est
    assert(m.encode("newest").toSeq == Seq(110, 101, 119, 257)) // n e w est
    assert(m.encode("widest").toSeq == Seq(119, 105, 100, 257)) // w i d est
  }

  test("training is deterministic") {
    val a = Bpe.train(corpus, "text", nMerges = 4)
    val b = Bpe.train(corpus, "text", nMerges = 4)
    assert(a.merges.toSeq == b.merges.toSeq)
  }

  test("pre-tokenizer: GPT-2 word pattern semantics") {
    assert(Bpe.preTokenize("hello world").toSeq == Seq("hello", " world"))
    assert(Bpe.preTokenize("it's 42!").toSeq == Seq("it", "'s", " 42", "!"))
  }

  test("byte-level round-trip: unicode, empty, whitespace") {
    val m = Bpe.train(corpus, "text", nMerges = 4)
    for (s <- Seq("héllo wörld 😀", "", "  \t\n ", "lowest newest",
        "ζωή, bio")) {
      assert(m.decode(m.encode(s)) == s, s"round-trip failed for: '$s'")
    }
  }

  test("native expression bpe_encode matches the driver-side encoder") {
    val m = Bpe.train(corpus, "text", nMerges = 4)
    val texts = Seq("low lower", "newest widest", "off-vocab ΩΞ bytes")
    val got = texts.toDF("t")
      .select(Bpe.encodeCol(col("t"), m).as("ids"),
        Bpe.countCol(col("t"), m).as("n"))
      .collect()
    texts.zip(got).foreach { case (t, row) =>
      val expect = m.encode(t).toSeq
      assert(row.getSeq[Int](0) == expect)
      assert(row.getInt(1) == expect.length)
    }
  }

  test("save/load round-trips the model exactly") {
    val m = Bpe.train(corpus, "text", nMerges = 4)
    Bpe.save(m, spark, "graft_bpe_spec_roundtrip")
    try {
      val loaded = Bpe.load(spark, "graft_bpe_spec_roundtrip")
      assert(loaded.merges.toSeq == m.merges.toSeq)
      assert(loaded.encode("lowest newest").toSeq == m.encode("lowest newest").toSeq)
    } finally { spark.sql("DROP TABLE IF EXISTS graft_bpe_spec_roundtrip"); () }
  }

  test("q86: packing + tokenizer proofs hold on every document") {
    val r = SparkEntry.queries("q86_bpe_pack")(spark, TestSpark.sfDir)
      .cache()
    try {
      assert(r.count() > 0)
      // the oracle gates these as literal TRUE — fail here with the
      // offending doc ids rather than as an opaque driver hash mismatch
      Seq("roundtrip_ok", "count_ok", "adj_ok").foreach { c =>
        val bad = r.filter(!col(c)).select("doc_id").collect().map(_.getLong(0))
        assert(bad.isEmpty, s"$c false for docs ${bad.take(5).mkString(",")}")
      }
    } finally { r.unpersist(); () }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.NaiveBayes

/** [[NaiveBayes]]: the trained-filter classifier actually LEARNS on a
  * separable planted corpus (the fixture query q125's documents carry no
  * label signal, so the oracle gate there is exact model replay — the
  * learning semantics are pinned here), with the smoothing math checked
  * by hand and the argmax tie rule pinned.
  */
class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("separable planted corpus: correct predictions, hand-computed " +
      "smoothed scores, symmetric doc ties to the smaller label") {
    // cnt(alpha|A)=5, cnt(beta|A)=1, T_A=6; mirrored for B; V=2;
    // priors 2/4 each → p(own-token|own-class) = 6/8, cross = 2/8
    val train = Seq(
      (1L, "alpha alpha alpha", "A"), (2L, "alpha alpha beta", "A"),
      (3L, "beta beta beta", "B"), (4L, "beta beta alpha", "B"))
      .toDF("doc_id", "text", "lang")
    val score = Seq(
      (10L, "alpha alpha"), // 2·ln(.75) vs 2·ln(.25) → A
      (11L, "beta"),        // → B
      (13L, "alpha beta"))  // ln(.75)+ln(.25) BOTH classes → tie → A
      .toDF("doc_id", "text")
    val r = NaiveBayes.trainScore(train, score, "text", "doc_id", "lang")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
      .sortBy(_._1)
    def u(p: Double) = math.floor(math.log(p) * 1e6).toLong
    assert(r.map(t => (t._1, t._2)).toSeq ==
      Seq((10L, "A"), (11L, "B"), (13L, "A")),
      s"predictions + tie rule: ${r.toSeq}")
    assert(r(0)._3 == u(0.5) + 2 * u(0.75),
      "score_u = micro(prior) + Σ micro(smoothed token likelihood)")
    assert(r(2)._3 == u(0.5) + u(0.75) + u(0.25), "tie score is A's own")
  }

  test("OOV tokens score the count-0 likelihood; prior decides a doc " +
      "of pure OOV; every scored doc gets exactly one verdict") {
    val train = Seq(
      (1L, "alpha", "A"), (2L, "alpha", "A"), (3L, "beta", "B"))
      .toDF("doc_id", "text", "lang")
    // unseen: p = 1/(T_c+V); T_A=2, T_B=1, V=2 → A: 1/4, B: 1/3 —
    // but priors A=2/3, B=1/3: score(A) = ln(2/3)+ln(1/4) ≈ -1.79,
    // score(B) = ln(1/3)+ln(1/3) ≈ -2.20 → A wins on the combination
    val score = Seq((10L, "gamma")).toDF("doc_id", "text")
    val r = NaiveBayes.trainScore(train, score, "text", "doc_id", "lang")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    def u(p: Double) = math.floor(math.log(p) * 1e6).toLong
    assert(r.length == 1 && r(0)._1 == 10L)
    assert(r(0)._2 == "A" &&
      r(0)._3 == u(2.0 / 3.0) + u(1.0 / 4.0),
      s"OOV scores the smoothed zero-count likelihood: ${r.toSeq}")
  }
}

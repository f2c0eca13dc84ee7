package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained unigram language-model scoring — the CCNet-style
  * "perplexity against a reference LM" quality filter, with the reference
  * LM trained in-pass over the corpus itself (one aggregation), so the
  * whole signal is two shuffles end to end at any corpus size.
  *
  * A document full of globally-rare tokens (mojibake, hex dumps, boiler
  * IDs) gets a high negative-log-likelihood; natural text lands low.
  * Curation pipelines threshold or bucket this exactly like the Gopher
  * heuristics, but it is corpus-adaptive instead of hand-tuned.
  *
  * Model: add-one-smoothed unigram, p(t) = (count(t) + 1) / (T + V) with
  * T = total token occurrences, V = distinct-token vocabulary size. The
  * per-document score is the mean token NLL, -Σ ln p(t) / n.
  *
  * Scale shape: tokenize once; the count table aggregates with map-side
  * combine (one shuffle, |V| rows); the score join is token-keyed (AQE
  * broadcasts it when V is small, as in the fixture); the per-doc rollup
  * is one more partial agg. T and V are a one-row broadcast. No driver
  * state beyond two scalars.
  *
  * Cross-engine parity (SURVEY H7 discipline, same as BM25): ln() is the
  * one op whose last ulp differs between the JVM and libm, and per-doc
  * float-sum ORDER is nondeterministic under parallelism. Both are
  * removed at once by quantizing each token's NLL to integer micro-units
  * (floor(nll·1e6) — exact IEEE multiply + floor) BEFORE the per-doc sum:
  * integer sums are order-independent, so the gated result is exact to
  * 1e-6 per token on any engine at any parallelism.
  */
object LanguageModel {

  /** Per-document unigram NLL in integer micro-units.
    *
    * Output: (doc_id, n_tokens, nll_u, mean_nll_u) where nll_u =
    * Σ floor(-ln p(token) · 1e6) over token occurrences and mean_nll_u =
    * nll_u / n_tokens (integer division — exact, portable).
    */
  def unigramNll(docs: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val toks = TextFunctions.tokens(lower(col(textCol)))
    val occ = graft.core.Parallelism.ensure(
        docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"), explode(toks).as("token"))
    val counts = occ.groupBy("token").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("t_occ"),
      count(lit(1)).as("v_vocab"))
    // nll_u(token) = floor(-ln((cnt+1)/(T+V)) * 1e6): quantize per token
    // BEFORE summing so the doc score is an order-independent long sum
    val perTok = occ.join(counts, "token").crossJoin(broadcast(totals))
      .select(col("doc_id"),
        floor(-log((col("cnt").cast("double") + lit(1.0)) /
            (col("t_occ").cast("double") + col("v_vocab").cast("double")))
          * lit(1e6)).cast("long").as("nll_u"))
    perTok.groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        sum(col("nll_u")).as("nll_u"))
      .select(col("doc_id"), col("n_tokens"), col("nll_u"),
        (col("nll_u") / col("n_tokens")).cast("long").as("mean_nll_u"))
  }
}

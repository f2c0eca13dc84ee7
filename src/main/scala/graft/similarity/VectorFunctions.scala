package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure column
  * expressions (codegen'd array lambdas — no UDFs, no driver collect).
  *
  * Parity contract with the DuckDB oracle: every fold is a LEFT fold in
  * element order with a 0.0 init, every element is cast float→double before
  * arithmetic, and cosine is `dot / (sqrt(n2a) * sqrt(n2b))` — mirrored
  * in SQL as `list_reduce(list_transform(...), (x,y) -> x+y)`. DuckDB's
  * builtin `list_cosine_similarity` computes in FLOAT and does NOT match;
  * the oracles use the explicit double formula instead.
  */
object VectorFunctions {

  /** dot(a, b) in double, left-fold in element order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm in double. */
  def norm2(a: Column): Column =
    aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  // Note: a fully-unrolled 64-term variant (element_at×128 per pair) was
  // measured 3× SLOWER than the fold — the giant expression blows codegen
  // method-size limits and drops out of JIT-friendly code. The array-lambda
  // fold is the fast path; keep hot-pair-join speedups to parallelism
  // (repartitioning the stream side), not expression rewrites.

  /** Cosine with precomputed norms — the join-side form: norms are computed
    * once per row before the pair join instead of once per pair.
    */
  def cosinePrenormed(dotAB: Column, norm2A: Column, norm2B: Column): Column =
    dotAB / (sqrt(norm2A) * sqrt(norm2B))
}

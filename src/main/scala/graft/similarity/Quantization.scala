package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Int8VecDot

/** Int8 scalar quantization of `array<float>` embeddings — the memory/IO
  * lever for ANN at corpus scale: 4× smaller vectors (1 byte vs 4 per
  * dimension) shrink the scan, the shuffle, AND the broadcast of every
  * similarity operator, at a bounded accuracy cost.
  *
  * Scheme: per-vector SYMMETRIC quantization. `scale = max|x| / 127`,
  * `q_i = round(x_i / scale)` ∈ [-127, 127]. Symmetric (no zero-point)
  * is deliberate: in `cosine(a, b)` the two scales cancel —
  *
  *   cos_q = Σ qa·qb / (√Σ qa² · √Σ qb²)
  *
  * — so scoring needs NO float data at all: exact int64 sums (native
  * [[Int8VecDot]] codegen loop) and two sqrt's. Exact integer math is
  * also what makes the quantized ANN query oracle-verifiable to the hash
  * bit, unlike any float-accumulation path.
  *
  * Reconstruction error is classic scalar-quant: |x − scale·q| ≤ scale/2
  * per element (QuantizationSpec pins it).
  */
object Quantization {

  /** Quantized form: struct(scale double, q array<tinyint>). Zero vectors
    * (scale 0) quantize to all-zero q, dequantize back to exact zeros.
    */
  def quantize(v: Column): Column = {
    val scale = array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0)
    struct(
      scale.as("scale"),
      when(scale > 0,
        transform(v, x => round(x.cast("double") / scale).cast("tinyint")))
        .otherwise(transform(v, _ => lit(0).cast("tinyint"))).as("q"))
  }

  /** Reconstruct doubles from a quantized struct. */
  def dequantize(qv: Column): Column =
    transform(qv.getField("q"),
      q => q.cast("double") * qv.getField("scale"))

  /** Cosine between quantized vectors given precomputed squared norms —
    * scales cancel under symmetric quantization, so this is integer dot /
    * integer norms, bit-exact across engines.
    */
  def qcosine(qa: Column, qb: Column, qn2a: Column, qn2b: Column): Column =
    Int8VecDot.dot(qa, qb).cast("double") /
      (sqrt(qn2a.cast("double")) * sqrt(qn2b.cast("double")))

  /** Brute-force top-k over int8-quantized vectors — the quantized twin of
    * [[Ann.bruteForceTopK]]: same broadcast-the-queries shape, 4× less
    * corpus traffic, integer scoring loop. Quantization and per-row norms
    * happen BEFORE the pair join (once per vector, not once per pair).
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    def prep(df: DataFrame) =
      df.select(col("vec_id"), quantize(col("embedding")).getField("q").as("q"))
        .withColumn("qn2", Int8VecDot.norm2(col("q")))
    val c = prep(corpus.repartition(par))
      .select(col("vec_id").as("nid"), col("q").as("cq"), col("qn2").as("cn2"))
    val q = prep(queries)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("qn2").as("qn2"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    c.join(broadcast(q), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        qcosine(col("qq"), col("cq"), col("qn2"), col("cn2")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.similarity.{Ann, Quantization}

/** Int8 quantization contracts: the scalar-quant error bound, cosine
  * fidelity on real fixture embeddings, and recall of the quantized top-k
  * against the exact float baseline.
  */
class QuantizationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("round-trip error bounded by scale/2 per element; zero vector exact") {
    val df = Seq(
      (0L, Array(0.31f, -2.7f, 0.004f, 1.9f)),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        Quantization.quantize(col("embedding")).as("qv"))
      .select(col("vec_id"), col("embedding"),
        col("qv.scale").as("scale"),
        Quantization.dequantize(col("qv")).as("back"))
      .collect()
    df.foreach { r =>
      val orig = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val back = r.getSeq[Double](3)
      orig.zip(back).foreach { case (x, y) =>
        assert(math.abs(x.toDouble - y) <= scale / 2 + 1e-12,
          s"element $x reconstructed as $y exceeds scale/2=${scale / 2}")
      }
    }
    // zero vector: scale 0, exact zeros back
    assert(df.find(_.getLong(0) == 1L).get.getSeq[Double](3).forall(_ == 0.0))
  }

  test("quantized cosine tracks exact cosine on fixture embeddings") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir).limit(40)
    val a = emb.select(col("vec_id").as("ida"), col("embedding").as("va"),
      Quantization.quantize(col("embedding")).getField("q").as("qa"))
    val b = emb.select(col("vec_id").as("idb"), col("embedding").as("vb"),
      Quantization.quantize(col("embedding")).getField("q").as("qb"))
    val rows = a.join(b, col("ida") < col("idb"))
      .select(
        graft.similarity.VectorFunctions.cosine(col("va"), col("vb")).as("exact"),
        Quantization.qcosine(col("qa"), col("qb"),
          graft.functions.Int8VecDot.norm2(col("qa")),
          graft.functions.Int8VecDot.norm2(col("qb"))).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    val maxErr = rows.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).max
    // int8 on 64-dim vectors: quantization noise stays well under 0.05
    assert(maxErr < 0.05, s"max |exact - quantized| cosine error $maxErr")
  }

  test("quantized top-k: high recall vs exact float baseline") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Ann.bruteForceTopK(emb, queries, k = 5))
    val quant = pairs(Quantization.quantizedTopK(emb, queries, k = 5))
    val recall = (exact & quant).size.toDouble / exact.size
    // scalar int8 is a faithful scorer (unlike LSH bucketing, nothing is
    // skipped — only scored at lower precision): recall should be high
    assert(recall >= 0.8, s"recall=$recall")
  }
}

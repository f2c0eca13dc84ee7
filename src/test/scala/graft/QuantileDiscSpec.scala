package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Property-style tests (seeded random groups) for the DuckDB-discrete
  * quantile rule: the result always equals the sorted group's element at
  * 1-indexed ceil(q·n) — the rule empirically verified against DuckDB
  * 1.0.0 (see GraftFunctions).
  */
class QuantileDiscSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(values: Seq[Double], q: Double): Double = {
    val sorted = values.sorted
    val idx = math.max(1, math.ceil(q * sorted.size).toInt)
    sorted(idx - 1)
  }

  private val rnd = new scala.util.Random(42)
  private val qs = Seq(0.1, 0.25, 1.0 / 3.0, 0.5, 0.75, 0.9, 0.99)

  test("quantileDisc == sorted-element rule on random groups") {
    for (trial <- 1 to 25) {
      val n = 1 + rnd.nextInt(200)
      val vs = Seq.fill(n)(rnd.nextDouble() * 2e6 - 1e6)
      val q = qs(trial % qs.size)
      val got = vs.toDF("x")
        .agg(GraftFunctions.quantileDisc(col("x"), q)).head().getDouble(0)
      assert(got == reference(vs, q), s"n=$n q=$q")
    }
  }

  test("quantileDisc returns an actual input element (never interpolates)") {
    for (_ <- 1 to 10) {
      val vs = Seq.fill(1 + rnd.nextInt(50))(rnd.nextDouble() * 1e3)
      val got = vs.toDF("x")
        .agg(GraftFunctions.quantileDisc(col("x"), 0.5)).head().getDouble(0)
      assert(vs.contains(got))
    }
  }

  test("grouped quantiles: per-group independence") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 20.0)).toDF("g", "x")
    val r = df.groupBy("g")
      .agg(GraftFunctions.quantileDisc(col("x"), 0.5).as("p50"),
        GraftFunctions.quantileDisc(col("x"), 0.9).as("p90"))
      .orderBy("g").collect()
    assert(r(0).getDouble(1) == 2.0 && r(0).getDouble(2) == 4.0)
    assert(r(1).getDouble(1) == 10.0 && r(1).getDouble(2) == 20.0)
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` summing doubles through exact `BigDecimal(scale 6)`
  * arithmetic — the Dataset-API counterpart of
  * [[GraftFunctions.sumExact]] (SURVEY §2.10's typed-aggregator path).
  * Rounding each input once to 6 decimal places mirrors the SQL path's
  * `cast(x as decimal(18,6))` (HALF_UP — ties are non-dyadic for scale ≥ 1,
  * so the rounding mode never actually decides); the running sum is exact,
  * hence merge-order-independent across partitions.
  */
class DecimalSum[IN](f: IN => Double)
    extends Aggregator[IN, java.math.BigDecimal, Double] {

  private val Scale = 6

  override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO

  override def reduce(acc: java.math.BigDecimal, in: IN): java.math.BigDecimal = {
    val v = f(in)
    // cast-parity guards: decimal(18,6) nulls NaN/Infinity and values past
    // its 12 integral digits, and SQL sum skips nulls — mirror that here
    // (BigDecimal.valueOf would otherwise throw on non-finite input)
    if (v.isNaN || v.isInfinite || math.abs(v) >= 1e12) acc
    else
      // valueOf (shortest-string repr), NOT new BigDecimal(double): Spark's
      // double→decimal cast goes through the string form, and the two
      // differ on values whose shortest repr lands exactly on a rounding tie
      acc.add(java.math.BigDecimal.valueOf(v)
        .setScale(Scale, java.math.RoundingMode.HALF_UP))
  }

  override def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal =
    a.add(b)

  override def finish(acc: java.math.BigDecimal): Double = acc.doubleValue()

  override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY scale plan; "salting for skew").
  *
  * A hot grouping key concentrates its entire partition on one task. The
  * classic fix is two-stage aggregation: salt the key (deterministically,
  * from a sibling column's hash — NOT rand(), so replays and retries stay
  * stable), aggregate per (key, salt), then combine the partials. Valid
  * for any associative+commutative aggregate; exposed here for sums and
  * counts, which is what the engine's money/quantity rollups need.
  *
  * AQE's skew-join splitting handles the JOIN side of skew at runtime;
  * this handles the AGGREGATION side, which AQE does not rebalance.
  */
object Skew {

  /** Deterministic salt in [0, n) from the hash of `from`. */
  def salt(from: Column, n: Int): Column = pmod(xxhash64(from), lit(n))

  /** Two-stage salted sum/count aggregation. `sums` maps output column
    * name → the exact-decimal column to sum (see GraftFunctions.sumExact
    * for why decimal). Result is identical to the direct groupBy — just
    * skew-proof — so it can be verified against the plain-SQL oracle.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltFrom: Column,
      sums: Map[String, Column], saltFactor: Int = 16): DataFrame = {
    val partials = sums.toSeq.map { case (name, c) =>
      sum(c).as(s"__p_$name")
    } :+ count(lit(1)).as("__p_count")
    val finals = sums.keys.toSeq.map { name =>
      sum(col(s"__p_$name")).cast("double").as(name)
    } :+ sum(col("__p_count")).as("n_rows")
    df.withColumn("__salt", salt(saltFrom, saltFactor))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}

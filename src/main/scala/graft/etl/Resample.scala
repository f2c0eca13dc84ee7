package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.hourBucket

/** Time-series regularization: bucket an event stream to a fixed grain,
  * materialize the missing buckets per key (dense spine), and carry
  * observations forward — the resample/gap-fill/ffill primitive every
  * time-series mart needs before windowed arithmetic is meaningful
  * (headway-style analytics silently skip silent hours otherwise).
  *
  * Plan shape: grain aggregate (one shuffle on key+bucket) → per-key
  * bounds + `sequence`/`explode` spine (no driver loop — the spine
  * generates distributed, one row per key then exploded) → left join
  * observations back on (key, bucket) → forward-fill window per key.
  * The spine size is bounded by each key's own time span, not the global
  * range, so a key active for an hour costs one row, not the full
  * history.
  */
object Resample {

  /** Hourly gap-fill of per-(key, hour) event counts: every hour between a
    * key's first and last activity appears exactly once, absent hours count
    * 0, and `last_seen_n` carries the last observed count forward
    * (IGNORE NULLS semantics — the fill never resets on a gap).
    */
  def hourlyGapFill(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val hourly = events
      .filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol), hourBucket(col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val spine = hourly.groupBy(keyCol)
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = Window.partitionBy(keyCol).orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("n_events"), ignoreNulls = true).over(w).as("last_seen_n"))
  }
}

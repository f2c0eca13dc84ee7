package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Headway mart — the analytical heart of the reference
  * (`dbt_project/models/marts/fct_headways.sql`): time between consecutive
  * arrivals per (line, stop), bucketed to the hour, aggregated to
  * avg / p50 / p90.
  *
  * Input contract: any frame with `line_id`, `stop_id`, `event_ts:timestamp`
  * — the TfL staging model or the `events` fixture mapped onto it.
  *
  * Plan shape (one shuffle, scale-clean):
  *   scan → filter(event_ts not null)                 [pushed to parquet]
  *   → shuffle on (line_id, stop_id)                  [window partition]
  *   → sort within partition by event_ts → lag(1)     [WindowExec]
  *   → headway + hour projection, filter prev null    [codegen]
  *   → partial agg → final agg on (line_id, stop_id, hour)
  * The group-by keys extend the window partition keys, so at scale the agg
  * reuses locality from the window shuffle; AQE coalesces the tail. Skewed
  * keys (one hot stop) are bounded by per-hour grain in the agg; the window
  * itself partitions per (line, stop), the natural parallelism of the data.
  *
  * Parity notes (SURVEY H1/H2/H7): headways are computed as exact integer
  * microseconds (`unix_micros` diff ≡ DuckDB `epoch_us(a-b)`), averaged as
  * an exact long sum divided once — no double-summation-order sensitivity —
  * and quantiles use the DuckDB-discrete rule (see
  * [[graft.functions.GraftFunctions.quantileDisc]]).
  */
object FctHeadways {

  /** Reference-faithful mart: seconds as double (`extract epoch` semantics). */
  def apply(stg: DataFrame): DataFrame = aggregate(gaps(stg))

  /** The lag pass: consecutive-arrival gaps per (line, stop), hour-bucketed.
    * Factored out so [[IncrementalHeadways]] can run the identical gap and
    * aggregation logic over a boundary-augmented slice.
    */
  private[etl] def gaps(stg: DataFrame): DataFrame = {
    val w = Window.partitionBy("line_id", "stop_id").orderBy("event_ts")
    stg
      .filter(col("event_ts").isNotNull)
      .select(col("line_id"), col("stop_id"), col("event_ts"))
      .withColumn("prev_ts", lag("event_ts", 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .select(
        col("line_id"), col("stop_id"), col("event_ts"),
        epochDiffUs(col("event_ts"), col("prev_ts")).as("headway_us"),
        hourBucket(col("event_ts")).as("hour"))
  }

  /** Hourly avg/p50/p90 over gap rows. */
  private[etl] def aggregate(g: DataFrame): DataFrame =
    g.groupBy("line_id", "stop_id", "hour")
      .agg(
        (sum("headway_us").cast("double") / count(lit(1)) / lit(1000000.0))
          .as("avg_headway_s"),
        (quantileDisc(col("headway_us"), 0.5).cast("double") / lit(1000000.0))
          .as("p50_headway_s"),
        (quantileDisc(col("headway_us"), 0.9).cast("double") / lit(1000000.0))
          .as("p90_headway_s"))
}

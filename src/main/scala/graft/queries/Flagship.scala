package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}
import graft.etl.FctHeadways
import graft.functions.GraftFunctions._

/** The reference-derived analytics core: the pricing-summary hash aggregate
  * and the headway mart (SURVEY §2.4/§2.5 — the analytical heart of the
  * reference, `fct_headways.sql`).
  */
object Flagship extends QueryModule {

  /** events → the staging contract the headway mart consumes
    * (event_type ≈ line, user ≈ stop).
    */
  def eventsAsArrivals(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_type").as("line_id"),
      col("user_id").cast("string").as("stop_id"),
      col("ts").as("event_ts"))

  /** Shared oracle CTE: events → per-(line, stop) headway gaps in exact
    * integer microseconds. Single definition consumed by q07 (full mart)
    * and q42 (SQL-entry-path variant) so the two cannot drift.
    */
  val headwayGapsCte: String =
    """WITH arrivals AS (
      |  SELECT event_type AS line_id, cast(user_id AS varchar) AS stop_id, ts AS event_ts
      |  FROM events WHERE ts IS NOT NULL
      |), ordered AS (
      |  SELECT *, lag(event_ts) OVER (PARTITION BY line_id, stop_id ORDER BY event_ts) AS prev_ts
      |  FROM arrivals
      |), gaps AS (
      |  SELECT line_id, stop_id,
      |         epoch_us(event_ts - prev_ts) AS headway_us,
      |         date_trunc('hour', event_ts) AS hour
      |  FROM ordered WHERE prev_ts IS NOT NULL
      |)""".stripMargin

  def queries: Map[String, QueryDef] = Map(

    // A1-A4/F-surface: TPC-H Q1-style pricing summary — group-by hash
    // aggregate with exact-decimal sums (H7) over a pruned parquet scan.
    "q01_pricing" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sumExact(col("l_quantity")).as("sum_qty"),
            sumExact(col("l_extendedprice")).as("sum_base_price"),
            sumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("sum_disc_price"),
            avgExact(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  cast(sum(cast(l_quantity AS decimal(18,6))) AS double) AS sum_qty,
             |  cast(sum(cast(l_extendedprice AS decimal(18,6))) AS double) AS sum_base_price,
             |  cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS decimal(18,6))) AS double) AS sum_disc_price,
             |  cast(sum(cast(l_quantity AS decimal(18,6))) AS double) / count(*) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // W1+A1-A3+F1-F2: the reference's headway mart (lag window → epoch diff
    // → hour bucket → avg/p50/p90 with discrete quantiles).
    "q07_headways" -> QueryDef(
      (s, dir) =>
        FctHeadways(eventsAsArrivals(s, dir))
          .orderBy("line_id", "stop_id", "hour"),
      Some(headwayGapsCte +
        """
          |SELECT line_id, stop_id, hour,
          |  cast(sum(headway_us) AS double) / count(*) / 1000000.0 AS avg_headway_s,
          |  cast(quantile_disc(headway_us, 0.5) AS double) / 1000000.0 AS p50_headway_s,
          |  cast(quantile_disc(headway_us, 0.9) AS double) / 1000000.0 AS p90_headway_s
          |FROM gaps
          |GROUP BY 1, 2, 3
          |ORDER BY line_id, stop_id, hour""".stripMargin)))
}

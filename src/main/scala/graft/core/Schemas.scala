package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Fixed schema contracts of the lakehouse layers (SURVEY §1 column
  * dictionary). The reference declares schemas explicitly at every boundary
  * — ingest projection (`tfl_ingest_dag.py:70-79`), typed staging casts
  * (`stg_arrivals.sql:18-25`), and a hard-coded empty-relation fallback
  * (`stg_arrivals.sql:30-40`) — and so do we: no inference, no evolution.
  */
object Schemas {

  /** Raw/bronze arrival snapshot row (reference `tfl_ingest_dag.py:70-79`).
    * `timestamp` stays a string until staging parses it fault-tolerantly.
    */
  case class Arrival(
      stopId: Option[String],
      lineId: Option[String],
      platformName: Option[String],
      destinationName: Option[String],
      timeToStation: Option[Long],
      timestamp: Option[String])

  val rawArrivals: StructType = StructType(Seq(
    StructField("stopId", StringType),
    StructField("lineId", StringType),
    StructField("platformName", StringType),
    StructField("destinationName", StringType),
    StructField("timeToStation", LongType),
    StructField("timestamp", StringType)))

  /** Typed staging row (reference `stg_arrivals.sql:18-25`). */
  case class StgArrival(
      line_id: Option[String],
      stop_id: Option[String],
      platform_name: Option[String],
      destination_name: Option[String],
      time_to_station_s: Option[Int],
      event_ts: Option[java.sql.Timestamp],
      ingested_at: java.sql.Timestamp)

  val stgArrivals: StructType = StructType(Seq(
    StructField("line_id", StringType),
    StructField("stop_id", StringType),
    StructField("platform_name", StringType),
    StructField("destination_name", StringType),
    StructField("time_to_station_s", IntegerType),
    StructField("event_ts", TimestampType),
    StructField("ingested_at", TimestampType)))

  /** Gold headway mart row (reference `fct_headways.sql:18-22`). */
  val fctHeadways: StructType = StructType(Seq(
    StructField("line_id", StringType),
    StructField("stop_id", StringType),
    StructField("hour", TimestampType),
    StructField("avg_headway_s", DoubleType),
    StructField("p50_headway_s", DoubleType),
    StructField("p90_headway_s", DoubleType)))

  /** CLI bronze row (reference `tfl_align.py:160-184`). */
  val alignedArrivals: StructType = StructType(Seq(
    StructField("snapshot_ts", StringType),
    StructField("line_id", StringType),
    StructField("lineName", StringType),
    StructField("naptanId", StringType),
    StructField("stationName", StringType),
    StructField("destinationName", StringType),
    StructField("expectedArrival", StringType),
    StructField("timeToStation", LongType),
    StructField("vehicleId", StringType),
    StructField("platformName", StringType),
    StructField("raw", StringType),
    StructField("expectedArrival_ts", TimestampType)))

  /** Empty, fully-typed relation — the reference's zero-files fallback
    * (`stg_arrivals.sql:30-40`, SURVEY S9/P6/H6): Spark raises on an empty
    * parquet glob where DuckDB's compiled model substitutes `where 1=0`.
    */
  def emptyRelation(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
}

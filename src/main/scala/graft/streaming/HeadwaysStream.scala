package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.{GraftSession, Schemas}
import graft.etl.{FctHeadways, StgArrivals}

/** Structured-Streaming variant of the transform (SURVEY §7 step 9,
  * §2.9): a file-source stream over the raw zone with the reference's
  * exact semantics — every trigger fully recomputes staging + mart over
  * ALL raw snapshot files seen so far (`foreachBatch` recompute; the
  * reference's dbt models are `+materialized: table`, recomputed per run,
  * and its replay story is "rerun over the append-only raw zone",
  * `README.md:184`).
  *
  * Why not incremental `flatMapGroupsWithState`: a watermarked stateful
  * variant drops late rows that the reference's batch recompute would
  * include — a semantic divergence. Full recompute per micro-batch is
  * exactly reference-equivalent and, at the reference's data rate
  * (hundreds of rows / 2 min), far below Spark's batch floor. The state
  * is the raw zone itself; the stream is just the scheduler.
  *
  * Scale note: at real scale the incremental path is
  * `withWatermark("event_ts", ...)` + `flatMapGroupsWithState` keyed by
  * (line_id, stop_id) holding the last arrival — O(keys) state, no
  * recompute. Kept out per the divergence above; the mart recompute
  * itself is one-shuffle (see [[graft.etl.FctHeadways]]).
  */
object HeadwaysStream {

  /** Start the stream: raw files in → silver parquet out, one full
    * recompute per trigger. `Trigger.AvailableNow` processes everything
    * present and stops — the scheduled-batch cadence of the reference.
    */
  def start(spark: SparkSession, rawDir: String, silverDir: String,
      checkpointDir: String, availableNow: Boolean = true): StreamingQuery = {
    GraftSession.tune(spark)
    val raw = spark.readStream
      .schema(Schemas.rawArrivals)
      .option("pathGlobFilter", "arrivals_*.parquet")
      .parquet(s"$rawDir/date=*")
    val trigger =
      if (availableNow) Trigger.AvailableNow()
      else Trigger.ProcessingTime("2 minutes") // the reference's cron cadence
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        // The micro-batch frame is only the NEW files; the reference
        // recomputes over the full history, so we re-read the whole raw
        // zone (batch read) and overwrite silver — replay-equivalent.
        val stg = StgArrivals(spark, rawDir)
        stg.write.mode(SaveMode.Overwrite).parquet(s"$silverDir/stg_arrivals")
        val stgBack = spark.read.schema(Schemas.stgArrivals)
          .parquet(s"$silverDir/stg_arrivals")
        FctHeadways(stgBack).write.mode(SaveMode.Overwrite)
          .parquet(s"$silverDir/fct_headways")
        ()
      }
      .start()
  }
}

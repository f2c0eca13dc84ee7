package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session operators shared by the batch and streaming paths.
  *
  * [[sessionAgg]] uses Spark's native `session_window` — the engine-level
  * gap-sessionization operator: on a batch frame it plans as a single
  * aggregate over merged session intervals (one shuffle on the grouping
  * key); on a streaming frame the same expression becomes stateful
  * session-window aggregation with watermark-driven state eviction —
  * O(open sessions) state, the 100 TB-stream formulation of q45/q47.
  *
  * Break rule (pinned empirically in StreamingSessionsSpec): Spark merges
  * a session whose next event lands exactly at `prev_ts + gap` and splits
  * only strictly beyond it — i.e. the same strict `next_ts - prev_ts >
  * gap` rule as the lag-based q45, so all three sessionization
  * formulations (window arithmetic, typed fold, session_window) agree
  * bit-for-bit.
  */
object Sessions {

  /** Gap-based sessions of an events frame (`user_id`, `ts`, ...): one row
    * per session with its first/last event time and event count. Works on
    * batch and streaming frames alike; streaming append mode additionally
    * needs `withWatermark` applied upstream.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")

  /** Stream-stream interval join: each purchase joins the same user's
    * clicks from the preceding `horizon` of event time. Both sides carry
    * watermarks, so Spark bounds the join state to the interval window and
    * evicts it as the watermarks advance — the streaming form of the q19
    * range join (which buckets the same predicate for batch). Equi-key on
    * user_id plus a time-range conjunct is exactly the shape Structured
    * Streaming's state store supports; without the range bound the state
    * would grow forever.
    */
  def clickPurchaseJoin(purchases: DataFrame, clicks: DataFrame,
      horizon: String = "1 hour", lateness: String = "10 minutes"): DataFrame = {
    val p = purchases.withWatermark("ts", lateness)
      .select(col("event_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", lateness)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("click_value"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizon") &&
        col("c_ts") < col("p_ts"))
  }

  /** Streaming exact dedup with bounded state: drops rows whose key columns
    * were already seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark`). The streaming form of
    * [[graft.dedup.Dedup.exact]]: state holds one entry per key seen in the
    * last `lateness` of event time and is evicted as the watermark passes —
    * the only dedup shape that survives an unbounded stream.
    */
  def streamingDedup(df: DataFrame, keyCols: Seq[String], tsCol: String,
      lateness: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)
}

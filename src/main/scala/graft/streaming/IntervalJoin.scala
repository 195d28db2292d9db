package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (§2.7 extension; streaming twin of the batch
  * [[graft.operators.Temporal.rangeJoinCount]] range join): error events
  * joined to purchases of the same user within the following hour, both
  * sides live streams.
  *
  * Scale/state: Structured Streaming keeps BOTH sides' unmatched rows as
  * join state; the watermarks plus the two-sided time-bound condition
  * (`p_ts ∈ [e_ts, e_ts + 1h)`) let the engine compute exactly when a
  * buffered row can never match again and evict it — state is bounded by
  * (watermark delay + window length) × arrival rate, independent of stream
  * length. Without the time bound the state would grow forever; this is the
  * reason the join condition must carry the interval, not a post-filter.
  */
object IntervalJoin {

  /** Both inputs must have (event_id, user_id, ts) columns. Emits one row
    * per (error, purchase-in-window) match, append mode. */
  def errorPurchases(errors: DataFrame, purchases: DataFrame): DataFrame = {
    val e = errors
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    e.join(p, expr(
      "user_id = p_user AND p_ts >= e_ts AND p_ts < e_ts + INTERVAL 1 HOUR"))
      .select(col("error_id"), col("user_id"), col("purchase_id"))
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-touch purchase attribution: every (purchase, click) pair for the
  * same user with the click inside the purchase's lookback window —
  * the interval-join companion to [[graft.operators.AsofJoin]] (which
  * keeps only the single nearest touch, this keeps them all).
  *
  * - [[batch]]: an equi-join on user_id with the time window as a
  *   post-join range predicate. The shuffle key is user_id on BOTH
  *   sides, so at 100 TB the join never materializes the time cross
  *   product beyond each user's own events; AQE handles skewed users.
  * - [[streaming]]: the same semantics as a Structured Streaming
  *   STREAM-STREAM inner join. Both sides carry event-time watermarks
  *   and the join condition bounds click time against purchase time, so
  *   the state store provably expires rows older than
  *   watermark + window — the canonical bounded-state stream-stream
  *   join (Spark SS programming guide, inner joins with time range).
  *
  * Output (both modes): purchase_id, user_id, purchase_ts,
  * purchase_value, click_id, touch_age (seconds, rounded to 6).
  */
object Attribution {

  /** `events`: the normalized frame (ts = epoch seconds as double) from
    * [[graft.queries.TsQueries.rawEvents]]. */
  def batch(events: DataFrame, windowSeconds: Double): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    purchases.join(clicks, "user_id")
      .filter(col("click_ts") >= col("purchase_ts") - windowSeconds &&
              col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("purchase_value"), col("click_id"),
        round(col("purchase_ts") - col("click_ts"), 6).as("touch_age"))
  }

  /** `clicks` / `purchases`: STREAMING frames with (event_id, user_id,
    * ts, value) where ts is epoch seconds (double). `delayThreshold` is
    * the out-of-orderness bound handed to both watermarks (Spark needs
    * it on both inputs to size the join state). */
  def streaming(clicks: DataFrame, purchases: DataFrame,
                windowSeconds: Long,
                delayThreshold: String = "1 hour"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"),
        timestamp_seconds(col("ts")).as("click_t"))
      .withWatermark("click_t", delayThreshold)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"),
        timestamp_seconds(col("ts")).as("purchase_t"))
      .withWatermark("purchase_t", delayThreshold)
    p.join(c,
        col("user_id") === col("c_user") &&
        col("click_t") >= col("purchase_t") - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col("click_t") <= col("purchase_t"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("purchase_value"), col("click_id"),
        round(col("purchase_ts") - col("click_ts"), 6).as("touch_age"))
  }
}

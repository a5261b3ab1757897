package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM interval join — the canonical two-stream
  * stateful pattern (both sides buffered in Spark-owned join state,
  * evicted once the watermark proves no counterpart can still arrive):
  * every purchase matches the same user's views inside the 24-hour
  * attribution window before it ([p_ts - 24h, p_ts)) — the streaming form
  * of the batch [[graft.queries.EventOps.windowJoin]] range join (whose
  * bucket-equi-join decomposition exists precisely because BATCH has no
  * state machinery; streaming gets the interval condition natively).
  *
  * Semantics contract vs batch: INNER join — a (purchase, view) pair
  * emits exactly once, when both sides have arrived and the range
  * condition holds; purchases with zero prior views emit nothing (the
  * batch operator reports their 0 through its left join). State bound:
  * each side holds rows no older than the watermark horizon plus the
  * 24-hour window — eviction is Spark's, driven by the time-range
  * condition, so state never grows with stream age.
  */
object StreamingJoin {

  /** @param views     streaming frame (event_id, user_id, ts: timestamp)
    * @param purchases streaming frame (event_id, user_id, ts: timestamp)
    * @param horizon   watermark delay bounding out-of-order arrival
    */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame,
                       horizon: String = "30 minutes"): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", horizon)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", horizon)
    v.join(p,
        expr("""v_user = p_user
                AND v_ts >= p_ts - INTERVAL 24 HOURS
                AND v_ts < p_ts"""))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("v_ts")).as("v_us"))
  }
}

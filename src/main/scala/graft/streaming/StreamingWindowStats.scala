package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked TUMBLING-WINDOW aggregation of the event stream — the
  * canonical Structured Streaming pattern (readStream -> watermark ->
  * window -> agg -> append) that complements the custom-state operators
  * (StreamingContour's ring carry, StreamingSessionize): here Spark's own
  * streaming state machinery owns the window state, emits each window
  * once the watermark passes its end, and evicts it — state is bounded by
  * open windows, not stream length.
  *
  * The aggregate columns are the engine's usual order-free integers
  * (count + per-event floor(value * 2^20) sum/min/max), so a closed
  * window's row is bit-comparable with the batch equivalent.
  */
object StreamingWindowStats {

  private val Q20 = 1048576.0

  /** @param events streaming frame with (user_id, ts: timestamp, value)
    * @param windowLen SQL interval string, e.g. "10 minutes"
    * @param horizon   watermark delay bounding disorder
    */
  def windowStats(events: DataFrame, windowLen: String = "10 minutes",
                  horizon: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .select(col("ts"), floor(col("value") * Q20).cast("long").as("qv"))
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(count(lit(1)).as("n_events"), sum("qv").as("qsum"),
        min("qv").as("qmin"), max("qv").as("qmax"))
      .select(unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"), col("qsum"), col("qmin"), col("qmax"))
}

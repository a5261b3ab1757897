package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-batch streaming dedup of a document stream: keep the FIRST
  * arrival of each content fingerprint. Built on
  * `dropDuplicatesWithinWatermark`, so state is bounded — one row per
  * distinct fingerprint inside the watermark horizon, evicted as the
  * watermark passes it. The trade is explicit and mirrors the streaming
  * contour carry's bounded-state contract: a duplicate arriving LATER
  * than the horizon re-emits (its fingerprint's state is gone). At 100 TB
  * the alternative — exact unbounded dedup state — is a batch join
  * against the lake's fingerprint table, not stream state.
  */
object StreamingDedup {

  /** @param docs streaming frame with (doc_id, text, ingest_ts) columns
    * @param horizon watermark delay bounding the dedup state window
    */
  def dedup(docs: DataFrame, horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", md5(col("text")))
      .withWatermark("ingest_ts", horizon)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp") // working column; output keeps the input schema
}

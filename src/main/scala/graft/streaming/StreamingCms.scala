package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming count-min sketch — the 2x64 frequency-cell table as a
  * COMPLETE-mode streaming aggregation: each micro-batch's user ids fold
  * into the same cell counts the batch contract query (q_evt_cms) runs,
  * and Spark's aggregation state IS the sketch.
  *
  * Like the HLL registers (StreamingDistinct), this is a case the
  * watermark machinery cannot serve: "frequency of any user over the
  * whole stream" admits no eviction horizon, but the CMS state is
  * bounded at d x w = 128 longs on an UNBOUNDED stream by construction,
  * every cell is monotone non-decreasing (counts only add), and the
  * final table equals the batch sketch of the whole history bit for bit
  * — counts form a commutative monoid, so partial aggregation across
  * micro-batches is exactly cell addition, the same merge a fleet of
  * per-day sketches would ship to a coordinator.
  *
  * The pipeline is shared VERBATIM with queries.StatsOps.cmsCellTable —
  * one definition of hash/column/count, so batch and stream can never
  * drift (spec-proven equal after every micro-batch, monotone across
  * batches, and recovered through a checkpoint restart).
  */
object StreamingCms {

  /** @param events streaming frame carrying a `user_id` column. */
  def cmsCells(events: DataFrame): DataFrame =
    graft.queries.StatsOps.cmsCellTable(events)
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming distinct-count sketch — the HyperLogLog register table as a
  * COMPLETE-mode streaming aggregation: each micro-batch folds its ids
  * into the same 64-register max/count aggregation the batch contract
  * query (q_evt_hll) runs, and Spark's aggregation state IS the sketch.
  *
  * This is the streaming case a watermark can't serve: exact streaming
  * distinct state grows with the id universe, and eviction loses ids
  * forever — while the HLL state is bounded at m = 64 rows on an
  * UNBOUNDED stream by construction, registers only ever grow (max is
  * monotone), and the final table equals the batch sketch of the whole
  * history bit for bit (spec-proven, including monotone growth across
  * micro-batches and checkpoint recovery through a restart).
  *
  * The pipeline is shared VERBATIM with queries.StatsOps.hllRegisterTable
  * — one definition of hash/bucket/rank, so batch and stream can never
  * drift.
  */
object StreamingDistinct {

  /** @param events streaming frame carrying a `user_id` column. */
  def hllRegisters(events: DataFrame): DataFrame =
    graft.queries.StatsOps.hllRegisterTable(
      events.select(col("user_id").as("uid")))
}

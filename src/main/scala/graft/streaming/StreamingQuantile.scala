package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Streaming EXACT quantile locator — the third complete-mode bounded-
  * sketch operator (with [[StreamingDistinct]] and [[StreamingTopK]]):
  * the quartile + P90 ladder of every value seen so far on an UNBOUNDED
  * stream, as (q, k, bucket, off) rows — the exact 1-based target rank,
  * its integer value bucket, and the within-bucket offset, i.e. the
  * driver-side locate step of the batch two-pass selection
  * ([[graft.queries.StatsOps.autoThresholds]]), kept exact on a stream.
  *
  * Exact streaming quantiles admit no eviction (any evicted value shifts
  * every later rank), yet need no unbounded state either: the bucket
  * HISTOGRAM is a bounded commutative-monoid fold (counts add), so
  * Spark's aggregation buffer IS the entire state — O(value range) by the
  * StatsOps histogram contract (loudly required <= 65536 buckets at merge
  * time, the same bound the batch collect asserts). finish() replays the
  * SAME locate walk the batch operator runs
  * ([[graft.queries.StatsOps.locateLadder]] — one shared definition, so
  * batch and stream can never drift), and the spec proves the per-batch
  * output equals the batch locate of the full history, through a
  * checkpoint restart.
  *
  * The bucket rule is shared too ([[graft.queries.StatsOps.bucketCol]]):
  * NaN pins to the top bucket, |v| >= 2^63 fails loudly.
  */
object StreamingQuantile {

  /** Bounded histogram fold: Long bucket keys in, the located ladder out. */
  final class BucketLadder
      extends Aggregator[Long, Map[Long, Long], Seq[(Double, Long, Long, Long)]] {
    def zero: Map[Long, Long] = Map.empty
    def reduce(b: Map[Long, Long], bkt: Long): Map[Long, Long] =
      b.updated(bkt, b.getOrElse(bkt, 0L) + 1L)
    def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
      val m = b.foldLeft(a) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      require(m.size <= 65536,
        s"streaming value-bucket histogram has ${m.size} buckets — the state " +
          "must stay O(range); widen the bucket size")
      m
    }
    def finish(m: Map[Long, Long]): Seq[(Double, Long, Long, Long)] =
      if (m.isEmpty) Seq.empty
      else graft.queries.StatsOps.locateLadder(m.toArray.sortBy(_._1))
    def bufferEncoder: Encoder[Map[Long, Long]] =
      ExpressionEncoder[Map[Long, Long]]()
    def outputEncoder: Encoder[Seq[(Double, Long, Long, Long)]] =
      ExpressionEncoder[Seq[(Double, Long, Long, Long)]]()
  }

  /** @param events streaming frame carrying a `value` column.
    * @return (q, k, bucket, off) ladder rows (complete mode).
    */
  def quantileLadder(events: DataFrame): DataFrame =
    events
      .agg(udaf(new BucketLadder())
        .apply(graft.queries.StatsOps.bucketCol).as("ladder"))
      .select(explode(col("ladder")).as("r"))
      .select(col("r._1").as("q"), col("r._2").as("k"),
        col("r._3").as("bucket"), col("r._4").as("off"))
}

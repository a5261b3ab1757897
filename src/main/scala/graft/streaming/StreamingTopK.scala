package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Streaming EXACT global top-k — the second complete-mode sketch-state
  * operator (with [[StreamingDistinct]]): the top k (value, event_id)
  * rows seen so far on an UNBOUNDED stream, under the batch contract's
  * total order (value DESC, event_id ASC — q_top_events' tie-break), via
  * a BOUNDED merge-fold aggregation whose state is at most k rows by
  * construction.
  *
  * This is the other aggregation a watermark can't serve: "top k ever"
  * admits no eviction (any evicted row might re-enter the answer), yet
  * needs no unbounded state either — top-k is a bounded SEMILATTICE
  * (merge of two top-k lists is a top-k list), so Spark's aggregation
  * buffer IS the entire state, exactly like the HLL registers. Each
  * micro-batch folds its rows in (the reduce side ignores rows that
  * cannot rank — O(1) per dominated row); complete mode re-emits the
  * merged list with ranks. The result equals batch
  * [[graft.queries.StatsOps.topEvents]] on the same history row for row
  * (spec-proven after every micro-batch, plus checkpoint-restart
  * recovery); monotonicity (the k-th value never decreases) is asserted
  * across batches.
  */
object StreamingTopK {

  /** Bounded top-k list fold over (value, event_id), ordered value DESC
    * then event_id ASC. State and output are the same ≤ k-row list.
    */
  final class TopKRows(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    def zero: Seq[(Double, Long)] = Vector.empty
    def reduce(b: Seq[(Double, Long)], n: (Double, Long)): Seq[(Double, Long)] = {
      if (b.length >= k && !beats(n, b.last)) return b
      val i = b.indexWhere(e => beats(n, e)) match { case -1 => b.length; case x => x }
      (b.take(i) :+ n) ++ b.drop(i).take(k - i - 1)
    }
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      val out = Vector.newBuilder[(Double, Long)]
      var i = 0; var j = 0
      while (i + j < k && (i < a.length || j < b.length)) {
        if (j >= b.length || (i < a.length && beats(a(i), b(j)))) { out += a(i); i += 1 }
        else { out += b(j); j += 1 }
      }
      out.result()
    }
    def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** @param events streaming frame carrying `event_id` and `value`.
    * @return (rank, event_id, value) — the q_top_events output shape.
    */
  def topEvents(events: DataFrame, k: Int = graft.queries.StatsOps.TopK): DataFrame =
    events
      .agg(udaf(new TopKRows(k)).apply(col("value"), col("event_id")).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("event_id"), col("col._1").as("value"))
}

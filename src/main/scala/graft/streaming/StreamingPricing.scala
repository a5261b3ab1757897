package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming fixed-point PRICING rollup — the relational family's
  * streaming face: the q_rel_pricing cents-quantized sums per
  * (returnflag, linestatus) as a COMPLETE-mode keyed aggregation over an
  * unbounded lineitem stream. State is Spark-owned and bounded by the
  * (flag x status) key registry (6 groups); every sum is an integer fold
  * of per-row quantized values, so the running table equals the batch
  * rollup of the full history bit for bit after every micro-batch
  * (spec-proven, with checkpoint-restart recovery). No watermark — the
  * rollup is a monoid over all history, the StreamingDistinct posture.
  *
  * (The batch contract query additionally applies the 90-day shipdate
  * cutoff — a RETROSPECTIVE filter that has no streaming meaning; the
  * streaming table is the unfiltered running rollup, and the spec
  * compares against the same unfiltered batch aggregation.)
  */
object StreamingPricing {

  /** @param lineitem streaming frame with the lineitem money columns. */
  def pricingTotals(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_returnflag"), col("l_linestatus"),
        floor(col("l_quantity") * 100.0).cast("long").as("qqty"),
        floor(col("l_extendedprice") * 100.0).cast("long").as("qprice"),
        floor(col("l_discount") * 100.0).cast("long").as("qdisc"),
        floor(col("l_tax") * 100.0).cast("long").as("qtax"))
      .select(col("l_returnflag"), col("l_linestatus"), col("qqty"), col("qprice"),
        (col("qprice") * (lit(100L) - col("qdisc"))).as("qdp"),
        (col("qprice") * (lit(100L) - col("qdisc")) * (lit(100L) + col("qtax")))
          .cast("decimal(38,0)").as("qch"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qqty")).as("sum_qty"),
        sum(col("qprice")).as("sum_price"),
        sum(col("qdp")).as("sum_disc_price"),
        sum(col("qch")).cast("long").as("sum_charge"))
}

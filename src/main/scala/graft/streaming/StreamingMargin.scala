package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming STREAM-STATIC enrichment + rollup — the eleventh streaming
  * operator and the pattern a live warehouse feed runs: an unbounded
  * lineitem stream is enriched per micro-batch against the STATIC part
  * dimension (broadcast hash join — no stream-side state, no watermark;
  * the dimension is registry-bounded) and folded into the complete-mode
  * per-part-type margin rollup, sharing RelOps.partMargin's exact
  * fixed-point contract: qrev = price_cents * (100 - disc_cents), qcost =
  * retail_cents * qty_cents — one consistent x10000 scale, so margin is an
  * integer fold and the running table equals the batch rollup of the full
  * history bit for bit after every micro-batch (spec-proven, with
  * checkpoint-restart recovery).
  *
  * State shape at 100 TB: Spark owns only the (p_type) keyed sums — the
  * 6-row part-type registry — regardless of stream length; the broadcast
  * rebuilds per batch from the static snapshot, which is the documented
  * semantic (a slowly-changing dimension wants the lake's snapshot reads
  * instead).
  */
object StreamingMargin {

  /** @param lineitem streaming frame with partkey + money columns.
    * @param part     STATIC part dimension (p_partkey, p_type,
    *                 p_retailprice).
    */
  def marginTotals(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .select(col("l_partkey"),
        (floor(col("l_extendedprice") * 100.0).cast("long")
          * (lit(100L) - floor(col("l_discount") * 100.0).cast("long"))).as("qrev"),
        floor(col("l_quantity") * 100.0).cast("long").as("qqty"))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"),
        floor(col("p_retailprice") * 100.0).cast("long").as("qretail"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_type"), col("qrev"), (col("qretail") * col("qqty")).as("qcost"))
      .groupBy("p_type")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qrev").cast("decimal(38,0)")).cast("long").as("revenue"),
        sum((col("qrev") - col("qcost")).cast("decimal(38,0)")).cast("long").as("margin"))
}

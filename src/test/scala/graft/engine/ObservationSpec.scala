package graft.engine

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Query-level pipeline METRICS via Spark's Observation API — the
  * in-flight half of the metrics story (Lake manifests carry the at-rest
  * per-partition row counts): an `observe` node accumulates named
  * aggregates ON the running job's rows, costing one pass of codegen'd
  * accumulators instead of a second scan-and-count job. The contract: the
  * observed metrics equal the same aggregates computed by a separate
  * query, and observation never changes the result rows.
  */
class ObservationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("observed in-flight metrics == recomputed aggregates; rows unchanged") {
    import org.apache.spark.sql.functions._
    val obs = new org.apache.spark.sql.Observation("pricing_metrics")
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"),
        floor(col("l_quantity") * 100.0).cast("long").as("qqty"))
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("qqty")).as("qty_mass"),
        // DISTINCT aggregates are rejected by CollectMetrics (analysis
        // error) — conditional counts are the supported cardinality probe
        sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("n_flag_a"))
    val grouped = base.groupBy("l_returnflag").agg(sum("qqty").as("qsum"))
    val rows = grouped.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)

    val m = obs.get
    val src = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("count(*)", "sum(floor(l_quantity * 100))",
        "sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)").head
    assert(m("n_rows") == src.getLong(0), "observed row count drifted")
    assert(m("qty_mass") == src.getLong(1), "observed quantity mass drifted")
    assert(m("n_flag_a") == src.getLong(2), "observed flag-A count drifted")
    assert(rows.map(_._2).sum == src.getLong(1),
      "observation must not perturb the result rows")
    assert(rows.length == 3)
  }
}

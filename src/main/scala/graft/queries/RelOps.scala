package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-shaped warehouse tables (lineitem /
  * orders / customer / supplier / nation) — the classic star-schema query
  * patterns a user of a general engine runs alongside the raster and
  * training families: filtered rollups, multi-hop dimension joins,
  * registry-bounded top-k, and EXISTS-style semi-joins.
  *
  * Money math is INTEGER-EXACT end to end: every price/discount/tax
  * quantizes PER ROW (floor(x * 100) — cents; both engine and oracle run
  * the identical f64 product before the floor, the repo's established
  * quantization contract), and all downstream sums/products are integer,
  * so no float-accumulation order ever crosses the engine/oracle compare:
  * disc_price = qprice * (100 - qdisc), charge = disc_price * (100 + qtax)
  * — the Q1 expressions in fixed-point.
  *
  * Scale shape: the fact table (lineitem) is never shuffled except by its
  * aggregation keys (map-side combinable); dimension joins are
  * key-equality joins whose build sides are registry-bounded (nation 25,
  * supplier 100, customer per-key) — Catalyst broadcasts them at contract
  * scale and the same plans degrade to shuffle equi-joins at warehouse
  * scale; the top-k rank window rides the supplier-registry-bounded
  * constant-key idiom; the semi-join never multiplies rows.
  */
object RelOps {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** floor(x * 100) — fixed-point cents, shared with the oracles. */
  private def q100(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100.0).cast("long")

  /** TPC-H Q1-shaped pricing summary: per (returnflag, linestatus) over
    * lines shipped at least 90 days before the newest shipment —
    * count, quantity, price, discounted price and charge sums, all
    * fixed-point. The shipdate cutoff derives in pure epoch integer
    * arithmetic from a max() scalar (one map-side-combinable pre-pass),
    * and the filter sits directly on the scan.
    */
  val pricing: (SparkSession, String) => DataFrame = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
      .withColumn("us", unix_micros(col("l_shipdate").cast("timestamp")))
    val cut = li.select(max(col("us")).as("mx")).select((col("mx") - 90L * 86400000000L).as("cut"))
    li.crossJoin(broadcast(cut))
      .filter(col("us") <= col("cut"))
      .select(col("l_returnflag"), col("l_linestatus"),
        q100(col("l_quantity")).as("qqty"),
        q100(col("l_extendedprice")).as("qprice"),
        q100(col("l_discount")).as("qdisc"),
        q100(col("l_tax")).as("qtax"))
      .select(col("l_returnflag"), col("l_linestatus"), col("qqty"), col("qprice"),
        (col("qprice") * (lit(100L) - col("qdisc"))).as("qdp"),
        (col("qprice") * (lit(100L) - col("qdisc")) * (lit(100L) + col("qtax"))).as("qch"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qqty")).as("sum_qty"),
        sum(col("qprice")).as("sum_price"),
        sum(col("qdp")).as("sum_disc_price"),
        sum(col("qch").cast("decimal(38,0)")).cast("long").as("sum_charge"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q5-shaped revenue rollup: lineitem -> orders -> customer -> nation,
    * fixed-point revenue sum(qprice * (100 - qdisc)) per nation name.
    * Three key-equality joins; nation (25 rows) explicitly broadcast,
    * the others Catalyst-sized.
    */
  val revenueNation: (SparkSession, String) => DataFrame = (spark, dir) => {
    val rev = t(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
    rev.join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qrev").cast("decimal(38,0)")).cast("long").as("revenue"))
      .orderBy("n_name")
  }

  /** Top-10 suppliers by fixed-point revenue — the rank window rides the
    * supplier-REGISTRY-bounded table (the fact table only ever crosses
    * its map-side-combined suppkey aggregation), tie-break
    * (revenue DESC, suppkey ASC).
    */
  val topSuppliers: (SparkSession, String) => DataFrame = (spark, dir) => {
    val rev = t(spark, dir, "lineitem")
      .select(col("l_suppkey"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
      .groupBy("l_suppkey")
      .agg(sum(col("qrev").cast("decimal(38,0)")).cast("long").as("revenue"))
    val one = pmod(col("l_suppkey"), lit(1L)) // constant: supplier registry is bounded
    val w = Window.partitionBy(one).orderBy(col("revenue").desc, col("l_suppkey").asc)
    rev.join(broadcast(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("rank"), col("s_name"), col("revenue"))
      .orderBy("rank")
  }

  /** Q4-shaped priority audit: per order priority, how many orders have
    * at least one line shipped AFTER the order date (a late shipment) —
    * an EXISTS semi-join that never multiplies rows — plus the x1000
    * late fraction.
    */
  val priority: (SparkSession, String) => DataFrame = (spark, dir) => {
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
    val late = o.join(
      t(spark, dir, "lineitem").select(col("l_orderkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("lus")),
      col("o_orderkey") === col("l_orderkey") && col("lus") > col("ous"),
      "left_semi")
      .select(col("o_orderkey").as("k")).withColumn("late", lit(1L))
    o.join(late, col("o_orderkey") === col("k"), "left")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(coalesce(col("late"), lit(0L))).as("n_late"))
      .select(col("o_orderpriority"), col("n_orders"), col("n_late"),
        expr("(n_late * 1000) div n_orders").as("late_x1000"))
      .orderBy("o_orderpriority")
  }

  val oracleSql: Map[String, String] = Map(
    "q_rel_pricing" ->
      """WITH li AS (SELECT l_returnflag, l_linestatus, epoch_us(l_shipdate) AS us,
        |             floor(l_quantity * 100)::BIGINT AS qqty,
        |             floor(l_extendedprice * 100)::BIGINT AS qprice,
        |             floor(l_discount * 100)::BIGINT AS qdisc,
        |             floor(l_tax * 100)::BIGINT AS qtax
        |           FROM lineitem),
        |c AS (SELECT max(us) - 90 * 86400000000 AS cut FROM li)
        |SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n_lines,
        |  sum(qqty)::BIGINT AS sum_qty, sum(qprice)::BIGINT AS sum_price,
        |  sum(qprice * (100 - qdisc))::BIGINT AS sum_disc_price,
        |  sum(qprice * (100 - qdisc) * (100 + qtax))::BIGINT AS sum_charge
        |FROM li CROSS JOIN c WHERE us <= cut
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_rel_revenue_nation" ->
      """SELECT n_name, count(*)::BIGINT AS n_lines,
        |  sum(floor(l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l_discount * 100)::BIGINT))::BIGINT AS revenue
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_top_suppliers" ->
      """WITH rev AS (SELECT l_suppkey,
        |        sum(floor(l_extendedprice * 100)::BIGINT
        |            * (100 - floor(l_discount * 100)::BIGINT))::BIGINT AS revenue
        |      FROM lineitem GROUP BY 1),
        |r AS (SELECT s_name, revenue,
        |        row_number() OVER (ORDER BY revenue DESC, l_suppkey)::BIGINT AS rank
        |      FROM rev JOIN supplier ON s_suppkey = l_suppkey)
        |SELECT rank, s_name, revenue FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "q_rel_priority" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority, epoch_us(o_orderdate) AS ous FROM orders),
        |l AS (SELECT DISTINCT o_orderkey
        |      FROM o JOIN lineitem ON l_orderkey = o_orderkey
        |      WHERE epoch_us(l_shipdate) > ous)
        |SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
        |  sum(CASE WHEN l.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_late,
        |  ((sum(CASE WHEN l.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) * 1000)
        |    // count(*))::BIGINT AS late_x1000
        |FROM o LEFT JOIN l USING (o_orderkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}

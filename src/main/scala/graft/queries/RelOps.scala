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
    // deliberately a RAW scan, not a shared decode: the relational family
    // filters the fact table per query, so the pruned/pushed parquet scan
    // is the right shape at every size (a materialized full-width feed
    // was tried in r06 — it shifted ~1 s of build onto the first consumer
    // for ~0.1 s per later query, and forfeits pushdown at scale)
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

  /** Weekly revenue trend per REGION — the time-bucketed rollup with the
    * whole dimension chain (lineitem -> orders -> customer -> nation ->
    * region): week = epoch-days div 7 (pure integer bucketing, no
    * calendar function on the compare path), fixed-point revenue. The
    * nation->region hop is a 25-row broadcast; output is
    * O(weeks x regions).
    */
  val weeklyTrend: (SparkSession, String) => DataFrame = (spark, dir) => {
    val rev = t(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("unix_micros(cast(l_shipdate as timestamp)) div 604800000000").as("week"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
    rev.join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation").select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region").select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("week", "r_name")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qrev").cast("decimal(38,0)")).cast("long").as("revenue"))
      .orderBy("week", "r_name")
  }

  /** Per-part-type MARGIN census — the lineitem -> part join (the part
    * dimension is key-equality; Catalyst broadcasts it at contract scale):
    * margin = revenue - retail cost in the SAME x10000 fixed-point scale
    * (qrev = price_cents * (100 - disc_cents); qcost = retail_cents *
    * qty_x100 — both cents x100, so the subtraction is scale-consistent
    * and exact).
    */
  val partMargin: (SparkSession, String) => DataFrame = (spark, dir) => {
    t(spark, dir, "lineitem")
      .select(col("l_partkey"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"),
        q100(col("l_quantity")).as("qqty"))
      .join(t(spark, dir, "part").select(col("p_partkey"), col("p_type"),
        q100(col("p_retailprice")).as("qretail")), col("l_partkey") === col("p_partkey"))
      .select(col("p_type"), col("qrev"),
        (col("qretail") * col("qqty")).as("qcost"))
      .groupBy("p_type")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qrev").cast("decimal(38,0)")).cast("long").as("revenue"),
        sum((col("qrev") - col("qcost")).cast("decimal(38,0)")).cast("long").as("margin"))
      .orderBy("p_type")
  }

  /** Q5-shaped LOCAL revenue — the dual-dimension-chain topology the
    * family lacks elsewhere: the fact row joins its supplier (l_suppkey)
    * AND its customer's nation chain, and only rows whose two chains land
    * in the SAME nation survive (c_nationkey = s_nationkey — a
    * cross-dimension equality, not a join key). Supplier (registry) and
    * nation are explicit broadcasts; the orders/customer hops are
    * key-equality joins that degrade to shuffle equi-joins at warehouse
    * scale.
    */
  val localRevenue: (SparkSession, String) => DataFrame = (spark, dir) => {
    val rev = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
    rev.join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qrev").cast("decimal(38,0)")).cast("long").as("revenue"))
      .orderBy("n_name")
  }

  /** Q13-shaped customer order-count distribution over the trailing
    * 365-day window (cutoff = max orderdate - 365d, pure epoch integer
    * arithmetic) — the LEFT-OUTER histogram: customers with NO recent
    * orders land in the n_orders = 0 bucket instead of vanishing. Two
    * map-side-combinable aggregations (custkey, then the count-class
    * registry); nothing wider than the recent-orders projection ever
    * shuffles.
    */
  val custDist: (SparkSession, String) => DataFrame = (spark, dir) => {
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
    val cut = o.select((max(col("ous")) - 365L * 86400000000L).as("cut"))
    val recent = o.crossJoin(broadcast(cut)).filter(col("ous") > col("cut"))
      .select(col("o_custkey"))
    t(spark, dir, "customer").select(col("c_custkey"))
      .join(recent, col("o_custkey") === col("c_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_custkey")).as("n_orders"))
      .groupBy("n_orders")
      .agg(count(lit(1)).as("n_custs"))
      .orderBy("n_orders")
  }

  /** Q14-shaped PROMO revenue share per 365-day epoch bucket (yr365 =
    * epoch-micros div 365d — a fixed-width bucket, deliberately NOT a
    * calendar year, keeping calendar functions off the compare path):
    * conditional aggregation (CASE-sum) + the x1000 integer share,
    * decimal(38,0) accumulation so the div matches DuckDB's HUGEINT //.
    * The part dimension is a broadcast; the fact table crosses only its
    * yr365 aggregation.
    */
  val promoShare: (SparkSession, String) => DataFrame = (spark, dir) => {
    t(spark, dir, "lineitem")
      .select(col("l_partkey"),
        expr("unix_micros(cast(l_shipdate as timestamp)) div 31536000000000").as("yr365"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
      .join(broadcast(t(spark, dir, "part").select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("yr365")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("p_type") === "PROMO", col("qrev")).otherwise(lit(0L))
          .cast("decimal(38,0)")).as("dpromo"),
        sum(col("qrev").cast("decimal(38,0)")).as("dtotal"))
      .select(col("yr365"), col("n_lines"),
        col("dpromo").cast("long").as("promo_rev"),
        col("dtotal").cast("long").as("total_rev"),
        expr("(dpromo * 1000) div dtotal").as("promo_x1000"))
      .orderBy("yr365")
  }

  /** Q22-shaped dormant-balance audit: customers whose fixed-point
    * balance exceeds the positive-balance MEAN (threshold = cents-sum div
    * count — one scalar pre-pass, integer division both sides) and who
    * placed NO order in the trailing 180 days — the ANTI-join topology
    * (priority covers EXISTS; this is NOT EXISTS). Per-segment customer
    * count and balance sum.
    */
  val balanceAudit: (SparkSession, String) => DataFrame = (spark, dir) => {
    val c = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), q100(col("c_acctbal")).as("qbal"))
    val thr = c.filter(col("qbal") > 0L)
      .agg(sum(col("qbal").cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
      .select(expr("s div n").as("thr"))
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
    val cut = o.select((max(col("ous")) - 180L * 86400000000L).as("cut"))
    val recent = o.crossJoin(broadcast(cut)).filter(col("ous") > col("cut"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(thr))
      .filter(col("qbal") > col("thr"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_custs"),
        sum(col("qbal").cast("decimal(38,0)")).cast("long").as("bal_sum"))
      .orderBy("c_mktsegment")
  }

  /** Hierarchical ROLLUP revenue — the grouping-sets face: per (region,
    * nation) detail rows PLUS per-region subtotals PLUS the grand total in
    * one pass (Spark's Expand feeds one aggregation; no re-scan per
    * level). Rolled-up keys surface as the 'ALL' sentinel (the dimension
    * names never collide with it), keeping NULL-ordering quirks off the
    * compare path.
    */
  val revenueRollup: (SparkSession, String) => DataFrame = (spark, dir) => {
    val rev = t(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
    rev.join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region").select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qrev").cast("decimal(38,0)")).cast("long").as("revenue"))
      .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        col("n_lines"), col("revenue"))
      .orderBy("r_name", "n_name")
  }

  /** Per-customer RUNNING revenue — the ordered analytic window over the
    * orders fact: cumulative cents total per customer in deterministic
    * (orderdate, orderkey) order (orderkey breaks date ties, so the
    * prefix is a total order and every running value is exact). The
    * window partitions by custkey — keyed state, shuffle-bounded by the
    * customer registry, no global sort.
    */
  val runningRevenue: (SparkSession, String) => DataFrame = (spark, dir) => {
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ous"),
        q100(col("o_totalprice")).as("qtotal"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("ous"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"),
        sum(col("qtotal").cast("decimal(38,0)")).over(w).cast("long").as("run_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q18-shaped BIG-ORDER report — HAVING semantics over the aggregated
    * fact (per-order quantity sum > 200.00 units in cents) joined BACK to
    * its dimensions: the aggregate-then-filter-then-rejoin topology. The
    * fact crosses only its orderkey aggregation; the survivor set is a
    * small fraction (~6%) that then joins orders/customer by key.
    */
  val bigOrders: (SparkSession, String) => DataFrame = (spark, dir) => {
    val qty = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), q100(col("l_quantity")).as("qqty"))
      .groupBy("l_orderkey")
      .agg(sum(col("qqty")).as("sum_qty"))
      .filter(col("sum_qty") > 20000L)
    qty.join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        q100(col("o_totalprice")).as("qtotal")), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("qtotal"), col("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** Q7-shaped bilateral TRADE matrix: revenue by (supplier nation,
    * customer nation) — BOTH dimension chains resolved per fact row (the
    * supplier hop directly, the customer hop through orders), two aliased
    * broadcasts of the same 25-row nation registry. Output is the
    * O(nations^2) flow matrix; the diagonal is localRevenue's domain, the
    * off-diagonal is cross-border flow.
    */
  val tradeMatrix: (SparkSession, String) => DataFrame = (spark, dir) => {
    val rev = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
    rev.join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "nation")
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .join(broadcast(t(spark, dir, "nation")
          .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk"))
      .groupBy("supp_nation", "cust_nation")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qrev").cast("decimal(38,0)")).cast("long").as("revenue"))
      .orderBy("supp_nation", "cust_nation")
  }

  /** Per-nation TOP customer by lifetime order value — the per-group
    * ARGMAX face: the orders fact crosses only its custkey aggregation
    * (map-side combinable), the rank window rides the customer-registry
    * table partitioned by nationkey, tie-break (total DESC, custkey ASC)
    * is a total order so the winner is deterministic.
    */
  val topCustomerPerNation: (SparkSession, String) => DataFrame = (spark, dir) => {
    val totals = t(spark, dir, "orders")
      .select(col("o_custkey"), q100(col("o_totalprice")).as("qtotal"))
      .groupBy("o_custkey")
      .agg(sum(col("qtotal").cast("decimal(38,0)")).cast("long").as("total"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("total").desc, col("c_custkey").asc)
    totals.join(t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"), col("total"))
      .orderBy("n_name")
  }

  /** Orders-vs-shipments RECONCILIATION — the FULL OUTER face: per
    * epoch-day, how many orders were placed and how many lines shipped,
    * with one-sided days surfacing as zeros instead of vanishing (order
    * books open before shipping starts and shipping outlives the last
    * order, so BOTH one-sided regions exist by construction). Each side
    * pre-aggregates to day granularity first, so the outer join touches
    * O(days), never the facts.
    */
  val reconcile: (SparkSession, String) => DataFrame = (spark, dir) => {
    val o = t(spark, dir, "orders")
      .select(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("oday"))
      .groupBy("oday").agg(count(lit(1)).as("n_orders"))
    val l = t(spark, dir, "lineitem")
      .select(expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000").as("lday"))
      .groupBy("lday").agg(count(lit(1)).as("n_shipped"))
    o.join(l, col("oday") === col("lday"), "full_outer")
      .select(coalesce(col("oday"), col("lday")).as("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
      .orderBy("day")
  }

  /** Revenue PIVOT — nation rows x return-flag columns through Spark's
    * pivot API (explicit value list, so the schema is static and no
    * distinct-values pre-pass runs — the required form at scale: an
    * unlisted pivot is a driver-side distinct over the fact table).
    * Absent cells coalesce to 0, matching the oracle's CASE-sum (which
    * sums an empty set of 0 contributions, not NULL).
    */
  val revenuePivot: (SparkSession, String) => DataFrame = (spark, dir) => {
    val base = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
      .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
    base.groupBy("n_name")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("qrev").cast("decimal(38,0)")))
      .select(col("n_name"),
        coalesce(col("A").cast("long"), lit(0L)).as("rev_a"),
        coalesce(col("N").cast("long"), lit(0L)).as("rev_n"),
        coalesce(col("R").cast("long"), lit(0L)).as("rev_r"))
      .orderBy("n_name")
  }

  /** ZONE-MAP DATA SKIPPING end to end: lineitem committed into a
    * throwaway lake table range-clustered by l_orderkey (8 files with
    * disjoint key ranges), then read back through [[graft.lake.Lake
    * .readSkipping]] under `l_orderkey BETWEEN 100 AND 799` — the
    * manifest's per-file min/max zone maps let the scan OPEN only the
    * files whose range overlaps the predicate (require-asserted: at
    * least one file pruned, so the manifest stats are provably live),
    * then the standard fixed-point rollup. The oracle sees only the
    * final algebra: the skipping layer must be invisible in the result
    * while the I/O scales with the selected key range, not the table.
    */
  def lakeSkip(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), q100(col("l_quantity")).as("qqty"))
    val table = java.nio.file.Files.createTempDirectory("graft-lake-skip").toString
    graft.lake.Lake.commit(spark, table, li.repartitionByRange(8, col("l_orderkey")), "load")
    val scan = graft.lake.Lake.readSkipping(spark, table, 0L, "l_orderkey", 100L, 799L)
    require(scan.keptFiles.size < scan.totalFiles,
      s"zone-map skipping pruned nothing (${scan.keptFiles.size} of ${scan.totalFiles} files kept)")
    scan.df.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qqty").cast("decimal(38,0)")).cast("long").as("sum_qqty"),
        sum(col("l_orderkey").cast("decimal(38,0)")).cast("long").as("sum_okey"))
      .orderBy("l_returnflag")
  }

  /** COPY-ON-WRITE MERGE end to end: lineitem committed range-clustered,
    * then upserted through [[graft.lake.Lake.merge]] with every line of
    * orderkeys 100..799 re-priced (+7 cents of quantity) — the merge
    * decodes and rewrites ONLY the files whose zone map overlaps the
    * source's key range (require-asserted: at least one file carried
    * forward byte-for-byte), and the post-merge snapshot is rolled up
    * whole. The oracle replays the upsert as a CASE expression over the
    * raw table: the merged lake must be indistinguishable from it.
    */
  def lakeMerge(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), q100(col("l_quantity")).as("qqty"))
    val table = java.nio.file.Files.createTempDirectory("graft-lake-merge").toString
    graft.lake.Lake.commit(spark, table, li.repartitionByRange(8, col("l_orderkey")), "load")
    val source = li.where(col("l_orderkey").between(100L, 799L))
      .withColumn("qqty", col("qqty") + lit(7L))
    val res = graft.lake.Lake.merge(spark, table, source, "l_orderkey")
    require(res.carriedFiles >= 1,
      s"merge rewrote everything (${res.rewroteFiles} rewritten, ${res.carriedFiles} carried)")
    graft.lake.Lake.readAt(spark, table, 1L)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qqty").cast("decimal(38,0)")).cast("long").as("sum_qqty"))
      .orderBy("l_returnflag")
  }

  /** TPC-H Q17-shaped small-quantity audit: revenue carried by lines
    * whose quantity is under 20% of their part's average — the
    * correlated-scalar-subquery face, DECORRELATED into a per-part
    * aggregate self-join (the plan a 100 TB fact demands: one shuffle of
    * lineitem by l_partkey for the map-side-combinable aggregate, one
    * for the join — never a per-row subquery). The fractional-average
    * predicate is INTEGER-EXACT: qqty < 0.2 * (sum/n) over positives
    * ⟺ 5 * qqty * n < sum — no float division on either side.
    */
  val smallQty: (SparkSession, String) => DataFrame = (spark, dir) => {
    val li = t(spark, dir, "lineitem").select(col("l_partkey"), col("l_returnflag"),
      q100(col("l_quantity")).as("qqty"), q100(col("l_extendedprice")).as("qprice"))
    val p = li.groupBy("l_partkey").agg(count(lit(1)).as("n"),
      sum(col("qqty").cast("decimal(38,0)")).cast("long").as("sq"))
    li.join(p, "l_partkey")
      .where(col("qqty") * lit(5L) * col("n") < col("sq"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_small"),
        sum(col("qprice").cast("decimal(38,0)")).cast("long").as("sum_price"))
      .orderBy("l_returnflag")
  }

  /** Full CUBE over (returnflag, linestatus): all four grouping sets —
    * the pair cells, both one-dimension margins, and the grand total —
    * in ONE pass of the fact table (Spark expands grouping sets before
    * the map-side combine, so lineitem is still read and shuffled once).
    * Grouping NULLs land as the 'ALL' sentinel via coalesce on both the
    * engine and oracle sides (the repo's rollup idiom; flags are
    * non-null in the data, so the sentinel is unambiguous).
    */
  val cubeRevenue: (SparkSession, String) => DataFrame = (spark, dir) => {
    val li = t(spark, dir, "lineitem").select(
      col("l_returnflag").as("flag"), col("l_linestatus").as("status"),
      (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
    li.cube(col("flag"), col("status"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qrev").cast("decimal(38,0)")).cast("long").as("revenue"))
      .select(coalesce(col("flag"), lit("ALL")).as("flag"),
        coalesce(col("status"), lit("ALL")).as("status"),
        col("n_lines"), col("revenue"))
      .orderBy("flag", "status")
  }

  /** Explicit GROUPING SETS — the third grouping-analytics shape beside
    * [[cubeRevenue]] (all subsets) and the rollup query (prefix chain):
    * the set list ((flag, status), (status), ()) is NEITHER a cube (no
    * (flag) set) nor a rollup of (flag, status) (whose chain would keep
    * (flag), not (status)) — precisely the case the explicit API exists
    * for. One Expand pass over the fact scan, subtotal rows relabeled
    * through the same ALL sentinel as the cube (legal because the
    * grouping columns are never NULL in the data), fixed-point cents
    * through decimal(38,0).
    */
  val gsetsRevenue: (SparkSession, String) => DataFrame = (spark, dir) => {
    val li = t(spark, dir, "lineitem").select(
      col("l_returnflag").as("flag"), col("l_linestatus").as("status"),
      (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
    li.groupingSets(
        Seq(Seq(col("flag"), col("status")), Seq(col("status")), Seq.empty),
        col("flag"), col("status"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qrev").cast("decimal(38,0)")).cast("long").as("revenue"))
      .select(coalesce(col("flag"), lit("ALL")).as("flag"),
        coalesce(col("status"), lit("ALL")).as("status"),
        col("n_lines"), col("revenue"))
      .orderBy("flag", "status")
  }

  /** COPY-ON-WRITE DELETE end to end: lineitem committed range-clustered,
    * orderkeys 100..799 deleted through [[graft.lake.Lake.deleteRange]]
    * (zone maps confine the rewrite to the overlapping files —
    * require-asserted that at least one file carried), then the
    * post-delete snapshot rolled up whole. The oracle replays the delete
    * as a NOT BETWEEN over raw lineitem.
    */
  def lakeDelete(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), q100(col("l_quantity")).as("qqty"))
    val table = java.nio.file.Files.createTempDirectory("graft-lake-del").toString
    graft.lake.Lake.commit(spark, table, li.repartitionByRange(8, col("l_orderkey")), "load")
    val res = graft.lake.Lake.deleteRange(spark, table, "l_orderkey", 100L, 799L)
      .getOrElse(throw new IllegalStateException("delete touched nothing"))
    require(res.carriedFiles >= 1,
      s"delete rewrote everything (${res.rewroteFiles} rewritten, ${res.carriedFiles} carried)")
    graft.lake.Lake.readAt(spark, table, 1L)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qqty").cast("decimal(38,0)")).cast("long").as("sum_qqty"))
      .orderBy("l_returnflag")
  }

  /** METADATA-ONLY AGGREGATES end to end: count answered by the
    * manifest's footer metric, min/max by the merged zone maps — the
    * whole query opens ZERO data files after the initial commit, the
    * O(1)-I/O answer a 100 TB table gives to `count/min/max`. The
    * oracle computes the same three aggregates by scanning raw lineitem.
    */
  def lakeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val table = java.nio.file.Files.createTempDirectory("graft-lake-stats").toString
    graft.lake.Lake.commit(spark, table, li.repartitionByRange(8, col("l_orderkey")), "load")
    val rows = graft.lake.Lake.rowsAt(spark, table, 0L)
    val (okLo, okHi) = graft.lake.Lake.minMaxAt(spark, table, 0L, "l_orderkey")
      .getOrElse(throw new IllegalStateException("l_orderkey zone maps missing"))
    val (skLo, skHi) = graft.lake.Lake.minMaxAt(spark, table, 0L, "l_suppkey")
      .getOrElse(throw new IllegalStateException("l_suppkey zone maps missing"))
    Seq((rows, okLo, okHi, skLo, skHi))
      .toDF("n_rows", "min_okey", "max_okey", "min_skey", "max_skey")
  }

  /** 7-day TRAILING revenue — the value-based RANGE window frame (every
    * prior window face in the repo is row- or rank-based): per ship day,
    * the revenue of that day plus the six CALENDAR days before it,
    * which differs from ROWS 6 PRECEDING exactly where days are absent
    * (gaps shrink the row frame but not the range frame — the spec
    * asserts such a gap exists). Shape at scale: the fact table reduces
    * to a per-day rollup first (map-side combinable, day domain is
    * years-bounded), so the window runs over a registry-sized frame via
    * the constant-partition idiom; sums ride decimal(38,0) across the
    * frame like every other fixed-point fold.
    */
  val trailingRevenue: (SparkSession, String) => DataFrame = (spark, dir) => {
    val byDay = t(spark, dir, "lineitem")
      .select(expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000").as("day"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
      .groupBy("day")
      .agg(sum(col("qrev").cast("decimal(38,0)")).cast("long").as("rev"))
    val w = Window.partitionBy(pmod(col("day"), lit(1L)))
      .orderBy(col("day")).rangeBetween(-6L, 0L)
    byDay.select(col("day"), col("rev"),
      sum(col("rev").cast("decimal(38,0)")).over(w).cast("long").as("rev_7d"))
      .orderBy("day")
  }

  /** Q21-shaped WAITING-SUPPLIER audit — the double-correlated
    * (EXISTS + NOT EXISTS) self-join topology, the one join shape the
    * family lacked: per supplier, the count of orders where THAT
    * supplier shipped late (more than 60 days after the order date,
    * pure epoch-integer arithmetic) while at least one OTHER supplier
    * participated in the order (the EXISTS) and NO other supplier was
    * also late (the NOT EXISTS — sole blame). Decorrelated the
    * scale-safe way: both correlated subqueries collapse into ONE
    * per-order aggregate (distinct participating suppliers, distinct
    * late suppliers — each bounded by lines-per-order, never rows),
    * so the fact table shuffles once on its natural orderkey and the
    * late candidates re-join the order-sized summary; the supplier
    * name resolves through the registry-bounded broadcast. The oracle
    * keeps the textbook correlated EXISTS/NOT EXISTS formulation —
    * genuinely independent plans for the same semantics.
    */
  val waitingSuppliers: (SparkSession, String) => DataFrame = (spark, dir) => {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
      .join(t(spark, dir, "orders")
          .select(col("o_orderkey"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("ord_us")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("ship_us") > col("ord_us") + lit(60L * 86400000000L)).as("late"))
      .localCheckpoint(true) // feeds the per-order rollup AND the candidates
    val perOrder = li.groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"))
    val cand = li.filter(col("late")).select(col("l_orderkey"), col("l_suppkey")).distinct()
    cand.join(perOrder, "l_orderkey")
      .filter(col("n_supp") >= 2L && col("n_late") === 1L)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy("s_name")
  }

  /** Q11-shaped SHARE-OF-TOTAL threshold — the scalar-subquery-in-HAVING
    * face: parts whose revenue exceeds 1.25x the average part's share of
    * total revenue (rev * n_parts * 4 > total * 5 — scale-FREE, unlike
    * Q11's fixed fraction, so the predicate keeps a strict non-empty
    * subset at every SF; the inequality is cross-multiplied so no
    * division ever crosses the compare, and both sides ride
    * decimal(38,0) — rev * n_parts overflows a BIGINT on a web-scale
    * part registry). One map-side-combinable partkey rollup; the
    * total + count scalar re-aggregates the ALREADY-REDUCED per-part
    * frame (never a second fact scan) and broadcasts.
    */
  val revenueShare: (SparkSession, String) => DataFrame = (spark, dir) => {
    val perPart = t(spark, dir, "lineitem")
      .select(col("l_partkey"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
      .groupBy("l_partkey")
      .agg(sum(col("qrev").cast("decimal(38,0)")).as("rev"))
    val tot = perPart.agg(sum(col("rev")).as("total"),
      count(lit(1)).cast("decimal(38,0)").as("n_parts"))
    perPart.crossJoin(broadcast(tot))
      .filter(col("rev") * col("n_parts") * lit(4L) > col("total") * lit(5L))
      .select(col("l_partkey"), col("rev").cast("long").as("revenue"))
      .orderBy("l_partkey")
  }

  /** Q2-shaped CHEAPEST-SUPPLIER census — the correlated-MIN-subquery
    * (argmin) face, decorrelated as ONE ordered-struct aggregation: per
    * part, the minimum-price line's supplier, selected by
    * min(struct(qprice, suppkey)) — Spark orders structs
    * lexicographically, so the single map-side-combinable aggregate IS
    * the argmin with the smallest-suppkey tie-break built in (no rank
    * window, no min + equality join-back — the fact table shuffles once
    * on partkey and nothing re-joins it). The oracle deliberately keeps
    * the textbook decorrelation — min per part, equality join-back,
    * min(suppkey) over the tied lines — an independent two-pass plan for
    * the same semantics. Output rolls up to the supplier-nation census:
    * how many parts each nation supplies at the cheapest price, and the
    * cheapest-price mass (integer cents).
    */
  val cheapestSupplier: (SparkSession, String) => DataFrame = (spark, dir) => {
    val best = t(spark, dir, "lineitem")
      .select(col("l_partkey"),
        struct(q100(col("l_extendedprice")).as("qprice"), col("l_suppkey").as("sk")).as("line"))
      .groupBy("l_partkey")
      .agg(min(col("line")).as("b"))
      .select(col("l_partkey"), col("b.qprice").as("qprice"), col("b.sk").as("l_suppkey"))
    best
      .join(broadcast(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("qprice").cast("decimal(38,0)")).cast("long").as("cheapest_sum"))
      .orderBy("n_name")
  }

  /** Q20-shaped DOMINANT-SUPPLIER audit — the EXISTS-over-NESTED-AGGREGATE
    * topology (a subquery aggregating a subquery's aggregates): suppliers
    * that ship more than TWICE the fair share of at least one
    * multi-supplier part's quantity (q * nsupp > 2 * tot — scale-free
    * like the share threshold, cross-multiplied so no division crosses
    * the compare), rolled up per supplier nation with distinct dominant
    * suppliers and total dominations. Decorrelated as TWO STACKED
    * map-side-combinable aggregations on the same partkey exchange — the
    * (part, supplier) rollup re-aggregates to the per-part total, and the
    * dominance filter joins the two REDUCED frames (the fact table
    * shuffles once, nothing ever re-joins it); the oracle keeps the
    * correlated EXISTS form over a windowed share. decimal(38,0) on the
    * cross-multiplied compare: q * nsupp overflows BIGINT at a web-scale
    * supplier registry.
    */
  val dominantSuppliers: (SparkSession, String) => DataFrame = (spark, dir) => {
    val dec = "decimal(38,0)"
    val ps = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), q100(col("l_quantity")).as("qqty"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("qqty")).as("q"))
    val pt = ps.groupBy("l_partkey")
      .agg(sum(col("q")).as("tot"), count(lit(1)).as("nsupp"))
      .filter(col("nsupp") > 1L)
    val dom = ps.join(pt, "l_partkey")
      .filter(col("q").cast(dec) * col("nsupp") > lit(2L).cast(dec) * col("tot"))
    dom
      .join(broadcast(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(countDistinct(col("l_suppkey")).as("n_dom_suppliers"),
        count(lit(1)).as("n_dominations"))
      .orderBy("n_name")
  }

  /** Revenue UNPIVOT — the wide->long melt face (the inverse of
    * [[revenuePivot]], and the normalization every metrics pipeline
    * runs when a wide table must become tidy rows): the pivot's
    * nation x flag matrix unpivots through Spark's native `unpivot`
    * API (a single Expand node — each input row fans out to its three
    * (flag, value) rows in one narrow pass, no join and no shuffle
    * beyond the pivot's own), flag names mapped back to the dimension
    * values. Zero-filled cells SURVIVE the round trip (the long-form
    * groupBy would omit them) — the oracle therefore builds the full
    * nation x flag grid with explicit zeros.
    */
  val revenueUnpivot: (SparkSession, String) => DataFrame = (spark, dir) => {
    val wide = revenuePivot(spark, dir)
    wide.unpivot(
        Array(col("n_name")),
        Array(col("rev_a"), col("rev_n"), col("rev_r")),
        "flag_col", "revenue")
      .select(col("n_name"),
        upper(substring(col("flag_col"), 5, 1)).as("flag"),
        col("revenue"))
      .orderBy("n_name", "flag")
  }

  /** Q16-shaped SUPPLIER-DIVERSITY census: distinct suppliers shipping
    * each (brand, size) slice of the catalog, excluding suppliers in
    * arrears (acctbal < 0) — the NOT-IN + COUNT-DISTINCT topology. The
    * NOT IN decorrelates as a LEFT ANTI against the in-arrears key set
    * (exact because s_suppkey is a non-null key — the stated premise
    * under which NOT IN == anti-join; a nullable probe would need the
    * three-valued form). Part prunes to the brand/size predicate BEFORE
    * the fact join, so the broadcast build side ships only matching
    * parts; the anti build side is the tiny arrears key set; the
    * distinct count is the standard two-level aggregate — the
    * (brand, size, suppkey) de-dup reduces fact rows first, and only
    * the reduced frame reaches the final exchange. supplier_cnt DESC
    * ordering is presentation-only (ties broken by brand, size).
    */
  val supplierDiversity: (SparkSession, String) => DataFrame = (spark, dir) => {
    val sizes = Seq(1, 9, 14, 19, 23, 36, 45, 49)
    val parts = t(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#45" && col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_size").cast("long").as("p_size"))
    val arrears = t(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
    t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(arrears), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** Q19-shaped DISJUNCTIVE-PREDICATE revenue: three brand-specific
    * (size-range x quantity-range) branches OR'd into one residual over
    * the part equi-join — the classic "the join key is conjunctive, the
    * business predicate is disjunctive" face. The equi-key carries the
    * join (broadcast part build side); the OR evaluates as a codegen'd
    * residual filter, never a fan-out; branches are brand-disjoint by
    * construction so each output row belongs to exactly one branch and
    * the rollup groups by brand. Money is fixed-point cents
    * (floor(x * 100)); revenue = qprice * (100 - qdisc) summed in Long
    * exactly like [[pricing]]'s sum_disc_price.
    */
  val brandRevenue: (SparkSession, String) => DataFrame = (spark, dir) => {
    val li = t(spark, dir, "lineitem").select(col("l_partkey"), col("l_quantity"),
      q100(col("l_quantity")).as("qqty"),
      (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
    val parts = t(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val branch =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 20)
        && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)
        && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#4" && col("p_size").between(1, 15)
        && col("l_quantity").between(20, 30))
    li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .filter(branch)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"), sum("qqty").as("sum_qty"),
        sum("qrev").as("revenue"))
      .orderBy("p_brand")
  }

  /** BENFORD first-digit audit over extended prices — the data-quality
    * face every warehouse runs on money columns: count per (returnflag,
    * leading digit of the CENTS fixed-point price), with an integer
    * permille share n * 1000 div flag-total. The digit comes from the
    * decimal string of the quantized Long (no float log10 anywhere);
    * the flag total re-aggregates the 27-row reduced frame, so the fact
    * table is touched once and shuffles only per-(flag, digit) partial
    * counts.
    */
  val benford: (SparkSession, String) => DataFrame = (spark, dir) => {
    val counts = t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        substring(q100(col("l_extendedprice")).cast("string"), 1, 1).as("digit"))
      .groupBy("l_returnflag", "digit")
      .agg(count(lit(1)).as("n"))
    val tot = counts.groupBy("l_returnflag").agg(sum(col("n")).as("tot"))
    counts.join(tot, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("digit"), col("n"),
        expr("n * 1000L div tot").as("permille"))
      .orderBy("l_returnflag", "digit")
  }

  /** Q3-shaped shipping-priority report: the top-10 highest-revenue
    * orders from BUILDING-segment customers that were placed before the
    * cutoff date but still have lines shipping after it. Both date
    * predicates sit directly on their scans (pushed filters); the
    * segment restriction is a LEFT SEMI on custkey (never multiplies
    * orders); revenue aggregates per order in fixed-point cents through
    * decimal(38,0); the top-10 is orderBy+limit — Spark plans it as
    * TakeOrderedAndProject (per-partition heaps + a k-row driver merge),
    * never a global sort. Ties are impossible to underspecify: revenue
    * ties break by (order day, orderkey) and orderkey is unique.
    * Order day is epoch-integer so the compare is dtype-exact.
    */
  val shipPriority: (SparkSession, String) => DataFrame = (spark, dir) => {
    val cut = lit("1998-01-01").cast("timestamp")
    val bld = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ords = t(spark, dir, "orders")
      .filter(col("o_orderdate") < cut)
      .join(bld, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("o_day"),
        col("o_orderpriority"))
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_day", "o_orderpriority")
      .agg(sum(col("qrev").cast("decimal(38,0)")).cast("long").as("revenue"))
      .orderBy(col("revenue").desc, col("o_day").asc, col("o_orderkey").asc)
      .limit(10)
  }

  /** Q10-shaped returned-item report: the 20 customers losing the most
    * revenue to returns ('R' lines of orders placed in 1997-Q4), with
    * their nation and fixed-point account balance. The scale-critical
    * move: the top-20 selection (TakeOrderedAndProject) runs on the
    * per-custkey REDUCED frame BEFORE any dimension join, so customer
    * and nation only ever see a 20-row broadcast side — never the full
    * per-customer revenue table. Ties break by custkey (unique).
    */
  val returnedCustomers: (SparkSession, String) => DataFrame = (spark, dir) => {
    val lo = lit("1997-10-01").cast("timestamp")
    val hi = lit("1998-01-01").cast("timestamp")
    val ords = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    val top = t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("qrev").cast("decimal(38,0)")).cast("long").as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey").asc)
      .limit(20)
    broadcast(top)
      .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_name"),
          q100(col("c_acctbal")).as("qbal"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("qbal"), col("n_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
  }

  /** Q12-shaped lateness x priority matrix: every shipped line classed
    * by integer ship latency (days from order to ship date: <= 30 FAST,
    * <= 90 NORMAL, else SLOW), counting critical-priority (1-URGENT /
    * 2-HIGH) vs lower-priority lines per class — Q12's CASE-sum shape
    * with the one fact-fact equi-join the query genuinely needs
    * (lineitem x orders on orderkey; at warehouse scale a shuffle
    * equi-join AQE can re-plan, never a multiply). Day arithmetic is
    * pure integer datediff, so class edges are exact on both sides.
    */
  val latenessPriority: (SparkSession, String) => DataFrame = (spark, dir) => {
    val ords = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val crit = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .select(
        when(datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")) <= 30, "FAST")
          .when(datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")) <= 90, "NORMAL")
          .otherwise("SLOW").as("ship_class"),
        when(crit, 1L).otherwise(0L).as("hi"),
        when(crit, 0L).otherwise(1L).as("lo"))
      .groupBy("ship_class")
      .agg(sum(col("hi")).as("high_line_count"), sum(col("lo")).as("low_line_count"))
      .orderBy("ship_class")
  }

  /** Q8-shaped national market share: within the ASIA market (orders by
    * customers of ASIA nations), the per-order-year revenue share of
    * lines supplied by NATION_12 suppliers — integer permille
    * num * 1000 div den over fixed-point cents. The market restriction
    * is a LEFT SEMI against the ASIA customer key set (never multiplies
    * facts); the supplier-side flag joins the 100-row supplier registry
    * with its 25-row nation tag (broadcast); numerator and denominator
    * are CONDITIONAL SUMS of one grouped pass over the joined facts —
    * one orderkey equi-join and one year-keyed rollup, no second scan.
    */
  val marketShare: (SparkSession, String) => DataFrame = (spark, dir) => {
    val nat = t(spark, dir, "nation")
    val asiaKeys = nat.join(broadcast(t(spark, dir, "region")
        .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
      col("n_regionkey") === col("r_regionkey")).select(col("n_nationkey"))
    val asiaCust = t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(asiaKeys), col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("c_custkey"))
    val ords = t(spark, dir, "orders")
      .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    val supFlag = t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nat.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), (col("n_name") === "NATION_12").as("is_target"))
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supFlag), col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(sum(when(col("is_target"), col("qrev")).otherwise(0L)
          .cast("decimal(38,0)")).cast("long").as("nation_rev"),
        sum(col("qrev").cast("decimal(38,0)")).cast("long").as("market_rev"))
      .select(col("o_year"), col("nation_rev"), col("market_rev"),
        expr("nation_rev * 1000L div market_rev").as("share_permille"))
      .orderBy("o_year")
  }

  /** Q9-shaped product-line profit: per (supplier nation, order year)
    * over parts whose name contains 'red', profit in cents-x-100 fixed
    * point: qprice * (100 - qdisc) - q100(retail) * q100(qty) — the
    * reference Q9 shape with p_retailprice standing in for the absent
    * partsupp supply cost. The part predicate prunes the part registry
    * BEFORE its fact join (an inner equi-join that also filters the
    * fact table); supplier+nation tag by broadcast; orders joins on
    * orderkey for the year only; one (nation, year) rollup, decimal
    * accumulators. Profit can be negative — the spec pins that.
    */
  val partProfit: (SparkSession, String) => DataFrame = (spark, dir) => {
    val redParts = t(spark, dir, "part")
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"), q100(col("p_retailprice")).as("qretail"))
    val supNat = t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(t(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val ords = t(spark, dir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        q100(col("l_quantity")).as("qqty"),
        (q100(col("l_extendedprice")) * (lit(100L) - q100(col("l_discount")))).as("qrev"))
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name"), col("o_year"),
        (col("qrev") - col("qretail") * col("qqty")).as("qprofit"))
      .groupBy("n_name", "o_year")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qprofit").cast("decimal(38,0)")).cast("long").as("profit"))
      .orderBy("n_name", "o_year")
  }

  /** MARKET-BASKET brand co-occurrence — the association-mining census
    * over the warehouse: for every unordered brand pair, in how many
    * ORDERS both brands appear (the support count of the 2-itemset, the
    * Apriori first rung) plus the order-key checksum pinning WHICH
    * orders. Per-order brand sets come from one broadcast dimension join
    * (part is registry-bounded) and one distinct; the self-join is
    * ORDER-KEYED, so each order contributes at most |brands-per-order|^2
    * pairs — linear in orders, never quadratic in lineitems; the rollup
    * output is bounded by |brands|^2 rows regardless of scale.
    */
  val basket: (SparkSession, String) => DataFrame = (spark, dir) => {
    val ob = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
      .join(broadcast(t(spark, dir, "part")
        .select(col("p_partkey").as("pkey"), col("p_brand").as("brand"))),
        Seq("pkey"))
      .select("okey", "brand").distinct()
    // r06: the order-keyed self-join became one groupBy emitting each
    // order's sorted brand-pair combinations — the same (brand_a <
    // brand_b) pair multiset (sort_array and `<` share Spark's binary
    // UTF8 ordering), per-order fan-out still |brands-per-order|^2, one
    // shuffle instead of a two-sided join exchange
    ob.groupBy("okey").agg(sort_array(collect_set(col("brand"))).as("bs"))
      .select(col("okey"), explode(expr(
        "flatten(transform(bs, (a, i) -> transform(slice(bs, i + 2, size(bs)), " +
          "b -> struct(a AS brand_a, b AS brand_b))))")).as("p"))
      .groupBy(col("p.brand_a").as("brand_a"), col("p.brand_b").as("brand_b"))
      .agg(count(lit(1)).as("n_orders"), sum(col("okey")).as("okey_sum"))
      .orderBy("brand_a", "brand_b")
  }

  val oracleSql: Map[String, String] = Map(
    // basket: the same distinct (order, brand) frame self-joined under
    // brand_a < brand_b
    "q_rel_basket" ->
      """WITH ob AS (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        |            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
        |SELECT a.brand AS brand_a, b.brand AS brand_b,
        |  count(*)::BIGINT AS n_orders, sum(a.okey)::BIGINT AS okey_sum
        |FROM ob a JOIN ob b ON b.okey = a.okey AND a.brand < b.brand
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_rel_market_share" ->
      """WITH facts AS (
        |  SELECT year(o.o_orderdate)::BIGINT AS o_year,
        |    floor(l.l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l.l_discount * 100)::BIGINT) AS qrev,
        |    sn.n_name = 'NATION_12' AS is_target
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation sn ON sn.n_nationkey = s.s_nationkey)
        |SELECT o_year,
        |  sum(CASE WHEN is_target THEN qrev ELSE 0 END)::BIGINT AS nation_rev,
        |  sum(qrev)::BIGINT AS market_rev,
        |  (sum(CASE WHEN is_target THEN qrev ELSE 0 END) * 1000
        |     // sum(qrev))::BIGINT AS share_permille
        |FROM facts GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_profit" ->
      """SELECT sn.n_name, year(o.o_orderdate)::BIGINT AS o_year,
        |  count(*)::BIGINT AS n_lines,
        |  sum(floor(l.l_extendedprice * 100)::BIGINT
        |        * (100 - floor(l.l_discount * 100)::BIGINT)
        |      - floor(p.p_retailprice * 100)::BIGINT
        |        * floor(l.l_quantity * 100)::BIGINT)::BIGINT AS profit
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_rel_ship_priority" ->
      """WITH rev AS (
        |  SELECT l.l_orderkey,
        |    date_diff('day', DATE '1970-01-01', o.o_orderdate::DATE)::BIGINT AS o_day,
        |    o.o_orderpriority,
        |    sum(floor(l.l_extendedprice * 100)::BIGINT
        |        * (100 - floor(l.l_discount * 100)::BIGINT))::BIGINT AS revenue
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  WHERE c.c_mktsegment = 'BUILDING'
        |    AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |    AND l.l_shipdate > TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2, 3)
        |SELECT l_orderkey AS o_orderkey, o_day, o_orderpriority, revenue
        |FROM rev ORDER BY revenue DESC, o_day, o_orderkey LIMIT 10""".stripMargin,

    "q_rel_returned" ->
      """WITH rev AS (
        |  SELECT o.o_custkey,
        |    sum(floor(l.l_extendedprice * 100)::BIGINT
        |        * (100 - floor(l.l_discount * 100)::BIGINT))::BIGINT AS revenue
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE l.l_returnflag = 'R'
        |    AND o.o_orderdate >= TIMESTAMP '1997-10-01'
        |    AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1
        |  ORDER BY revenue DESC, o_custkey LIMIT 20)
        |SELECT c.c_custkey, c.c_name, floor(c.c_acctbal * 100)::BIGINT AS qbal,
        |  n.n_name, rev.revenue
        |FROM rev JOIN customer c ON c.c_custkey = rev.o_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |ORDER BY rev.revenue DESC, c.c_custkey""".stripMargin,

    "q_rel_lateness" ->
      """SELECT CASE
        |    WHEN date_diff('day', o.o_orderdate::DATE, l.l_shipdate::DATE) <= 30 THEN 'FAST'
        |    WHEN date_diff('day', o.o_orderdate::DATE, l.l_shipdate::DATE) <= 90 THEN 'NORMAL'
        |    ELSE 'SLOW' END AS ship_class,
        |  sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_benford" ->
      """WITH d AS (SELECT l_returnflag,
        |        substr(floor(l_extendedprice * 100)::BIGINT::VARCHAR, 1, 1) AS digit,
        |        count(*)::BIGINT AS n
        |      FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT l_returnflag, sum(n)::BIGINT AS tot FROM d GROUP BY 1)
        |SELECT d.l_returnflag, d.digit, d.n,
        |  (d.n * 1000 // t.tot)::BIGINT AS permille
        |FROM d JOIN t USING (l_returnflag) ORDER BY 1, 2""".stripMargin,

    "q_rel_diversity" ->
      """SELECT p_brand, p_size::BIGINT AS p_size,
        |  count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2 ORDER BY 3 DESC, 1, 2""".stripMargin,

    "q_rel_brand_revenue" ->
      """SELECT p_brand, count(*)::BIGINT AS n_lines,
        |  sum(floor(l_quantity * 100))::BIGINT AS sum_qty,
        |  sum(floor(l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l_discount * 100)::BIGINT))::BIGINT AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 20
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_dominant" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |        sum(floor(l_quantity * 100)::BIGINT)::BIGINT AS q
        |      FROM lineitem GROUP BY 1, 2),
        |w AS (SELECT l_partkey, l_suppkey, q,
        |        sum(q) OVER (PARTITION BY l_partkey) AS tot,
        |        count(*) OVER (PARTITION BY l_partkey) AS nsupp
        |      FROM ps),
        |dom AS (SELECT l_partkey, l_suppkey FROM w
        |        WHERE nsupp > 1 AND q::HUGEINT * nsupp > 2 * tot::HUGEINT)
        |SELECT n_name, count(DISTINCT l_suppkey)::BIGINT AS n_dom_suppliers,
        |  count(*)::BIGINT AS n_dominations
        |FROM dom JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_cheapest" ->
      """WITH li AS (SELECT l_partkey, l_suppkey,
        |        floor(l_extendedprice * 100)::BIGINT AS qprice FROM lineitem),
        |b AS (SELECT l_partkey, min(qprice) AS mp FROM li GROUP BY 1),
        |c AS (SELECT li.l_partkey, min(li.l_suppkey) AS sk, min(li.qprice) AS qprice
        |      FROM li JOIN b ON li.l_partkey = b.l_partkey AND li.qprice = b.mp
        |      GROUP BY 1)
        |SELECT n_name, count(*)::BIGINT AS n_parts, sum(c.qprice)::BIGINT AS cheapest_sum
        |FROM c JOIN supplier ON s_suppkey = sk
        |JOIN nation ON n_nationkey = s_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_waiting" ->
      """WITH li AS (SELECT l_orderkey, l_suppkey,
        |        epoch_us(l_shipdate) AS ship_us FROM lineitem),
        |o AS (SELECT o_orderkey, epoch_us(o_orderdate) AS ord_us FROM orders),
        |late AS (SELECT DISTINCT l_orderkey, l_suppkey
        |         FROM li JOIN o ON o_orderkey = l_orderkey
        |         WHERE ship_us > ord_us + 60 * 86400000000)
        |SELECT s_name, count(*)::BIGINT AS numwait
        |FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM li l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_share" ->
      """WITH p AS (SELECT l_partkey,
        |        sum(floor(l_extendedprice * 100)::BIGINT
        |            * (100 - floor(l_discount * 100)::BIGINT))::HUGEINT AS rev
        |      FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(rev)::HUGEINT AS total, count(*)::HUGEINT AS n_parts FROM p)
        |SELECT l_partkey, rev::BIGINT AS revenue
        |FROM p, t WHERE rev * n_parts * 4 > total * 5
        |ORDER BY 1""".stripMargin,

    "q_rel_unpivot" ->
      """WITH li AS (SELECT n_name, l_returnflag AS flag,
        |        floor(l_extendedprice * 100)::BIGINT
        |          * (100 - floor(l_discount * 100)::BIGINT) AS qrev
        |      FROM lineitem
        |      JOIN orders ON o_orderkey = l_orderkey
        |      JOIN customer ON c_custkey = o_custkey
        |      JOIN nation ON n_nationkey = c_nationkey),
        |grid AS (SELECT DISTINCT n_name FROM li),
        |flags AS (SELECT unnest(['A', 'N', 'R']) AS flag)
        |SELECT g.n_name, f.flag,
        |  coalesce((SELECT sum(qrev) FROM li
        |            WHERE li.n_name = g.n_name AND li.flag = f.flag), 0)::BIGINT AS revenue
        |FROM grid g CROSS JOIN flags f
        |ORDER BY 1, 2""".stripMargin,

    "q_rel_trailing" ->
      """WITH d AS (SELECT epoch_us(l_shipdate) // 86400000000 AS day,
        |  sum(floor(l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l_discount * 100)::BIGINT))::BIGINT AS rev
        |  FROM lineitem GROUP BY 1)
        |SELECT day::BIGINT AS day, rev,
        |  sum(rev) OVER (ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)::BIGINT AS rev_7d
        |FROM d ORDER BY day""".stripMargin,

    "q_lake_delete" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n_lines,
        |  sum(floor(l_quantity * 100)::BIGINT)::BIGINT AS sum_qqty
        |FROM lineitem WHERE l_orderkey NOT BETWEEN 100 AND 799
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_lake_stats" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  min(l_orderkey)::BIGINT AS min_okey, max(l_orderkey)::BIGINT AS max_okey,
        |  min(l_suppkey)::BIGINT AS min_skey, max(l_suppkey)::BIGINT AS max_skey
        |FROM lineitem""".stripMargin,

    "q_rel_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  count(*)::BIGINT AS n_lines,
        |  sum(floor(l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l_discount * 100)::BIGINT))::BIGINT AS revenue
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,

    "q_rel_gsets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  count(*)::BIGINT AS n_lines,
        |  sum(floor(l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l_discount * 100)::BIGINT))::BIGINT AS revenue
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY 1, 2""".stripMargin,

    "q_rel_small_qty" ->
      """WITH li AS (SELECT l_partkey, l_returnflag,
        |        floor(l_quantity * 100)::BIGINT AS qqty,
        |        floor(l_extendedprice * 100)::BIGINT AS qprice FROM lineitem),
        |p AS (SELECT l_partkey, count(*)::BIGINT AS n, sum(qqty)::BIGINT AS sq
        |      FROM li GROUP BY 1)
        |SELECT l_returnflag, count(*)::BIGINT AS n_small,
        |  sum(qprice)::BIGINT AS sum_price
        |FROM li JOIN p USING (l_partkey)
        |WHERE qqty * 5 * n < sq
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_lake_merge" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n_lines,
        |  sum(CASE WHEN l_orderkey BETWEEN 100 AND 799
        |      THEN floor(l_quantity * 100)::BIGINT + 7
        |      ELSE floor(l_quantity * 100)::BIGINT END)::BIGINT AS sum_qqty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_lake_skip" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n_lines,
        |  sum(floor(l_quantity * 100)::BIGINT)::BIGINT AS sum_qqty,
        |  sum(l_orderkey)::BIGINT AS sum_okey
        |FROM lineitem WHERE l_orderkey BETWEEN 100 AND 799
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_reconcile" ->
      """WITH o AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
        |             count(*)::BIGINT AS n_orders FROM orders GROUP BY 1),
        |l AS (SELECT epoch_us(l_shipdate) // 86400000000 AS day,
        |        count(*)::BIGINT AS n_shipped FROM lineitem GROUP BY 1)
        |SELECT coalesce(o.day, l.day)::BIGINT AS day,
        |  coalesce(n_orders, 0)::BIGINT AS n_orders,
        |  coalesce(n_shipped, 0)::BIGINT AS n_shipped
        |FROM o FULL JOIN l ON o.day = l.day ORDER BY 1""".stripMargin,

    "q_rel_pivot" ->
      """WITH li AS (SELECT n_name, l_returnflag,
        |        floor(l_extendedprice * 100)::BIGINT
        |          * (100 - floor(l_discount * 100)::BIGINT) AS qrev
        |      FROM lineitem
        |      JOIN orders ON o_orderkey = l_orderkey
        |      JOIN customer ON c_custkey = o_custkey
        |      JOIN nation ON n_nationkey = c_nationkey)
        |SELECT n_name,
        |  sum(CASE WHEN l_returnflag = 'A' THEN qrev ELSE 0 END)::BIGINT AS rev_a,
        |  sum(CASE WHEN l_returnflag = 'N' THEN qrev ELSE 0 END)::BIGINT AS rev_n,
        |  sum(CASE WHEN l_returnflag = 'R' THEN qrev ELSE 0 END)::BIGINT AS rev_r
        |FROM li GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_trade_matrix" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  count(*)::BIGINT AS n_lines,
        |  sum(floor(l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l_discount * 100)::BIGINT))::BIGINT AS revenue
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation sn ON sn.n_nationkey = s_nationkey
        |JOIN nation cn ON cn.n_nationkey = c_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_rel_top_customer" ->
      """WITH s AS (SELECT o_custkey, sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS total
        |           FROM orders GROUP BY 1),
        |r AS (SELECT n_name, c_name, total,
        |        row_number() OVER (PARTITION BY c_nationkey
        |                           ORDER BY total DESC, c_custkey) AS rn
        |      FROM s JOIN customer ON c_custkey = o_custkey
        |      JOIN nation ON n_nationkey = c_nationkey)
        |SELECT n_name, c_name, total FROM r WHERE rn = 1 ORDER BY n_name""".stripMargin,

    "q_rel_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
        |  count(*)::BIGINT AS n_lines,
        |  sum(floor(l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l_discount * 100)::BIGINT))::BIGINT AS revenue
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY 1, 2""".stripMargin,

    "q_rel_running" ->
      """SELECT o_custkey, o_orderkey,
        |  sum(floor(o_totalprice * 100)::BIGINT) OVER (
        |    PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate), o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS run_total
        |FROM orders ORDER BY 1, 2""".stripMargin,

    "q_rel_big_orders" ->
      """WITH s AS (SELECT l_orderkey, sum(floor(l_quantity * 100)::BIGINT)::BIGINT AS sum_qty
        |           FROM lineitem GROUP BY 1
        |           HAVING sum(floor(l_quantity * 100)::BIGINT) > 20000)
        |SELECT o_orderkey, c_name, floor(o_totalprice * 100)::BIGINT AS qtotal, sum_qty
        |FROM s JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY 1""".stripMargin,

    "q_rel_local_revenue" ->
      """SELECT n_name, count(*)::BIGINT AS n_lines,
        |  sum(floor(l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l_discount * 100)::BIGINT))::BIGINT AS revenue
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE c_nationkey = s_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_cust_dist" ->
      """WITH cu AS (SELECT max(epoch_us(o_orderdate)) - 365 * 86400000000 AS cutus FROM orders),
        |ro AS (SELECT o_custkey FROM orders CROSS JOIN cu WHERE epoch_us(o_orderdate) > cutus),
        |d AS (SELECT c_custkey, count(ro.o_custkey)::BIGINT AS n_orders
        |      FROM customer LEFT JOIN ro ON o_custkey = c_custkey GROUP BY 1)
        |SELECT n_orders, count(*)::BIGINT AS n_custs FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_promo_share" ->
      """WITH li AS (SELECT epoch_us(l_shipdate) // 31536000000000 AS yr365, p_type,
        |        floor(l_extendedprice * 100)::BIGINT
        |          * (100 - floor(l_discount * 100)::BIGINT) AS qrev
        |      FROM lineitem JOIN part ON p_partkey = l_partkey)
        |SELECT yr365, count(*)::BIGINT AS n_lines,
        |  sum(CASE WHEN p_type = 'PROMO' THEN qrev ELSE 0 END)::BIGINT AS promo_rev,
        |  sum(qrev)::BIGINT AS total_rev,
        |  (sum(CASE WHEN p_type = 'PROMO' THEN qrev ELSE 0 END) * 1000
        |    // sum(qrev))::BIGINT AS promo_x1000
        |FROM li GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_balance_audit" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |        floor(c_acctbal * 100)::BIGINT AS qbal FROM customer),
        |th AS (SELECT (sum(qbal) // count(*))::BIGINT AS thr FROM c WHERE qbal > 0),
        |cu AS (SELECT max(epoch_us(o_orderdate)) - 180 * 86400000000 AS cutus FROM orders),
        |ro AS (SELECT DISTINCT o_custkey FROM orders CROSS JOIN cu
        |       WHERE epoch_us(o_orderdate) > cutus)
        |SELECT c_mktsegment, count(*)::BIGINT AS n_custs, sum(qbal)::BIGINT AS bal_sum
        |FROM c CROSS JOIN th
        |WHERE qbal > thr AND NOT EXISTS (SELECT 1 FROM ro WHERE ro.o_custkey = c.c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rel_weekly_trend" ->
      """SELECT epoch_us(l_shipdate) // 604800000000 AS week, r_name,
        |  count(*)::BIGINT AS n_lines,
        |  sum(floor(l_extendedprice * 100)::BIGINT
        |      * (100 - floor(l_discount * 100)::BIGINT))::BIGINT AS revenue
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_rel_part_margin" ->
      """WITH li AS (SELECT p_type,
        |        floor(l_extendedprice * 100)::BIGINT
        |          * (100 - floor(l_discount * 100)::BIGINT) AS qrev,
        |        floor(p_retailprice * 100)::BIGINT * floor(l_quantity * 100)::BIGINT AS qcost
        |      FROM lineitem JOIN part ON p_partkey = l_partkey)
        |SELECT p_type, count(*)::BIGINT AS n_lines, sum(qrev)::BIGINT AS revenue,
        |  sum(qrev - qcost)::BIGINT AS margin
        |FROM li GROUP BY 1 ORDER BY 1""".stripMargin,

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

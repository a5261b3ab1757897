package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Relational wave vs single-threaded recomputes over the collected
  * warehouse tables (fixed-point cents math mirrored exactly), plus the
  * broadcast-join plan shape.
  */
class RelOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def q100(x: Double): Long = math.floor(x * 100.0).toLong

  private lazy val li: Seq[(Long, Long, Double, Double, Double, Double, String, String, Long)] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "unix_micros(cast(l_shipdate as timestamp))")
      .as[(Long, Long, Double, Double, Double, Double, String, String, Long)].collect().toSeq
  }

  test("pricing == local fixed-point Q1 recompute") {
    val cut = li.map(_._9).max - 90L * 86400000000L
    val want = li.filter(_._9 <= cut).groupBy(l => (l._7, l._8)).toSeq.map {
      case ((rf, ls), xs) =>
        val dp = xs.map(l => q100(l._4) * (100L - q100(l._5)))
        val ch = xs.map(l => BigInt(q100(l._4) * (100L - q100(l._5))) * (100L + q100(l._6)))
        (rf, ls, xs.size.toLong, xs.map(l => q100(l._3)).sum,
          xs.map(l => q100(l._4)).sum, dp.sum, ch.sum.toLong)
    }.sortBy(r => (r._1, r._2))
    val got = RelOps.pricing(spark, sf).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    assert(want.map(_._3).sum < li.size, "the 90-day cutoff must drop some lines")
  }

  test("revenueNation == local three-hop join recompute; plan broadcasts dims") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey").as[(Long, Long)].collect().toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_nationkey").as[(Long, Int)].collect().toMap
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name").as[(Int, String)].collect().toMap
    val want = li.map { l =>
      (nation(cust(orders(l._1))), q100(l._4) * (100L - q100(l._5)))
    }.groupBy(_._1).toSeq.map { case (n, xs) =>
      (n, xs.size.toLong, xs.map(x => BigInt(x._2)).sum.toLong)
    }.sortBy(_._1)
    val df = RelOps.revenueNation(spark, sf)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dimension joins must broadcast")
    assert(!plan.contains("CartesianProduct"), "no all-pairs escape")
  }

  test("topSuppliers == local fixed-point top-10") {
    import spark.implicits._
    val names = spark.read.parquet(s"$sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_name").as[(Long, String)].collect().toMap
    val want = li.groupBy(_._2).toSeq.map { case (sk, xs) =>
      (sk, xs.map(l => BigInt(q100(l._4) * (100L - q100(l._5)))).sum.toLong)
    }.sortBy { case (sk, rev) => (-rev, sk) }.take(10).zipWithIndex.map {
      case ((sk, rev), i) => (i + 1L, names(sk), rev)
    }
    val got = RelOps.topSuppliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(want.map(_._3) == want.map(_._3).sorted.reverse)
  }

  test("priority == local EXISTS semi-join recompute") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_orderpriority", "unix_micros(cast(o_orderdate as timestamp))")
      .as[(Long, String, Long)].collect().toSeq
    val shipByOrder = li.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._9) }
    val want = orders.groupBy(_._2).toSeq.map { case (p, os) =>
      val late = os.count(o => shipByOrder.getOrElse(o._1, Nil).exists(_ > o._3)).toLong
      (p, os.size.toLong, late, late * 1000L / os.size)
    }.sortBy(_._1)
    val got = RelOps.priority(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(want.exists(r => r._3 > 0L && r._3 < r._2),
      "late shipments must exist but not be universal")
  }
}

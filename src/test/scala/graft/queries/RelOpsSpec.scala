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

  test("basket == local per-order brand-set pair recompute; support bounded") {
    import spark.implicits._
    val lp = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").as[(Long, Long)].collect()
    val brandOf = spark.read.parquet(s"$sf/part.parquet")
      .selectExpr("p_partkey", "p_brand").as[(Long, String)].collect().toMap
    val sets = lp.map { case (o, p) => (o, brandOf(p)) }.distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toSeq
    val want = sets.flatMap { case (o, bs) =>
      for (i <- bs.indices; j <- i + 1 until bs.length) yield ((bs(i), bs(j)), o)
    }.groupBy(_._1).toSeq.map { case ((a, b), rs) =>
      (a, b, rs.size.toLong, rs.map(_._2).sum)
    }.sortBy(r => (r._1, r._2))
    val got = RelOps.basket(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(want.nonEmpty, "some order must span two brands")
    // support can never exceed the order count
    val nOrders = lp.map(_._1).distinct.length.toLong
    got.foreach(r => assert(r._3 <= nOrders))
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

  test("weeklyTrend == local epoch-week recompute through the full dimension chain") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey").as[(Long, Long)].collect().toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_nationkey").as[(Long, Int)].collect().toMap
    val natReg = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_regionkey").as[(Int, Int)].collect().toMap
    val regions = spark.read.parquet(s"$sf/region.parquet")
      .selectExpr("r_regionkey", "r_name").as[(Int, String)].collect().toMap
    val want = li.map { l =>
      ((l._9 / 604800000000L, regions(natReg(cust(orders(l._1))))),
        q100(l._4) * (100L - q100(l._5)))
    }.groupBy(_._1).toSeq.map { case ((w, r), xs) =>
      (w, r, xs.size.toLong, xs.map(x => BigInt(x._2)).sum.toLong)
    }.sortBy(r => (r._1, r._2))
    val got = RelOps.weeklyTrend(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(want.map(_._1).distinct.size > 1, "several weeks must exist")
  }

  test("partMargin == local scale-consistent fixed-point recompute") {
    import spark.implicits._
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .selectExpr("p_partkey", "p_type", "p_retailprice")
      .as[(Long, String, Double)].collect().map(p => p._1 -> (p._2, q100(p._3))).toMap
    val liP = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .as[(Long, Double, Double, Double)].collect().toSeq
    val want = liP.map { l =>
      val (ptype, qretail) = parts(l._1)
      (ptype, q100(l._3) * (100L - q100(l._4)), qretail * q100(l._2))
    }.groupBy(_._1).toSeq.map { case (t, xs) =>
      (t, xs.size.toLong, xs.map(x => BigInt(x._2)).sum.toLong,
        xs.map(x => BigInt(x._2 - x._3)).sum.toLong)
    }.sortBy(_._1)
    val got = RelOps.partMargin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(want.exists(_._4 < 0L) || want.exists(_._4 > 0L), "margins must be non-trivial")
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

  test("localRevenue == local dual-chain recompute (c_nation == s_nation only)") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey").as[(Long, Long)].collect().toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_nationkey").as[(Long, Int)].collect().toMap
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_nationkey").as[(Long, Int)].collect().toMap
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name").as[(Int, String)].collect().toMap
    val kept = li.filter(l => cust(orders(l._1)) == supp(l._2))
    val want = kept.map { l =>
      (nation(supp(l._2)), q100(l._4) * (100L - q100(l._5)))
    }.groupBy(_._1).toSeq.map { case (n, xs) =>
      (n, xs.size.toLong, xs.map(x => BigInt(x._2)).sum.toLong)
    }.sortBy(_._1)
    val got = RelOps.localRevenue(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(kept.nonEmpty && kept.size < li.size,
      "the cross-dimension equality must keep a strict, non-empty subset")
  }

  test("custDist == local trailing-365d left-outer histogram incl. the zero bucket") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "unix_micros(cast(o_orderdate as timestamp))")
      .as[(Long, Long)].collect().toSeq
    val custs = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey").as[Long].collect().toSeq
    val cut = orders.map(_._2).max - 365L * 86400000000L
    val perCust = orders.filter(_._2 > cut).groupBy(_._1).map { case (k, xs) => k -> xs.size.toLong }
    val want = custs.map(c => perCust.getOrElse(c, 0L)).groupBy(identity).toSeq
      .map { case (n, xs) => (n, xs.size.toLong) }.sortBy(_._1)
    val got = RelOps.custDist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(want.head._1 == 0L && want.head._2 > 0L,
      "the left outer must surface a non-empty zero-order bucket")
  }

  test("promoShare == local conditional-share recompute per 365d bucket") {
    import spark.implicits._
    val ptype = spark.read.parquet(s"$sf/part.parquet")
      .selectExpr("p_partkey", "p_type").as[(Long, String)].collect().toMap
    val liP = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_extendedprice", "l_discount",
        "unix_micros(cast(l_shipdate as timestamp))")
      .as[(Long, Double, Double, Long)].collect().toSeq
    val want = liP.map { l =>
      (l._4 / 31536000000000L, ptype(l._1) == "PROMO", q100(l._2) * (100L - q100(l._3)))
    }.groupBy(_._1).toSeq.map { case (y, xs) =>
      val promo = xs.filter(_._2).map(x => BigInt(x._3)).sum
      val total = xs.map(x => BigInt(x._3)).sum
      (y, xs.size.toLong, promo.toLong, total.toLong, ((promo * 1000) / total).toLong)
    }.sortBy(_._1)
    val got = RelOps.promoShare(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(want.forall(r => r._5 > 0L && r._5 < 1000L),
      "promo share must be a proper fraction in every bucket")
  }

  test("balanceAudit == local mean-threshold anti-join recompute") {
    import spark.implicits._
    val custs = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment", "c_acctbal")
      .as[(Long, String, Double)].collect().toSeq.map(c => (c._1, c._2, q100(c._3)))
    val pos = custs.map(_._3).filter(_ > 0L)
    val thr = (pos.map(BigInt(_)).sum / pos.size).toLong
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "unix_micros(cast(o_orderdate as timestamp))")
      .as[(Long, Long)].collect().toSeq
    val cut = orders.map(_._2).max - 180L * 86400000000L
    val active = orders.filter(_._2 > cut).map(_._1).toSet
    val kept = custs.filter(c => c._3 > thr && !active.contains(c._1))
    val want = kept.groupBy(_._2).toSeq.map { case (seg, xs) =>
      (seg, xs.size.toLong, xs.map(x => BigInt(x._3)).sum.toLong)
    }.sortBy(_._1)
    val got = RelOps.balanceAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(kept.nonEmpty && kept.size < custs.count(_._3 > thr),
      "the anti-join must drop some above-threshold customers but not all")
  }

  test("revenueRollup == detail + region subtotals + grand total, one consistent pass") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey").as[(Long, Long)].collect().toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_nationkey").as[(Long, Int)].collect().toMap
    val nat = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name", "n_regionkey").as[(Int, String, Int)]
      .collect().map(n => n._1 -> (n._2, n._3)).toMap
    val reg = spark.read.parquet(s"$sf/region.parquet")
      .selectExpr("r_regionkey", "r_name").as[(Int, String)].collect().toMap
    val rows = li.map { l =>
      val (nn, rk) = nat(cust(orders(l._1)))
      (reg(rk), nn, q100(l._4) * (100L - q100(l._5)))
    }
    def agg(xs: Seq[(String, String, Long)], r: String, n: String) =
      (r, n, xs.size.toLong, xs.map(x => BigInt(x._3)).sum.toLong)
    val detail = rows.groupBy(x => (x._1, x._2)).toSeq.map { case ((r, n), xs) => agg(xs, r, n) }
    val regionTot = rows.groupBy(_._1).toSeq.map { case (r, xs) => agg(xs, r, "ALL") }
    val want = (detail ++ regionTot :+ agg(rows, "ALL", "ALL")).sortBy(x => (x._1, x._2))
    val got = RelOps.revenueRollup(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.count(_._2 == "ALL") == regionTot.size + 1, "one subtotal per region + grand")
  }

  test("runningRevenue == per-customer sorted prefix sums (date then orderkey)") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey",
        "unix_micros(cast(o_orderdate as timestamp))", "o_totalprice")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val want = orders.groupBy(_._1).toSeq.flatMap { case (ck, os) =>
      val sorted = os.sortBy(o => (o._3, o._2))
      sorted.scanLeft((0L, BigInt(0))) { case ((_, acc), o) =>
        (o._2, acc + q100(o._4))
      }.tail.map { case (ok, run) => (ck, ok, run.toLong) }
    }.sortBy(r => (r._1, r._2))
    val got = RelOps.runningRevenue(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(orders.groupBy(_._1).values.exists(_.size > 2), "multi-order customers must exist")
  }

  test("bigOrders == local HAVING + rejoin recompute, strict non-empty subset") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice")
      .as[(Long, Long, Double)].collect().map(o => o._1 -> (o._2, q100(o._3))).toMap
    val names = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_name").as[(Long, String)].collect().toMap
    val sums = li.groupBy(_._1).map { case (k, xs) => k -> xs.map(l => q100(l._3)).sum }
    val want = sums.filter(_._2 > 20000L).toSeq.map { case (ok, sq) =>
      val (ck, qt) = orders(ok)
      (ok, names(ck), qt, sq)
    }.sortBy(_._1)
    val got = RelOps.bigOrders(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(want.nonEmpty && want.size < sums.size, "HAVING must keep a strict non-empty subset")
  }

  test("tradeMatrix == local bilateral-flow recompute; off-diagonal dominates") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey").as[(Long, Long)].collect().toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_nationkey").as[(Long, Int)].collect().toMap
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_nationkey").as[(Long, Int)].collect().toMap
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name").as[(Int, String)].collect().toMap
    val want = li.map { l =>
      ((nation(supp(l._2)), nation(cust(orders(l._1)))), q100(l._4) * (100L - q100(l._5)))
    }.groupBy(_._1).toSeq.map { case ((s, c), xs) =>
      (s, c, xs.size.toLong, xs.map(x => BigInt(x._2)).sum.toLong)
    }.sortBy(r => (r._1, r._2))
    val got = RelOps.tradeMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    val offDiag = want.filter(r => r._1 != r._2).map(_._3).sum
    assert(offDiag > want.filter(r => r._1 == r._2).map(_._3).sum,
      "cross-border flow must dominate the diagonal (24/25 of random pairs)")
  }

  test("topCustomerPerNation == local per-nation argmax with the deterministic tie-break") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "o_totalprice").as[(Long, Double)].collect().toSeq
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_name", "c_nationkey").as[(Long, String, Int)].collect().toSeq
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name").as[(Int, String)].collect().toMap
    val totals = orders.groupBy(_._1).map { case (k, xs) =>
      k -> xs.map(o => BigInt(q100(o._2))).sum.toLong
    }
    val want = cust.map(c => (c._3, c._1, c._2, totals.getOrElse(c._1, 0L)))
      .groupBy(_._1).toSeq.map { case (nk, xs) =>
        val win = xs.minBy(x => (-x._4, x._2))
        (nation(nk), win._3, win._4)
      }.sortBy(_._1)
    val got = RelOps.topCustomerPerNation(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.map(_._2).distinct.size == got.size, "one distinct winner per nation")
  }

  test("reconcile == local full-outer day merge; both one-sided regions exist") {
    import spark.implicits._
    val odays = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("unix_micros(cast(o_orderdate as timestamp))").as[Long]
      .collect().toSeq.map(_ / 86400000000L)
    val ldays = li.map(_._9 / 86400000000L)
    val oc = odays.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    val lc = ldays.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    val want = (oc.keySet ++ lc.keySet).toSeq.sorted
      .map(d => (d, oc.getOrElse(d, 0L), lc.getOrElse(d, 0L)))
    val got = RelOps.reconcile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(want.exists(r => r._2 == 0L && r._3 > 0L), "ship-only days must exist")
    assert(want.exists(r => r._2 > 0L && r._3 == 0L), "order-only days must exist")
  }

  test("revenuePivot == local flag-conditional sums; columns cover A/N/R") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey").as[(Long, Long)].collect().toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_nationkey").as[(Long, Int)].collect().toMap
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name").as[(Int, String)].collect().toMap
    val want = li.map { l =>
      (nation(cust(orders(l._1))), l._7, q100(l._4) * (100L - q100(l._5)))
    }.groupBy(_._1).toSeq.map { case (n, xs) =>
      def s(f: String) = xs.filter(_._2 == f).map(x => BigInt(x._3)).sum.toLong
      (n, s("A"), s("N"), s("R"))
    }.sortBy(_._1)
    val got = RelOps.revenuePivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(want.forall(r => r._2 > 0L && r._3 > 0L && r._4 > 0L),
      "every nation must carry all three flags at contract scale")
  }

  test("cubeRevenue == local four-grouping-set recompute; cardinality is the cube closure") {
    val cells = li.map(l => (l._7, l._8, BigInt(q100(l._4)) * (100L - q100(l._5))))
    def agg(f: ((String, String, BigInt)) => (String, String)) =
      cells.groupBy(f).toSeq.map { case ((a, b), xs) =>
        (a, b, xs.size.toLong, xs.map(_._3).sum.toLong)
      }
    val want = (agg(c => (c._1, c._2)) ++ agg(c => (c._1, "ALL")) ++
      agg(c => ("ALL", c._2)) ++ agg(_ => ("ALL", "ALL")))
      .sortBy(r => (r._1, r._2))
    val got = RelOps.cubeRevenue(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    val nf = cells.map(_._1).distinct.size
    val ns = cells.map(_._2).distinct.size
    assert(got.size == cells.map(c => (c._1, c._2)).distinct.size + nf + ns + 1)
  }

  test("gsetsRevenue == local three-set recompute; NOT a cube and NOT a rollup") {
    val cells = li.map(l => (l._7, l._8, BigInt(q100(l._4)) * (100L - q100(l._5))))
    def agg(f: ((String, String, BigInt)) => (String, String)) =
      cells.groupBy(f).toSeq.map { case ((a, b), xs) =>
        (a, b, xs.size.toLong, xs.map(_._3).sum.toLong)
      }
    val want = (agg(c => (c._1, c._2)) ++ agg(c => ("ALL", c._2)) ++
      agg(_ => ("ALL", "ALL"))).sortBy(r => (r._1, r._2))
    val got = RelOps.gsetsRevenue(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // the shape that distinguishes explicit sets from cube/rollup: the
    // (flag)-only subtotal (flag != ALL, status = ALL) must NOT exist
    assert(!got.exists(r => r._1 != "ALL" && r._2 == "ALL"))
    // closure cardinality: detail + per-status + grand total
    val ns = cells.map(_._2).distinct.size
    assert(got.size == cells.map(c => (c._1, c._2)).distinct.size + ns + 1)
    // every set's rows partition the fact table
    assert(got.filter(r => r._1 == "ALL" && r._2 != "ALL").map(_._3).sum == cells.size.toLong)
  }

  test("trailingRevenue == local range-frame recompute; day gaps make RANGE differ from ROWS") {
    val byDay = li.groupBy(l => l._9 / 86400000000L).toSeq.map { case (d, xs) =>
      (d, xs.map(l => BigInt(q100(l._4)) * (100L - q100(l._5))).sum.toLong)
    }.sortBy(_._1)
    val want = byDay.map { case (d, r) =>
      (d, r, byDay.filter(x => x._1 >= d - 6L && x._1 <= d).map(x => BigInt(x._2)).sum.toLong)
    }
    val got = RelOps.trailingRevenue(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // non-trivial: a calendar gap must exist, and on some day the RANGE
    // frame therefore spans fewer than 7 present days (ROWS would differ)
    val days = byDay.map(_._1)
    assert(days.zip(days.drop(1)).exists { case (a, b) => b - a > 1L },
      "need a calendar gap for the RANGE-vs-ROWS distinction")
    val idx = days.zipWithIndex.toMap
    val rangeNarrower = byDay.zipWithIndex.exists { case ((d, _), i) =>
      i >= 6 && days.slice(i - 6, i + 1).exists(_ < d - 6L)
    }
    assert(rangeNarrower, "some warmed-up day must have a 7-row frame wider than 7 calendar days")
    assert(idx.size == byDay.size)
  }

  test("smallQty == local integer-exact below-average recompute") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_returnflag", "l_quantity", "l_extendedprice")
      .as[(Long, String, Double, Double)].collect().toSeq
    val perPart = rows.groupBy(_._1).map { case (pk, xs) =>
      pk -> (xs.size.toLong, xs.map(x => q100(x._3)).sum)
    }
    val small = rows.filter { r =>
      val (n, sq) = perPart(r._1)
      q100(r._3) * 5L * n < sq
    }
    val want = small.groupBy(_._2).toSeq.map { case (rf, xs) =>
      (rf, xs.size.toLong, xs.map(x => BigInt(q100(x._4))).sum.toLong)
    }.sortBy(_._1)
    val got = RelOps.smallQty(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(small.nonEmpty && small.size < rows.size,
      "the 20%-of-average predicate must keep a strict non-empty subset")
  }

  test("waitingSuppliers == local exists/not-exists recompute; both correlates bite") {
    import spark.implicits._
    val ordUs = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "unix_micros(cast(o_orderdate as timestamp))")
      .as[(Long, Long)].collect().toMap
    val sName = spark.read.parquet(s"$sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_name").as[(Long, String)].collect().toMap
    val byOrder = li.groupBy(_._1)
    val late = li.filter(l => l._9 > ordUs(l._1) + 60L * 86400000000L)
      .map(l => (l._1, l._2)).distinct
    val lateByOrder = late.groupBy(_._1)
    val waiting = late.filter { case (ok, sk) =>
      byOrder(ok).exists(_._2 != sk) && !lateByOrder(ok).exists(_._2 != sk)
    }
    val want = waiting.groupBy(_._2).toSeq
      .map { case (sk, xs) => (sName(sk), xs.size.toLong) }.sortBy(_._1)
    val got = RelOps.waitingSuppliers(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    // non-trivial: the EXISTS must drop sole-supplier orders somewhere and
    // the NOT EXISTS must drop multi-late orders somewhere
    assert(waiting.nonEmpty && waiting.size < late.size,
      "the two correlates must keep a strict non-empty subset of late pairs")
    assert(late.exists { case (ok, sk) => lateByOrder(ok).exists(_._2 != sk) },
      "a multi-late order must exist for the NOT EXISTS to bite")
    assert(late.exists { case (ok, _) => byOrder(ok).map(_._2).distinct.size == 1 },
      "a sole-supplier late order must exist for the EXISTS to bite")
  }

  test("revenueShare == local scale-free share-threshold recompute; strict subset") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_extendedprice", "l_discount")
      .as[(Long, Double, Double)].collect().toSeq
    val rev = rows.groupBy(_._1).map { case (pk, xs) =>
      pk -> xs.map(x => BigInt(q100(x._2)) * (100L - q100(x._3))).sum
    }
    val total = rev.values.sum
    val n = BigInt(rev.size)
    val want = rev.toSeq.filter { case (_, r) => r * n * 4 > total * 5 }
      .map { case (pk, r) => (pk, r.toLong) }.sortBy(_._1)
    val got = RelOps.revenueShare(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(want.nonEmpty && want.size < rev.size,
      "the 1.25x-average share threshold must keep a strict non-empty subset")
  }

  test("cheapestSupplier == local argmin recompute through the nation census") {
    import spark.implicits._
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_nationkey").as[(Long, Int)].collect().toMap
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name").as[(Int, String)].collect().toMap
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_suppkey", "l_extendedprice")
      .as[(Long, Long, Double)].collect().toSeq
    val best = rows.groupBy(_._1).map { case (_, xs) =>
      xs.map(x => (q100(x._3), x._2)).min // (qprice, suppkey) lexicographic
    }
    val want = best.groupBy(b => nation(supp(b._2))).toSeq.map { case (n, xs) =>
      (n, xs.size.toLong, xs.map(x => BigInt(x._1)).sum.toLong)
    }.sortBy(_._1)
    val got = RelOps.cheapestSupplier(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.map(_._2).sum == rows.map(_._1).distinct.size,
      "every part must be counted exactly once across nations")
  }

  test("cheapestSupplier tie-break: equal minimum prices pick the smallest suppkey") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cheap-tie").toString
    Seq[(Long, Long, Double)](
      (1L, 5L, 10.0), (1L, 3L, 10.0), (1L, 7L, 20.0), // tie at 10.00 -> supp 3
      (2L, 7L, 5.0), (2L, 3L, 6.0))                   // plain min -> supp 7
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq[(Long, Int)]((3L, 0), (5L, 1), (7L, 1))
      .toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((0, "AAA"), (1, "BBB")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val got = RelOps.cheapestSupplier(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("AAA", 1L, 1000L), ("BBB", 1L, 500L)),
      "the tied minimum must resolve to the smallest suppkey (nation AAA)")
  }

  test("dominantSuppliers == local nested-aggregate recompute; strict non-empty subset") {
    import spark.implicits._
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_nationkey").as[(Long, Int)].collect().toMap
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name").as[(Int, String)].collect().toMap
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_suppkey", "l_quantity")
      .as[(Long, Long, Double)].collect().toSeq
    val ps = rows.groupBy(r => (r._1, r._2)).map { case ((pk, sk), xs) =>
      (pk, sk, xs.map(x => q100(x._3)).sum)
    }.toSeq
    val pt = ps.groupBy(_._1).map { case (pk, xs) =>
      pk -> (xs.map(_._3).sum, xs.size)
    }
    val dom = ps.filter { case (pk, _, q) =>
      val (tot, nsupp) = pt(pk)
      nsupp > 1 && BigInt(q) * nsupp > BigInt(2) * tot
    }
    val want = dom.groupBy(d => nation(supp(d._2))).toSeq.map { case (n, xs) =>
      (n, xs.map(_._2).distinct.size.toLong, xs.size.toLong)
    }.sortBy(_._1)
    val got = RelOps.dominantSuppliers(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(dom.nonEmpty && dom.size < ps.size,
      "the twice-fair-share predicate must keep a strict non-empty subset")
    assert(dom.exists { case (pk, _, _) => pt(pk)._2 > 2 },
      "dominance over a 3+-supplier part must occur (not just 2-supplier splits)")
  }

  test("revenueUnpivot round-trips the pivot: wide x 3 flags, zero cells survive") {
    val wide = RelOps.revenuePivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = wide.flatMap { case (n, a, nn, rr) =>
      Seq((n, "A", a), (n, "N", nn), (n, "R", rr))
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = RelOps.revenueUnpivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.size == wide.length * 3, "every wide row must fan out to exactly 3 long rows")
    assert(got.map(_._2).distinct.sorted == Seq("A", "N", "R"))
  }

  test("supplierDiversity == local NOT-IN + count-distinct recompute; the exclusion bites") {
    import spark.implicits._
    // sf0.01, not the suite's usual sf0.001: no supplier is in arrears at
    // sf0.001, so the NOT-IN leg would be vacuous there
    val sf01 = "/root/testdata/sf0.01"
    val parts = spark.read.parquet(s"$sf01/part.parquet")
      .selectExpr("p_partkey", "p_brand", "p_size")
      .as[(Long, String, Int)].collect().map(p => (p._1, (p._2, p._3))).toMap
    val arrears = spark.read.parquet(s"$sf01/supplier.parquet")
      .filter("s_acctbal < 0").selectExpr("s_suppkey").as[Long].collect().toSet
    val ps = spark.read.parquet(s"$sf01/lineitem.parquet")
      .selectExpr("l_partkey", "l_suppkey").as[(Long, Long)].collect()
    val sizes = Set(1, 9, 14, 19, 23, 36, 45, 49)
    def census(excl: Set[Long]) = ps.collect {
      case (pk, sk) if !excl.contains(sk) && parts.contains(pk) &&
        parts(pk)._1 != "Brand#45" && sizes.contains(parts(pk)._2) =>
        ((parts(pk)._1, parts(pk)._2.toLong), sk)
    }.groupBy(_._1).map { case (k, xs) => (k._1, k._2, xs.map(_._2).distinct.length.toLong) }
      .toSeq.sortBy(r => (-r._3, r._1, r._2))
    val want = census(arrears)
    val got = RelOps.supplierDiversity(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(arrears.nonEmpty, "no supplier in arrears — exclusion untested")
    assert(census(Set.empty).map(_._3).sum > want.map(_._3).sum,
      "the NOT-IN exclusion must strictly shrink some distinct count")
  }

  test("brandRevenue == local disjunctive-branch recompute; all three branches occur") {
    import spark.implicits._
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .selectExpr("p_partkey", "p_brand", "p_size")
      .as[(Long, String, Int)].collect().map(p => (p._1, (p._2, p._3))).toMap
    val lp = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .as[(Long, Double, Double, Double)].collect()
    def in(b: String, s0: Int, s1: Int, q0: Double, q1: Double,
           brand: String, size: Int, qty: Double) =
      brand == b && size >= s0 && size <= s1 && qty >= q0 && qty <= q1
    val want = lp.collect {
      case (pk, qty, price, disc) if parts.contains(pk) && {
        val (b, s) = parts(pk)
        in("Brand#12", 1, 20, 1, 11, b, s, qty) ||
          in("Brand#23", 1, 25, 10, 20, b, s, qty) ||
          in("Brand#4", 1, 15, 20, 30, b, s, qty)
      } => (parts(pk)._1, q100(qty), q100(price) * (100L - q100(disc)))
    }.groupBy(_._1).map { case (b, xs) =>
      (b, xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    val got = RelOps.brandRevenue(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.map(_._1) == Seq("Brand#12", "Brand#23", "Brand#4"),
      "all three disjunctive branches must be non-empty")
  }

  test("shipPriority/returnedCustomers/latenessPriority == local Q3/Q10/Q12 recomputes") {
    import spark.implicits._
    val ords = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey",
        "datediff(cast(o_orderdate as date), date'1970-01-01')", "o_orderpriority")
      .as[(Long, Long, Int, String)].collect().toSeq
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_name", "c_acctbal", "c_nationkey", "c_mktsegment")
      .as[(Long, String, Double, Int, String)].collect().toSeq
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name").as[(Int, String)].collect().toMap
    val om = ords.map(o => o._1 -> o).toMap
    def shipDay(us: Long): Long = us / 86400000000L // UTC, midnight-aligned
    def rev(l: (Long, Long, Double, Double, Double, Double, String, String, Long)): Long =
      q100(l._4) * (100L - q100(l._5))

    // Q3: building-segment orders placed before the cutoff, lines shipping after
    val cutDay = java.time.LocalDate.of(1998, 1, 1).toEpochDay
    val bld = cust.filter(_._5 == "BUILDING").map(_._1).toSet
    val q3 = li.filter(l => shipDay(l._9) > cutDay).flatMap { l =>
      om.get(l._1).filter(o => bld(o._2) && o._3 < cutDay)
        .map(o => ((l._1, o._3.toLong, o._4), rev(l)))
    }.groupBy(_._1).toSeq.map { case ((k, d, p), xs) =>
      (k, d, p, xs.map(x => BigInt(x._2)).sum.toLong)
    }.sortBy(r => (-r._4, r._2, r._1)).take(10)
    val dfQ3 = RelOps.shipPriority(spark, sf)
    val gotQ3 = dfQ3.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(gotQ3 == q3)
    assert(q3.size == 10 && q3.map(_._4).distinct.size > 1)
    assert(dfQ3.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "the top-10 must plan as a bounded take (per-partition heaps), never a global sort")

    // Q10: returned revenue per customer in 1997-Q4, top 20, dims joined after
    val (qlo, qhi) = (java.time.LocalDate.of(1997, 10, 1).toEpochDay,
      java.time.LocalDate.of(1998, 1, 1).toEpochDay)
    val q10 = li.filter(_._7 == "R").flatMap { l =>
      om.get(l._1).filter(o => o._3 >= qlo && o._3 < qhi).map(o => (o._2, rev(l)))
    }.groupBy(_._1).toSeq.map { case (ck, xs) => (ck, xs.map(x => BigInt(x._2)).sum.toLong) }
      .sortBy(r => (-r._2, r._1)).take(20).map { case (ck, r) =>
        val c = cust.find(_._1 == ck).get
        (ck, c._2, q100(c._3), nation(c._4), r)
      }
    val gotQ10 = RelOps.returnedCustomers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getLong(4))).toSeq
    assert(gotQ10 == q10)
    assert(q10.size == 20)

    // Q12: lateness class x priority criticality counts
    val q12 = li.map { l =>
      val o = om(l._1)
      val days = shipDay(l._9) - o._3
      val cls = if (days <= 30) "FAST" else if (days <= 90) "NORMAL" else "SLOW"
      (cls, o._4 == "1-URGENT" || o._4 == "2-HIGH")
    }.groupBy(_._1).toSeq.map { case (cls, xs) =>
      (cls, xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }.sortBy(_._1)
    val gotQ12 = RelOps.latenessPriority(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotQ12 == q12)
    assert(q12.map(_._1) == Seq("FAST", "NORMAL", "SLOW"),
      "all three latency classes must occur")
  }

  test("marketShare/partProfit == local Q8/Q9 recomputes; share non-degenerate, losses occur") {
    import spark.implicits._
    val ords = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "year(o_orderdate)")
      .as[(Long, Long, Int)].collect().map(o => o._1 -> (o._2, o._3.toLong)).toMap
    val custNat = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "c_nationkey").as[(Long, Int)].collect().toMap
    val natName = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_name").as[(Int, String)].collect().toMap
    val natRegion = spark.read.parquet(s"$sf/nation.parquet")
      .selectExpr("n_nationkey", "n_regionkey").as[(Int, Int)].collect().toMap
    val regionName = spark.read.parquet(s"$sf/region.parquet")
      .selectExpr("r_regionkey", "r_name").as[(Int, String)].collect().toMap
    val supNat = spark.read.parquet(s"$sf/supplier.parquet")
      .selectExpr("s_suppkey", "s_nationkey").as[(Long, Int)].collect().toMap
    val partRed = spark.read.parquet(s"$sf/part.parquet")
      .selectExpr("p_partkey", "p_name", "p_retailprice")
      .as[(Long, String, Double)].collect()
      .filter(_._2.contains("red")).map(p => p._1 -> q100(p._3)).toMap
    // Q8: ASIA market, NATION_12 supplier share per order year
    val q8 = li.filter(l => regionName(natRegion(custNat(ords(l._1)._1))) == "ASIA")
      .map { l =>
        val r = BigInt(q100(l._4) * (100L - q100(l._5)))
        (ords(l._1)._2, if (natName(supNat(l._2)) == "NATION_12") r else BigInt(0), r)
      }.groupBy(_._1).toSeq.map { case (y, xs) =>
        val (num, den) = (xs.map(_._2).sum.toLong, xs.map(_._3).sum.toLong)
        (y, num, den, num * 1000L / den)
      }.sortBy(_._1)
    val gotQ8 = RelOps.marketShare(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotQ8 == q8)
    // sf0.001's thin boundary year (2001 stops in August) can miss
    // NATION_7 entirely, so pin non-degeneracy on MOST years, not all
    assert(q8.count(r => r._2 > 0L && r._2 < r._3) >= q8.size - 1 && q8.size >= 5,
      "the share must be non-degenerate (neither 0 nor the whole market) in all but at most one year")

    // Q9: red-part profit per (supplier nation, order year) — re-read the
    // lines WITH partkey (the shared li fixture doesn't carry it)
    val liFull = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    val want9 = liFull.flatMap { l =>
      partRed.get(l._3).map { qretail =>
        val profit = BigInt(q100(l._5) * (100L - q100(l._6))) - BigInt(qretail) * q100(l._4)
        ((natName(supNat(l._2)), ords(l._1)._2), profit)
      }
    }.groupBy(_._1).toSeq.map { case ((n, y), xs) =>
      (n, y, xs.size.toLong, xs.map(_._2).sum.toLong)
    }.sortBy(r => (r._1, r._2))
    val gotQ9 = RelOps.partProfit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotQ9 == want9)
    // individual LINES lose money against retail cost (so the subtraction
    // genuinely bites both ways), even though every (nation, year) cell
    // nets positive on this data
    val lineProfits = liFull.flatMap { l =>
      partRed.get(l._3).map(qr => BigInt(q100(l._5) * (100L - q100(l._6))) - BigInt(qr) * q100(l._4))
    }
    assert(lineProfits.exists(_ < 0) && lineProfits.exists(_ > 0),
      "line-level profits must carry both signs")
    assert(want9.nonEmpty && want9.map(_._1).distinct.size >= 5,
      "several supplier nations must appear")
  }

  test("benford == local first-digit recompute; permille shares sum to ~1000 per flag") {
    val want = li.map(l => (l._7, q100(l._4).toString.take(1)))
      .groupBy(identity).map { case ((f, d), xs) => ((f, d), xs.size.toLong) }
    val tots = want.groupBy(_._1._1).map { case (f, m) => (f, m.values.sum) }
    val rows = want.toSeq.map { case ((f, d), n) =>
      (f, d, n, n * 1000L / tots(f))
    }.sortBy(r => (r._1, r._2))
    val got = RelOps.benford(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == rows)
    // real prices spread over several leading digits, and truncating
    // permilles must sum close to (but never over) 1000 per flag
    assert(rows.map(_._2).distinct.size >= 5)
    rows.groupBy(_._1).foreach { case (f, rs) =>
      val s = rs.map(_._4).sum
      assert(s <= 1000L && s > 1000L - rs.size, s"flag $f permille sum $s")
    }
  }
}

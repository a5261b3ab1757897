package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** autoThresholds must select EXACT order statistics — equal to a local
  * full sort of the value column — without any global sort in the plan
  * (two-pass bucketed selection).
  */
class StatsOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("autoThresholds == k-th order statistics of a local full sort") {
    import spark.implicits._
    val values = spark.read.parquet(s"$sf/events.parquet")
      .select("value").as[Double].collect().sorted
    val n = values.length
    val expected = StatsOps.Qs.map { q =>
      val k = math.floor(q * (n - 1).toDouble).toLong + 1L
      (q, k, values((k - 1).toInt))
    }
    val got = StatsOps.autoThresholds(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
    // order statistics are monotone in q, and each is an actual data value
    assert(got.map(_._3) == got.map(_._3).sorted)
    val vset = values.toSet
    assert(got.forall(r => vset.contains(r._3)))
  }

  test("topEvents == local full-sort top-k; plan uses TakeOrderedAndProject on candidates") {
    import spark.implicits._
    val all = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "value").as[(Long, Double)].collect()
    val expected = all.sortBy { case (id, v) => (-v, id) }.take(StatsOps.TopK)
      .zipWithIndex.map { case ((id, v), i) => (i + 1L, id, v) }.toSeq
    val df = StatsOps.topEvents(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
    // the candidate set is selected by bucket cutoff and ranked through
    // TakeOrderedAndProject — never a full sort of the table
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert("""Sort \[value[^\]]*\], true""".r.findFirstIn(plan).isEmpty, plan.take(800))
  }

  test("autoThresholds plan has no global sort of the value column") {
    // scale contract: the k-th order statistics must come from the
    // bucketed two-pass selection, never a global sort of the data. A
    // global sort materializes as `Sort [...], true` (global=true) fed by
    // an `Exchange rangepartitioning(...)`; the ONLY one allowed here is
    // the 4-row presentation orderBy("q"). The window rank must sort
    // locally (global=false) within hash-partitioned buckets.
    val plan = StatsOps.autoThresholds(spark, sf).queryExecution.executedPlan.toString
    val globalSorts = """Sort \[([^\]]*)\], true""".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(globalSorts.nonEmpty, plan.take(800)) // the presentation sort exists...
    globalSorts.foreach { keys => // ...and no global sort touches value or bkt
      assert(!keys.contains("value") && !keys.contains("bkt"),
        s"global sort over data columns: [$keys]\n${plan.take(800)}")
    }
    assert(!plan.contains("rangepartitioning(value"), plan.take(800))
    // the rank window sorts locally within bucket partitions
    assert(plan.contains("Window"), plan.take(800))
    assert("""Sort \[bkt[^\]]*\], false""".r.findFirstIn(plan).isDefined,
      plan.take(800))
    assert(plan.contains("hashpartitioning(bkt"), plan.take(800))
  }

  test("groupQuantiles == per-source local full-sort order statistics") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "cast(n_chars as long)").as[(String, Long)].collect()
    val expected = rows.groupBy(_._1).map { case (src, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      (src, n.toLong, sorted(((n - 1) / 2).toInt), sorted(((9 * (n - 1)) / 10).toInt))
    }.toSeq.sortBy(_._1)
    val got = StatsOps.groupQuantiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(expected.length > 1, "multiple sources expected")
    assert(expected.forall(r => r._3 <= r._4), "p50 <= p90")
  }

  test("madStats == per-type local full-sort low-median-of-deviations") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "cast(floor(value * 1048576.0) as long)")
      .as[(String, Long)].collect()
    def lowMed(xs: Seq[Long]): Long = xs.sorted.apply(((xs.length - 1) / 2).toInt)
    val expected = rows.groupBy(_._1).map { case (t, xs) =>
      val qs = xs.map(_._2).toSeq
      val med = lowMed(qs)
      (t, qs.length.toLong, med, lowMed(qs.map(q => math.abs(q - med))))
    }.toSeq.sortBy(_._1)
    val got = StatsOps.madStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(expected.length > 1 && expected.forall(_._4 > 0L),
      "every type should have nonzero spread")
  }

  test("cmsSketch == local cell recompute; point queries overestimate (theorem)") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def colOf(i: Int, u: Long): Long =
      java.lang.Long.parseLong(md5hex(s"cms$i#" + u).take(15), 16) % 64L
    val uids = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").as[Long].collect()
    val expected = uids.flatMap(u => Seq((0L, colOf(0, u)), (1L, colOf(1, u))))
      .groupBy(identity).map { case ((r, c), xs) => (r, c, xs.length.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = StatsOps.cmsSketch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // CMS theorem: for every user, min over rows of its cell >= true count
    val cells = expected.map(t => (t._1, t._2) -> t._3).toMap
    val truth = uids.groupBy(identity).view.mapValues(_.length.toLong)
    truth.foreach { case (u, n) =>
      val est = math.min(cells((0L, colOf(0, u))), cells((1L, colOf(1, u))))
      assert(est >= n, s"user $u: est $est < true $n")
    }
  }

  test("hllRegisters == local md5 register recompute; estimate within HLL error") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val uids = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").as[Long].collect()
    val expected = uids.map { u =>
      val h = java.lang.Long.parseLong(md5hex("hll#" + u).take(15), 16)
      val rest = h / 64
      (h % 64, if (rest == 0L) 55L else 55L - java.lang.Long.toBinaryString(rest).length)
    }.groupBy(_._1).map { case (b, rs) =>
      (b, rs.map(_._2).max, rs.length.toLong)
    }.toSeq.sortBy(_._1)
    val got = StatsOps.hllRegisters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // the registers ARE the contract; still sanity-check that the classic
    // harmonic estimate they induce lands near the true distinct count
    // (HLL standard error at m = 64 is ~13%; allow 3 sigma)
    val m = 64
    val regs = Array.fill(m)(0L)
    got.foreach { case (b, r, _) => regs(b.toInt) = r }
    val z = 1.0 / regs.map(r => math.pow(2.0, -r.toDouble)).sum
    val raw = 0.709 * m * m * z
    val zeros = regs.count(_ == 0L)
    val est = if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
    val truth = uids.distinct.length.toDouble
    assert(math.abs(est - truth) / truth < 0.40, s"est $est vs $truth")
  }
}

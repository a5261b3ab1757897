package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Sessionization and as-of join vs independent single-threaded
  * recomputes on the collected events, plus the data premise the as-of
  * oracle equivalence rests on (unique (user_id, ts)).
  */
class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val ev: Array[(Long, Long, Long, String, Double)] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "unix_micros(cast(ts as timestamp))", "user_id", "event_type", "value")
      .as[(Long, Long, Long, String, Double)].collect()
  }

  test("(user_id, ts) is unique at EVERY sf — the as-of oracle's tie-free premise") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val dup = spark.read.parquet(s"$dir/events.parquet")
        .groupBy("user_id", "ts").count().filter(org.apache.spark.sql.functions.col("count") > 1)
        .count()
      assert(dup == 0L, s"duplicate (user_id, ts) at $dir")
    }
  }

  test("ripleyK matches a local all-pairs recompute at every radius") {
    val pts = ev.filter(_._4 == "click")
      .map(e => (e._1, e._1 % 100, e._1 / 100))
    val n = pts.length.toLong
    val area = ev.length.toLong
    val want = EventOps.RipleyRadii.map { r =>
      var np = 0L; var d2s = 0L
      for (a <- pts; b <- pts if a._1 != b._1) {
        val d2 = (b._2 - a._2) * (b._2 - a._2) + (b._3 - a._3) * (b._3 - a._3)
        if (d2 <= r * r) { np += 1; d2s += d2 }
      }
      (r, np, d2s, n, np * area * 1000L / (n * (n - 1)))
    }
    val got = EventOps.ripleyK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // the estimator must be monotone in r and nondegenerate: pairs exist
    // at the smallest radius, and khat grows with the disc
    assert(want.head._2 > 0L, "pairs must exist at r=2")
    assert(want.map(_._5) == want.map(_._5).sorted, "khat monotone in r")
    // plan contract: the pair joins are bucket-keyed EQUI hash joins
    // (never a point-pair cartesian); the only nested-loop crosses are
    // the bounded broadcasts (9-row offsets, 1-row scalars)
    val plan = EventOps.ripleyK(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "no cartesian pair join")
    // stable pattern (ADVICE r05): any HashJoin variant keyed on the
    // bucket columns, not a literal plan-string prefix
    assert("HashJoin.*\\[?bx".r.findFirstIn(plan).isDefined,
      "bucket equi-join expected")
  }

  test("nndCensus matches a local nearest-neighbor recompute with the r=10 censor") {
    val pts = ev.filter(_._4 == "click")
      .map(e => (e._1, e._1 % 100, e._1 / 100))
    val perPoint = pts.map { a =>
      val ds = pts.iterator.filter(_._1 != a._1)
        .map(b => (b._2 - a._2) * (b._2 - a._2) + (b._3 - a._3) * (b._3 - a._3))
        .filter(_ <= 100L)
      (a._1, if (ds.isEmpty) None else Some(ds.min))
    }
    val want = perPoint.groupBy {
      case (_, None) => -1L
      case (_, Some(d2)) => java.lang.Long.toBinaryString(d2).length.toLong - 1L
    }.toSeq.map { case (b, ps) =>
      val d2s = ps.flatMap(_._2)
      (b, ps.size.toLong, d2s.sum, ps.map(_._1).sum,
        if (d2s.isEmpty) null else java.lang.Long.valueOf(d2s.max))
    }.sortBy(_._1)
    val got = EventOps.nndCensus(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4)))).toSeq
    assert(got == want)
    assert(want.map(_._2).sum == pts.length.toLong, "every click site folds")
  }

  test("nndCensus censors isolated points into bucket -1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nnd-cens").toString
    // three clicks pairwise farther than 10 apart (ids 0, 50, 5000 ->
    // sites (0,0), (50,0), (0,50)) plus a non-click that must not count
    Seq((0L, "click"), (50L, "click"), (5000L, "click"), (1L, "view"))
      .toDF("event_id", "event_type").write.parquet(s"$dir/events.parquet")
    val got = EventOps.nndCensus(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4)))).toSeq
    assert(got == Seq((-1L, 3L, 0L, 5050L, null)))
  }

  test("temporalRipley matches a local all-pairs recompute at every tau") {
    val span = ev.map(_._2).max - ev.map(_._2).min + 1L
    val byType = ev.groupBy(_._4)
    val want = (for {
      (etype, es) <- byType.toSeq
      tauS <- Seq(60L, 600L, 3600L)
    } yield {
      val tau = tauS * 1000000L
      var np = 0L; var dts = 0L
      for (a <- es; b <- es if a._1 != b._1) {
        val dt = math.abs(b._2 - a._2)
        if (dt <= tau) { np += 1; dts += dt }
      }
      val n = es.length.toLong
      val ratio = (BigInt(np) * span * 1000 /
        (BigInt(n) * (n - 1) * (2000000L * tauS))).toLong
      (etype, tauS, np, dts, n, ratio)
    }).filter(_._3 > 0L) // zero-pair (type, tau) rows DROP (stated)
      .sortBy(r => (r._1, r._2))
    val got = EventOps.temporalRipley(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // pairs must exist at the smallest window and grow with tau per type
    assert(want.filter(_._2 == 60L).exists(_._3 > 0L))
    for ((_, rows) <- want.groupBy(_._1))
      assert(rows.sortBy(_._2).map(_._3) == rows.map(_._3).sorted,
        "pair counts monotone in tau")
  }

  test("crossK matches a local cross-type all-pairs recompute") {
    val clicks = ev.filter(_._4 == "click").map(_._2)
    val buys = ev.filter(_._4 == "purchase").map(_._2)
    val want = Seq(600L, 3600L).flatMap { tauS =>
      val tau = tauS * 1000000L
      var np = 0L; var lead = 0L; var dts = 0L
      for (a <- clicks; b <- buys) {
        val dt = math.abs(b - a)
        if (dt <= tau) { np += 1; if (b > a) lead += 1; dts += dt }
      }
      if (np > 0) Seq((tauS, np, lead, dts)) else Seq.empty
    }
    val got = EventOps.crossK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // pairs exist at the bigger window, and lead stays a proper subset
    assert(want.exists(_._2 > 0L))
    assert(want.forall(r => r._3 <= r._2))
  }

  test("morisita matches a local quadrat recompute") {
    val clicks = ev.filter(_._4 == "click").map(_._1)
    val byQuad = clicks.groupBy(id => ((id % 100) / 10, id / 100 / 10))
      .map(_._2.length.toLong).toSeq
    val n = byQuad.sum
    val pairs = byQuad.map(c => c * (c - 1)).sum
    val qTotal = ev.length.toLong / 100
    val mor = qTotal * pairs * 1000L / (n * (n - 1))
    val want = byQuad.groupBy(c => java.lang.Long.toBinaryString(c).length.toLong - 1L)
      .toSeq.map { case (b, cs) =>
        (b, cs.size.toLong, cs.sum, cs.max, byQuad.size.toLong, qTotal, mor)
      }.sortBy(_._1)
    val got = EventOps.morisita(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    // a CSR-ish synthetic scatter: the index must land in a sane band
    // around 1000, not collapse to a degenerate 0
    assert(mor > 500L && mor < 2000L, s"morisita=$mor out of band")
  }

  test("joinCount matches a local rook-adjacency recompute") {
    val z = ev.map(e => e._1 -> (if (e._4 == "click") 1L else 0L)).toMap
    val ids = ev.map(_._1)
    val edges = ids.flatMap { id =>
      val right = if (id % 100 < 99 && z.contains(id + 1)) Seq((z(id), z(id + 1))) else Seq.empty
      val down = if (z.contains(id + 100)) Seq((z(id), z(id + 100))) else Seq.empty
      right ++ down
    }
    val nBlack = z.values.sum
    val want = edges.groupBy(e => e._1 + e._2).toSeq.map { case (k, es) =>
      (k, es.length.toLong, nBlack, ids.length.toLong)
    }.sortBy(_._1)
    val got = EventOps.joinCount(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // all three keys must appear (black and white sites both exist and mix)
    assert(want.map(_._1) == Seq(0L, 1L, 2L))
  }

  test("fano matches a local dispersion recompute") {
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val perUser = ev.groupBy(_._3).toSeq.map { case (user, es) =>
      val counts = es.groupBy(e => ((e._2 - mn) * 64L) / (mx - mn + 1L))
        .map(_._2.size.toLong)
      val n = counts.sum
      val s2 = counts.map(c => c * c).sum
      (user, n, ((64L * s2 - n * n) * 1000L) / (64L * n))
    }
    val want = perUser
      .groupBy(c => java.lang.Long.toBinaryString(c._3 + 1).length.toLong - 1)
      .toSeq.map { case (b, cs) =>
        (b, cs.size.toLong, cs.map(_._2).sum, cs.map(_._1).sum, cs.map(_._3).max)
      }.sortBy(_._1)
    val got = EventOps.fano(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    assert(perUser.forall(_._3 >= 0L), "Fano is non-negative by Cauchy-Schwarz")
    assert(perUser.map(_._3).distinct.size > 1, "dispersion must spread across users")
  }

  test("userSimpson matches a local exact-rational recompute") {
    val perUser = ev.groupBy(_._3).toSeq
      .map { case (user, es) =>
        val counts = es.groupBy(_._4).map(_._2.size.toLong)
        val n = counts.sum
        (user, n, counts.map(c => c * (c - 1L)).sum)
      }
      .filter(_._2 >= 2L)
      .map { case (user, n, num) => (user, n, num * 1000000L / (n * (n - 1L))) }
    val want = perUser.groupBy(_._3 / 100000L).toSeq.map { case (d, cs) =>
      (d, cs.size.toLong, cs.map(_._2).sum, cs.map(_._1).sum, cs.map(_._3).max)
    }.sortBy(_._1)
    val got = EventOps.userSimpson(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // the synthetic type mix must give a non-degenerate concentration
    assert(perUser.map(_._3).distinct.size > 1, "index must spread across users")
  }

  test("sessionize matches a local recompute") {
    val expected = ev.groupBy(_._3).toSeq.flatMap { case (user, es) =>
      val sorted = es.sortBy(e => (e._2, e._1))
      var idx = 0L
      var prev = Long.MinValue
      val tagged = sorted.map { e =>
        if (prev == Long.MinValue || e._2 - prev > 1800000000L) idx += 1
        prev = e._2
        (idx, e)
      }
      tagged.groupBy(_._1).map { case (si, ses) =>
        val us = ses.map(_._2._2)
        val qv = ses.map(s => math.floor(s._2._5 * 1048576.0).toLong)
        (user, si, ses.size.toLong, us.min, us.max, qv.sum)
      }
    }.toSet
    val got = EventOps.sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("asofViewPurchase matches a local recompute") {
    val expected = ev.groupBy(_._3).toSeq.flatMap { case (user, es) =>
      val sorted = es.sortBy(e => (e._2, e._1))
      var lastView: Option[(Long, Long)] = None // (event_id, us)
      sorted.flatMap { e =>
        val out = if (e._4 == "purchase")
          lastView.map(v => (e._1, user, e._2, v._1, v._2, e._2 - v._2)) else None
        if (e._4 == "view") lastView = Some((e._1, e._2))
        out
      }
    }.toSet
    val got = EventOps.asofViewPurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("windowJoin matches a local brute-force range count") {
    val views = ev.filter(_._4 == "view")
    val expected = ev.filter(_._4 == "purchase").map { p =>
      val n = views.count(v =>
        v._3 == p._3 && v._2 >= p._2 - 86400000000L && v._2 < p._2)
      (p._1, n.toLong)
    }.sortBy(_._1).toSeq
    val got = EventOps.windowJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(expected.exists(_._2 > 0), "some purchase must have prior views")
    assert(expected.exists(_._2 == 0), "some purchase must have none (left-join path)")
    // scale contract: the range join must run as a (user, bucket)
    // EQUI-join — never a nested loop driven by the range predicate
    val plan = EventOps.windowJoin(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("funnel matches a local staged-sequencing recompute") {
    val expected = ev.groupBy(e => (e._3, e._2 / 86400000000L)).toSeq.map {
      case ((user, day), evs) =>
        // the ordered view -> click -> purchase ladder within the day
        val t1 = evs.filter(_._4 == "view").map(_._2).minOption
        val t2 = t1.flatMap(t => evs.filter(e => e._4 == "click" && e._2 >= t).map(_._2).minOption)
        val t3 = t2.flatMap(t => evs.filter(e => e._4 == "purchase" && e._2 >= t).map(_._2).minOption)
        val stage = if (t3.isDefined) 3L else if (t2.isDefined) 2L else if (t1.isDefined) 1L else 0L
        (user, day, evs.length.toLong, stage)
    }.sortBy(r => (r._1, r._2))
    val got = EventOps.funnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(Set(0L, 1L, 2L, 3L).subsetOf(expected.map(_._4).toSet),
      "every funnel stage must occur in the corpus")
  }

  test("retention matches a local recompute") {
    val perDay = ev.groupBy(e => (e._3, e._2 / 86400000000L)).toSeq
      .map { case ((u, d), es) => (u, d, es.length.toLong) }
    val firstDay = perDay.groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).min }
    val expected = perDay.groupBy { case (u, d, _) => (firstDay(u), d - firstDay(u)) }
      .map { case ((cd, off), rows) => (cd, off, rows.size.toLong, rows.map(_._3).sum) }
      .toSet
    val got = EventOps.retention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    // offset-0 row count per cohort = cohort size: every user's first day
    // lands there, so the sum over offset-0 n_users = distinct users
    assert(expected.filter(_._2 == 0L).map(_._3).sum == firstDay.size.toLong)
    assert(expected.exists(_._2 > 0L), "some user must return on a later day")
  }

  test("concurrency matches a local sweep-line recompute") {
    // sessions under the same gap rule as the sessionize test
    val sessions = ev.groupBy(_._3).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._1))
      var idx = 0L
      var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e._2 - prev > 1800000000L) idx += 1
        prev = e._2
        (idx, e._2)
      }.groupBy(_._1).values.map(ses => (ses.map(_._2).min, ses.map(_._2).max))
    }
    val deltas = (sessions.map(s => (s._1, 1L)) ++ sessions.map(s => (s._2 + 1L, -1L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var run = 0L
    val expected = deltas.map { case (t, d) => run += d; (t / 3600000000L, run) }
      .groupBy(_._1).toSeq
      .map { case (b, rs) => (b, rs.size.toLong, rs.map(_._2).max) }
      .sortBy(_._1)
    val got = EventOps.concurrency(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(expected.exists(_._3 > 1L), "overlapping sessions must occur")
  }

  test("coverage matches a local union-of-intervals recompute; overlap genuinely collapses") {
    val dayUs = 86400000000L
    val sessions = ev.groupBy(_._3).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._1))
      var idx = 0L
      var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e._2 - prev > 1800000000L) idx += 1
        prev = e._2
        (idx, e._2)
      }.groupBy(_._1).values.map(ses => (ses.map(_._2).min, ses.map(_._2).max + 1L))
    }
    // split at day boundaries, then sweep per day over collapsed instants
    val pieces = sessions.flatMap { case (s, e) =>
      (s / dayUs to (e - 1) / dayUs).map { day =>
        (day, math.max(s, day * dayUs), math.min(e, (day + 1) * dayUs))
      }
    }
    val expected = pieces.groupBy(_._1).toSeq.map { case (day, ps) =>
      val deltas = (ps.map(p => (p._2, 1L)) ++ ps.map(p => (p._3, -1L)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      var run = 0L; var covered = 0L; var islands = 0L
      deltas.zipAll(deltas.tail.map(d => Some(d._1)), (0L, 0L), None).foreach {
        case ((t, d), next) =>
          val prevRun = run
          run += d
          if (run > 0L && prevRun == 0L) islands += 1
          next.foreach(nt => if (run > 0L) covered += nt - t)
      }
      (day, deltas.size.toLong, covered, islands)
    }.sortBy(_._1)
    val got = EventOps.coverage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the union must genuinely collapse overlap somewhere (covered < sum
    // of piece lengths), and some day must split into multiple islands
    val rawByDay = pieces.groupBy(_._1).view.mapValues(_.map(p => p._3 - p._2).sum)
    assert(expected.exists(d => d._3 < rawByDay(d._1)), "no overlap ever collapsed")
    assert(expected.exists(_._4 > 1L), "expected a day with multiple busy islands")
  }

  test("timeWeighted matches a local step-integral recompute") {
    val expected = ev.groupBy(_._3).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._1))
      sorted.zip(sorted.tail).map { case (cur, nxt) =>
        val qv = math.floor(cur._5 * 1048576.0).toLong
        val durS = (nxt._2 - cur._2) / 1000000L
        (u, cur._2 / 86400000000L, durS, qv * durS)
      }.groupBy(t => (t._1, t._2)).map { case ((uu, d), xs) =>
        (uu, d, xs.size.toLong, xs.map(_._3).sum, xs.map(_._4).sum)
      }
    }.toSet
    val got = EventOps.timeWeighted(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    assert(expected.exists(_._5 != 0L))
  }

  test("cubeStats covers all four grouping sets consistently") {
    val rows = EventOps.cubeStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.filter(r => r._1 == "(all)" && r._2 == -1L)
    assert(total.length == 1 && total.head._3 == ev.length.toLong)
    val byType = rows.filter(r => r._1 != "(all)" && r._2 == -1L)
    val byDay = rows.filter(r => r._1 == "(all)" && r._2 != -1L)
    val fine = rows.filter(r => r._1 != "(all)" && r._2 != -1L)
    assert(byType.map(_._3).sum == ev.length.toLong)
    assert(byDay.map(_._3).sum == ev.length.toLong)
    assert(fine.map(_._3).sum == ev.length.toLong)
    assert(byType.map(_._4).sum == total.head._4 && fine.map(_._4).sum == total.head._4)
  }

  test("sessionOverlaps matches a local quadratic interval join") {
    val sessions = ev.groupBy(_._3).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._1))
      var idx = 0L
      var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e._2 - prev > 1800000000L) idx += 1
        prev = e._2
        (idx, e._2)
      }.groupBy(_._1).map { case (si, ses) =>
        (u, si, ses.map(_._2).min, ses.map(_._2).max)
      }
    }
    val expected = sessions.map { a =>
      val n = sessions.count(b => b._1 != a._1 && a._3 <= b._4 && b._3 <= a._4)
      (a._1, a._2, n.toLong)
    }.toSet
    val got = EventOps.sessionOverlaps(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(expected.exists(_._3 > 0L), "overlapping sessions must occur")
    assert(expected.exists(_._3 == 0L), "isolated sessions must occur (left-join path)")
  }

  test("jsonExtract matches a local JSON-field recompute") {
    import spark.implicits._
    val props = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "props").as[(String, String)].collect()
    val re = """"k":\s*(-?\d+)""".r
    val expected = props.groupBy(_._1).map { case (t, rows) =>
      val ks = rows.flatMap(r => re.findFirstMatchIn(r._2).map(_.group(1).toLong))
      (t, rows.length.toLong, ks.length.toLong, ks.sum, ks.min, ks.max,
        ks.distinct.length.toLong)
    }.toSet
    val got = EventOps.jsonExtract(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("outliers matches a BigInt local recompute") {
    val expected = ev.groupBy(_._3).toSeq.map { case (u, es) =>
      val qs = es.map(e => math.floor(e._5 * 1048576.0).toLong)
      val n = BigInt(qs.length)
      val s = qs.map(BigInt(_)).sum
      val ss = qs.map(q => BigInt(q) * q).sum
      val flags = qs.count { q => val d = n * q - s; d * d > 9 * (n * ss - s * s) }
      (u, qs.length.toLong, flags.toLong, qs.sum)
    }.toSet
    val got = EventOps.outliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(expected.exists(_._3 > 0L), "some user must have an outlier event")
    assert(expected.exists(r => r._3 == 0L && r._2 > 1L),
      "some multi-event user must have none (exact-comparison path)")
  }

  test("cusum matches an exact local recompute (BigInt, smallest-k tie-break)") {
    val expected = ev.groupBy(_._3).toSeq.flatMap { case (u, es) =>
      val qs = es.sortBy(_._2).map(e => BigInt(math.floor(e._5 * 1048576.0).toLong))
      val n = qs.length
      if (n < 2) None
      else {
        val s = qs.sum
        val prefix = qs.scanLeft(BigInt(0))(_ + _).tail // P_1..P_n
        val stats = (1 until n).map(k =>
          ((BigInt(n) * prefix(k - 1) - BigInt(k) * s).abs, k.toLong))
        val m = stats.map(_._1).max
        Some((u, n.toLong, m.toLong, stats.filter(_._1 == m).map(_._2).min))
      }
    }.toSet
    val got = EventOps.cusum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(expected.forall(r => r._4 >= 1L && r._4 < r._2), "k_at_max is interior")
    assert(expected.exists(_._3 > 0L), "a nonzero change-point statistic exists")
  }

  test("spearman matches an exact local rank recompute (stated total-order tie-breaks)") {
    val expected = ev.groupBy(_._4).toSeq.map { case (etype, es) =>
      val rows = es.map(e => (e._2, e._1, math.floor(e._5 * 1048576.0).toLong))
      val rt = rows.sortBy(r => (r._1, r._2)).zipWithIndex
        .map { case (r, i) => r._2 -> (i + 1L) }.toMap
      val rv = rows.sortBy(r => (r._3, r._1, r._2)).zipWithIndex
        .map { case (r, i) => r._2 -> (i + 1L) }.toMap
      val sd2 = rows.map { r => val d = BigInt(rt(r._2) - rv(r._2)); d * d }.sum
      val n = rows.length
      val den = BigInt(n) * (BigInt(n) * n - 1)
      (etype, n.toLong, ((den - 6 * sd2) * 1000000 / den).toLong)
    }.sortBy(_._1)
    val got = EventOps.spearman(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // rho must be a genuine fraction, not a degenerate +-1e6 or untouched 0
    assert(expected.forall(r => math.abs(r._3) < 1000000L))
    assert(expected.exists(_._3 != 0L))
  }

  test("spike matches an exact local recompute; both burst and quiet hours exist") {
    // hour-of-day from the wall-clock ts string, like hour(ts::TIMESTAMP)
    val evH = {
      import spark.implicits._
      spark.read.parquet(s"$sf/events.parquet")
        .selectExpr("event_type", "hour(cast(ts as timestamp))")
        .as[(String, Int)].collect()
    }
    val expected = evH.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      val byHr = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val total = rows.size.toLong
      val nh = byHr.size.toLong
      byHr.toSeq.map { case (hr, cnt) =>
        (et, hr.toLong, cnt, cnt * (nh - 1) * 1000000L / (total - cnt))
      }
    }.sortBy(r => (r._1, r._2))
    val got = EventOps.spike(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(expected.exists(_._4 > 1000000L) && expected.exists(_._4 < 1000000L),
      "both above- and below-mean hours must exist")
  }

  test("gaps matches an exact local recompute (power-of-two buckets, bin() rule)") {
    val expected = ev.groupBy(_._4).toSeq.flatMap { case (et, es) =>
      val sorted = es.sortBy(e => (e._2, e._1))
      val gs = sorted.zip(sorted.tail).map { case (a, b) => b._2 - a._2 }
      gs.groupBy(g => 63 - java.lang.Long.numberOfLeadingZeros(g + 1))
        .toSeq.map { case (bkt, grp) =>
          (et, bkt.toLong, grp.size.toLong, grp.min, grp.max, grp.sum)
        }
    }.sortBy(r => (r._1, r._2))
    val got = EventOps.gaps(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    assert(expected.map(_._1).distinct.size > 1 && expected.size > 10,
      "several types and several buckets must appear")
  }

  test("dau7 and lifespan match exact local recomputes") {
    import spark.implicits._
    val ud = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "cast(to_date(cast(ts as timestamp)) as string)")
      .as[(Long, String)].collect().distinct
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    def plus(day: String, i: Int) = java.time.LocalDate.parse(day, fmt).plusDays(i).format(fmt)

    val cov = ud.flatMap { case (u, d) => (0 to 6).map(i => (u, plus(d, i))) }.distinct
    val d7 = cov.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val d1 = ud.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val wantDau = d7.toSeq.map { case (day, n7) => (day, d1.getOrElse(day, 0L), n7) }
      .sortBy(_._1)
    val gotDau = EventOps.dau7(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotDau == wantDau)
    assert(wantDau.exists(_._2 == 0L), "trailing-only days (dau1 = 0) must appear")

    val wantLife = ud.groupBy(_._1).toSeq.map { case (u, ds) =>
      val days = ds.map(_._2).sorted
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(days.head, fmt),
        java.time.LocalDate.parse(days.last, fmt)) + 1
      (u, days.head, days.last, days.size.toLong, span, days.size * 1000L / span)
    }.sortBy(_._1)
    val gotLife = EventOps.lifespan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(gotLife == wantLife)
    assert(wantLife.exists(r => r._4 < r._5), "a user with inactive days must exist")
  }

  test("trend matches an exact local least-squares recompute; slopes go both ways") {
    val expected = ev.groupBy(_._3).toSeq.map { case (u, es) =>
      val mn = es.map(_._2).min
      val pts = es.map(e => ((e._2 - mn) / 60000000L, math.floor(e._5 * 1048576.0).toLong))
      val n = pts.length.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
      (u, n, n * sxy - sx * sy, n * sxx - sx * sx)
    }.toSet
    val got = EventOps.trend(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(expected.forall(_._4 >= 0L), "den >= 0 by Cauchy-Schwarz")
    assert(expected.exists(_._3 > 0L) && expected.exists(_._3 < 0L),
      "both trend directions must occur on real data")
    // BigInt cross-check that no Long product wrapped anywhere
    val big = ev.groupBy(_._3).toSeq.map { case (u, es) =>
      val mn = es.map(_._2).min
      val pts = es.map(e => (BigInt((e._2 - mn) / 60000000L),
        BigInt(math.floor(e._5 * 1048576.0).toLong)))
      val n = BigInt(pts.length)
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
      (u, pts.length.toLong, (n * sxy - sx * sy).toLong, (n * sxx - sx * sx).toLong)
    }.toSet
    assert(big == expected)
  }

  test("autocov == local lag-7 day-count recompute; the observed-days contract bites") {
    val counts = ev.groupBy(e => (e._4, e._2 / 86400000000L))
      .map { case (k, es) => (k, es.length.toLong) }
    val expected = counts.keys.groupBy(_._1).map { case (tpe, _) =>
      val pairs = counts.toSeq.collect {
        case ((t, d), x) if t == tpe && counts.contains((t, d + 7)) =>
          (x, counts((t, d + 7)))
      }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      (tpe, n, sx, sy, sxy, n * sxy - sx * sy)
    }.filter(_._2 > 0L).toSet
    val got = EventOps.autocov(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // the inner-join contract must actually bite: some (type, day) has no
    // observed day+7 partner, so n_pairs < n_days for that type
    val bites = counts.keys.groupBy(_._1).exists { case (tpe, ks) =>
      ks.exists { case (_, d) => !counts.contains((tpe, d + 7)) }
    }
    assert(bites, "every (type, day) has a day+7 partner — contract untested")
    assert(expected.nonEmpty && expected.exists(_._6 != 0L),
      "autocovariance must be non-degenerate on real data")
  }

  test("transitions matches a local session-scoped bigram recompute") {
    val gap = 1800000000L
    val trans = ev.groupBy(_._3).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._1))
      var sid = 0L; var prev = Long.MinValue
      val tagged = sorted.map { e =>
        if (prev == Long.MinValue || e._2 - prev > gap) sid += 1
        prev = e._2
        (sid, e._4)
      }
      tagged.zip(tagged.drop(1)).collect {
        case ((s1, a), (s2, b)) if s1 == s2 => ((a, b), u)
      }
    }
    val expected = trans.groupBy(_._1).map { case ((a, b), s) =>
      (a, b, s.size.toLong, s.map(_._2).distinct.size.toLong)
    }.toSet
    val got = EventOps.transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(expected.size > 3, "several transition pairs must occur")
  }

  test("convert == local sorted k-th order statistic over per-user hour delays") {
    val byUser = ev.groupBy(_._3)
    val delays = byUser.toSeq.flatMap { case (_, es) =>
      val signups = es.filter(_._4 == "signup").map(_._2)
      if (signups.isEmpty) None
      else {
        val s = signups.min
        val ps = es.filter(e => e._4 == "purchase" && e._2 > s).map(_._2)
        if (ps.isEmpty) None else Some((ps.min - s) / 3600000000L)
      }
    }.sorted
    val n = delays.length
    assert(n > 0, "the corpus must have converting users")
    val want = Seq(0.25, 0.5, 0.75, 0.9).map { q =>
      val k = math.floor(q * (n - 1).toDouble).toLong + 1L
      (q, k, delays((k - 1).toInt))
    }
    val got = EventOps.convert(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(want.map(_._3) == want.map(_._3).sorted, "the ladder is monotone")
  }

  test("markov == local 3-round integer mass-passing recompute; mass only leaks") {
    val gap = 1800000000L
    val trans = ev.groupBy(_._3).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._1))
      var sid = 0L; var prev = Long.MinValue
      val tagged = sorted.map { e =>
        if (prev == Long.MinValue || e._2 - prev > gap) sid += 1
        prev = e._2
        (sid, e._4)
      }
      tagged.zip(tagged.drop(1)).collect { case ((s1, a), (s2, b)) if s1 == s2 => (a, b) }
    }
    val n = trans.groupBy(identity).map { case (k, xs) => (k, xs.size.toLong) }
    val out = n.groupBy(_._1._1).map { case (f, xs) => (f, xs.values.sum) }
    val types = (n.keys.map(_._1) ++ n.keys.map(_._2)).toSeq.distinct.sorted
    var p = types.map(t => (t, 1000000L / types.size)).toMap
    val masses = Seq.newBuilder[Long]
    masses += p.values.sum
    for (_ <- 1 to 3) {
      p = types.map { t =>
        val keep = if (out.contains(t)) 0L else p(t)
        val inflow = n.collect {
          case ((f, to), c) if to == t => (p(f) * c) / out(f)
        }.sum
        (t, keep + inflow)
      }.toMap
      masses += p.values.sum
    }
    val want = types.map(t => (t, p(t)))
    val got = EventOps.markov(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    val ms = masses.result()
    assert(ms.zip(ms.drop(1)).forall { case (a, b) => b <= a },
      "integer truncation can only leak mass, never create it")
    assert(want.map(_._2).sum > 900000L, "3 rounds must retain most of the mass")
  }

  test("trend's plan reuses the window partitioning: one hash exchange on user_id") {
    // the min-x window partitions by user_id and the moment groupBy keys on
    // user_id too — Catalyst must satisfy the aggregate from the window's
    // partitioning, so the ONLY hash exchange is the window's; the final
    // range exchange belongs to the 1500-row presentation orderBy
    val plan = EventOps.trend(spark, sf).queryExecution.executedPlan.toString
    val hashEx = """Exchange hashpartitioning\(([^,]*)""".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(hashEx.size == 1 && hashEx.head.startsWith("user_id"),
      s"hash exchanges: $hashEx\n${plan.take(800)}")
  }

  test("spearman's plan reuses the window partitioning: one hash exchange on event_type") {
    // both rank windows and the final groupBy key on event_type — the two
    // different window orderings are in-partition SORTS under one hash
    // exchange, and the aggregate is satisfied from the same partitioning
    val plan = EventOps.spearman(spark, sf).queryExecution.executedPlan.toString
    val hashEx = """Exchange hashpartitioning\(([^,]*)""".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(hashEx.size == 1 && hashEx.head.startsWith("event_type"),
      s"hash exchanges: $hashEx\n${plan.take(800)}")
  }

  test("trend's Long-safety contract fails LOUDLY, never wraps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("trend-bound").toString
    // one user, two events ~8000 years (~2^32 minutes) apart with huge
    // quantized values (~2^32): n^2 * xmax * qmax ~ 2^66 >= 2^62
    Seq((1L, 7L, "1970-01-01 00:00:00", "view", 5000.0),
      (2L, 7L, "9970-01-01 00:00:00", "view", 5000.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[Exception](EventOps.trend(spark, dir).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // two loud layers: ANSI mode (Spark 4 default) throws ARITHMETIC_OVERFLOW
    // on any Long product that wraps; the decimal raise_error names the
    // operator's contract when the bound check runs first. Either way the
    // query FAILS — never a silent wrap.
    assert(msgs(ex).exists(m =>
      m.contains("Long-safety contract") || m.contains("ARITHMETIC_OVERFLOW")
        || m.contains("long overflow")), msgs(ex).mkString(" | "))
  }

  test("growth accounting == local lag recompute; classes partition actives") {
    import spark.implicits._
    val ud = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "cast(to_date(cast(ts as timestamp)) as string)")
      .as[(Long, String)].collect().distinct
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    def day(s: String) = java.time.LocalDate.parse(s, fmt)
    val classed = ud.groupBy(_._1).toSeq.flatMap { case (_, ds) =>
      val days = ds.map(_._2).sorted
      days.zipWithIndex.map { case (d, i) =>
        val cls = if (i == 0) 0
          else {
            val gap = java.time.temporal.ChronoUnit.DAYS.between(day(days(i - 1)), day(d))
            if (gap == 1L) 1 else 2
          }
        (d, cls)
      }
    }
    val want = classed.groupBy(_._1).toSeq.map { case (d, cs) =>
      (d, cs.size.toLong, cs.count(_._2 == 0).toLong,
        cs.count(_._2 == 1).toLong, cs.count(_._2 == 2).toLong)
    }.sortBy(_._1)
    val got = EventOps.growth(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(want.forall(r => r._2 == r._3 + r._4 + r._5),
      "new/retained/resurrected must partition actives")
    assert(want.exists(_._5 > 0L), "a resurrected user must exist")
  }

  test("hourWeek == local epoch-arithmetic recompute; counts partition the table") {
    val how = ev.map { case (_, us, _, _, _) =>
      ((us / 86400000000L + 4L) % 7L) * 24L + (us % 86400000000L) / 3600000000L
    }
    val total = how.length.toLong
    val want = how.groupBy(identity).toSeq.map { case (h, xs) =>
      (h, xs.length.toLong, xs.length.toLong * 168L - total)
    }.sortBy(_._1)
    val got = EventOps.hourWeek(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.map(_._2).sum == total)
    assert(got.forall(r => r._1 >= 0L && r._1 < 168L))
    assert(got.exists(_._3 > 0L) && got.exists(_._3 < 0L),
      "a non-uniform profile must have both hot and cold cells")
  }

  test("gini == textbook sorted rank-sum recompute; bounds and degenerate cases hold") {
    val counts = ev.groupBy(_._3).values.map(_.size.toLong).toSeq.sorted
    val n = counts.size.toLong
    val tot = counts.sum
    val num = counts.zipWithIndex.map { case (c, i0) =>
      BigInt(2L * (i0 + 1) - n - 1) * c
    }.sum
    val want = (n, tot, num.toLong, (num * 1000000 / (BigInt(n) * tot)).toLong)
    val got = EventOps.gini(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(want))
    assert(want._3 >= 0L && want._4 < 1000000L, "0 <= G < 1 for positive counts")

    // degenerate: uniform counts give exactly zero on the engine's
    // class-telescoped form (one class, o = 0, m = n)
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("gini").toString
    spark.createDataset((1L to 12L).flatMap(u => (1 to 5).map(i => (u, s"e$i"))))
      .toDF("user_id", "x").write.mode("overwrite")
      .parquet(s"$tmp/events.parquet")
    val uni = EventOps.gini(spark, tmp).collect().head
    assert((uni.getLong(0), uni.getLong(1), uni.getLong(2), uni.getLong(3))
      == ((12L, 60L, 0L, 0L)))
  }

  test("clickNoBuy == local (user, day) set difference rollup") {
    def dayPairs(tpe: String): Set[(Long, Long)] =
      ev.filter(_._4 == tpe).map(e => (e._3, e._2 / 86400000000L)).toSet
    val diff = dayPairs("click") -- dayPairs("purchase")
    val want = diff.groupBy(_._1).toSeq.map { case (u, ds) =>
      (u, ds.size.toLong, ds.map(_._2).min, ds.map(_._2).max)
    }.sortBy(_._1)
    val got = EventOps.clickNoBuy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(diff.nonEmpty && diff.size < dayPairs("click").size,
      "the except must keep a strict, non-empty subset of click-days")
  }

  test("locf == local carry recompute; gap days exist and carry the prior value") {
    def q(v: Double): Long = math.floor(v * 1048576.0).toLong
    val want = ev.groupBy(_._3).toSeq.flatMap { case (u, xs) =>
      val byDay = xs.groupBy(_._2 / 86400000000L)
      val (d0, d1) = (byDay.keys.min, byDay.keys.max)
      var carry = 0L
      (d0 to d1).map { day =>
        val es = byDay.getOrElse(day, Array.empty[(Long, Long, Long, String, Double)])
        if (es.nonEmpty) carry = q(es.maxBy(_._2)._5)
        (u, day, es.length.toLong, carry)
      }
    }.sortBy(r => (r._1, r._2))
    val got = EventOps.locf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // densify must be real: some day row has no events yet carries a value
    val gaps = got.filter(_._3 == 0L)
    assert(gaps.nonEmpty, "a calendar gap day must exist for LOCF to be non-trivial")
    val byUserDay = got.map(r => (r._1, r._2) -> r._4).toMap
    assert(gaps.forall(g => byUserDay(g._1 -> (g._2 - 1)) == g._4),
      "every gap day must carry its predecessor's value unchanged")
  }

  test("clickSurplus == local MULTISET difference rollup; genuinely differs from the set version") {
    def dayOcc(tpe: String): Seq[(Long, Long)] =
      ev.filter(_._4 == tpe).map(e => (e._3, e._2 / 86400000000L)).toSeq
    val buys = dayOcc("purchase").groupBy(identity).view.mapValues(_.size).toMap
    val surplus = dayOcc("click").groupBy(identity).toSeq.flatMap { case (k, xs) =>
      Seq.fill(math.max(0, xs.size - buys.getOrElse(k, 0)))(k)
    }
    val want = surplus.groupBy(_._1).toSeq.map { case (u, ks) =>
      (u, ks.size.toLong, ks.distinct.size.toLong)
    }.sortBy(_._1)
    val got = EventOps.clickSurplus(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // non-trivial: some (user, day) must carry MORE surplus rows than the
    // distinct version would (n clicks > n purchases >= 1, or 2+ clicks)
    val multisetTotal = surplus.size
    val setTotal = (dayOcc("click").toSet -- dayOcc("purchase").toSet).size
    assert(multisetTotal > setTotal,
      "EXCEPT ALL must keep occurrence rows the distinct EXCEPT collapses")
  }

  test("clickAndBuy == local intersection rollup; except + intersect partition click-days") {
    def dayPairs(tpe: String): Set[(Long, Long)] =
      ev.filter(_._4 == tpe).map(e => (e._3, e._2 / 86400000000L)).toSet
    val both = dayPairs("click") & dayPairs("purchase")
    val want = both.groupBy(_._1).toSeq.map { case (u, ds) =>
      (u, ds.size.toLong, ds.map(_._2).min, ds.map(_._2).max)
    }.sortBy(_._1)
    val got = EventOps.clickAndBuy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // the two set-op queries partition each user's click-days exactly
    val noBuy = EventOps.clickNoBuy(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val andBuy = got.map(r => r._1 -> r._2).toMap
    val clickDays = dayPairs("click").groupBy(_._1).map { case (u, ds) => u -> ds.size.toLong }
    clickDays.foreach { case (u, n) =>
      assert(noBuy.getOrElse(u, 0L) + andBuy.getOrElse(u, 0L) == n,
        s"user $u: except + intersect must partition the click-day set")
    }
    assert(both.nonEmpty, "converted click-days must exist")
  }

  test("ntileCensus == local SQL-standard quartile recompute over the total order") {
    def q20(x: Double): Long = math.floor(x * 1048576.0).toLong
    val want = ev.groupBy(_._4).toSeq.flatMap { case (tpe, xs) =>
      val sorted = xs.sortBy(e => (e._5, e._1)).map(e => q20(e._5))
      val n = sorted.length
      val base = n / 4; val extra = n % 4
      // SQL-standard ntile: the first n mod k buckets carry one extra row
      val bounds = (0 to 4).map(b => b * base + math.min(b, extra))
      (1 to 4).map { b =>
        val slice = sorted.slice(bounds(b - 1), bounds(b))
        (tpe, b.toLong, slice.size.toLong, slice.sum, slice.min, slice.max)
      }
    }.sortBy(r => (r._1, r._2))
    val got = EventOps.ntileCensus(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    assert(want.map(_._1).distinct.size == 5 && want.size == 20,
      "4 quartiles for each of the 5 event types")
  }

  /** Per-type daily-count sequences in day order — the Haar pyramid's
    * level-0 signal — and the exact sequential pyramid built from them
    * (the single-threaded definition the distributed level loop must
    * reproduce coefficient for coefficient).
    */
  private lazy val haarBase: Map[String, Array[Long]] = {
    val counts = ev.groupBy(e => (e._4, e._2 / 86400000000L))
      .map { case (k, es) => (k, es.length.toLong) }
    counts.keys.map(_._1).toSeq.distinct.map { tpe =>
      tpe -> counts.toSeq.collect { case ((t, d), x) if t == tpe => (d, x) }
        .sortBy(_._1).map(_._2).toArray
    }.toMap
  }

  private lazy val haarLocal: Seq[(String, Long, Long, Long, Long, Long)] =
    haarBase.toSeq.flatMap { case (tpe, xs0) =>
      var xs = xs0
      (1 to 5).flatMap { lvl =>
        val rows = xs.grouped(2).toArray.zipWithIndex.map { case (p, i) =>
          if (p.length == 2) (tpe, lvl.toLong, i.toLong, 2L, p(0) + p(1), p(0) - p(1))
          else (tpe, lvl.toLong, i.toLong, 1L, p(0), 0L)
        }
        xs = rows.map(_._5)
        rows
      }
    }

  test("haar == exact sequential pyramid; carry bites; per-level s conserves the total") {
    val got = EventOps.haar(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got.toSet == haarLocal.toSet)
    assert(got == got.sortBy(r => (r._1, r._2, r._3)), "presentation order")
    assert(haarLocal.exists(_._4 == 1L),
      "no ragged tail at any level — the carry contract is untested")
    assert(haarLocal.exists(r => r._6 != 0L) && haarLocal.exists(r => r._6 < 0L),
      "detail coefficients must be non-degenerate, both signs")
    // conservation: at EVERY level each type's s column sums to its total
    // event count (carries included — the lazy-wavelet invariant)
    for ((tpe, xs) <- haarBase; lvl <- 1 to 5) {
      val s = haarLocal.filter(r => r._1 == tpe && r._2 == lvl).map(_._5).sum
      assert(s == xs.sum, s"type $tpe level $lvl: s-sum $s != total ${xs.sum}")
    }
  }

  test("haarEnergy == recompute; per-level Parseval identity holds in BigInt") {
    val want = haarLocal.groupBy(r => (r._1, r._2)).toSeq.map { case ((tpe, lvl), rs) =>
      (tpe, lvl, rs.size.toLong, rs.count(_._4 == 2L).toLong,
        rs.map(r => BigInt(r._5) * r._5).sum.toLong,
        rs.map(r => BigInt(r._6) * r._6).sum.toLong)
    }.sortBy(r => (r._1, r._2))
    val got = EventOps.haarEnergy(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // Parseval per level: sum of child s^2 == sum over complete-pair
    // parents of (s^2 + d^2) / 2 + sum over carried parents of s^2
    for ((tpe, xs) <- haarBase; lvl <- 1 to 5) {
      val childSq =
        if (lvl == 1) xs.map(x => BigInt(x) * x).sum
        else haarLocal.filter(r => r._1 == tpe && r._2 == lvl - 1)
          .map(r => BigInt(r._5) * r._5).sum
      val parentSq = haarLocal.filter(r => r._1 == tpe && r._2 == lvl).map { r =>
        if (r._4 == 2L) (BigInt(r._5) * r._5 + BigInt(r._6) * r._6) / 2
        else BigInt(r._5) * r._5
      }.sum
      assert(childSq == parentSq, s"Parseval broken at type $tpe level $lvl")
    }
    assert(want.exists(r => r._6 > 0L), "detail energy must be nonzero somewhere")
  }

  test("mannKendall == BigInt pairwise recompute; ties bite; pair census closes") {
    val want = haarBase.toSeq.map { case (tpe, xs) =>
      val n = xs.length.toLong
      val pairs = for (i <- xs.indices; j <- i + 1 until xs.length) yield (xs(i), xs(j))
      val s = pairs.map { case (a, b) => java.lang.Long.signum(b - a).toLong }.sum
      val tie = xs.groupBy(identity).values.map(_.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      (tpe, n, s, tie, n * (n - 1) * (2 * n + 5) - tie)
    }.sortBy(_._1)
    val got = EventOps.mannKendall(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    assert(want.exists(_._4 > 0L), "no tied daily counts anywhere — tie term untested")
    assert(want.exists(_._3 != 0L), "S must be nonzero for some type")
    // census closure: concordant + discordant + tied == n(n-1)/2 per type,
    // with C - D == S (the identity the gather/scatter formulations share)
    for ((tpe, xs) <- haarBase) {
      val pairs = for (i <- xs.indices; j <- i + 1 until xs.length) yield (xs(i), xs(j))
      val c = pairs.count { case (a, b) => a < b }
      val d = pairs.count { case (a, b) => a > b }
      val row = want.find(_._1 == tpe).get
      assert(c - d == row._3 && c + d <= row._2 * (row._2 - 1) / 2)
    }
  }

  test("typeAffinity == local set-algebra recompute; inclusion-exclusion closes") {
    val sets = ev.groupBy(_._4).map { case (t, es) => t -> es.map(_._3).toSet }
    val types = sets.keys.toSeq.sorted
    val want = (for (i <- types.indices; j <- i + 1 until types.length) yield {
      val (a, b) = (types(i), types(j))
      val both = sets(a).intersect(sets(b)).size.toLong
      (a, b, sets(a).size.toLong, sets(b).size.toLong, both,
        sets(a).union(sets(b)).size.toLong)
    }).filter(_._5 > 0L).sortBy(r => (r._1, r._2))
    val got = EventOps.typeAffinity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // inclusion-exclusion is definitional locally; assert it survived the
    // engine's join arithmetic too
    got.foreach(r => assert(r._3 + r._4 - r._5 == r._6, s"IE broken ${r._1}/${r._2}"))
  }

  test("typeAffinityOf on crafted frames: partial overlap, disjoint pairs drop, dup events collapse") {
    import spark.implicits._
    // a: {1,2,3}  b: {3,4}  c: {7}  (disjoint from a and b)  d: {} absent
    val raw = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (1L, "a"), // duplicate event
      (3L, "b"), (4L, "b"),
      (7L, "c")).toDF("user_id", "event_type")
    val got = EventOps.typeAffinityOf(raw).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // only (a, b) co-observes: |A|=3 |B|=2 both=1 union=4
    assert(got == Seq(("a", "b", 3L, 2L, 1L, 4L)))
  }

  test("runs == local doubled-median runs recompute; oscillation observed") {
    val byType = ev.groupBy(e => (e._4, e._2 / 86400000000L))
      .map { case ((t, d), es) => (t, d, es.length.toLong) }
      .toSeq.groupBy(_._1).map { case (t, rs) =>
        t -> rs.sortBy(_._2).map(r => (r._2, r._3))
      }
    val want = byType.toSeq.map { case (tpe, pairs) =>
      val xs = pairs.map(_._2)
      val n = xs.length
      val sorted = xs.sorted
      val qmed2 = if (n % 2 == 1) 2 * sorted(n / 2)
        else sorted(n / 2 - 1) + sorted(n / 2)
      val sgns = xs.map(x => java.lang.Long.signum(2 * x - qmed2))
      val nz = sgns.filter(_ != 0)
      val nRuns = if (nz.isEmpty) 0L
        else 1L + (1 until nz.length).count(i => nz(i) != nz(i - 1))
      val longest = if (nz.isEmpty) 0L else {
        var best = 1; var cur = 1
        for (i <- 1 until nz.length) {
          if (nz(i) == nz(i - 1)) cur += 1 else cur = 1
          best = math.max(best, cur)
        }
        best.toLong
      }
      (tpe, n.toLong, sgns.count(_ > 0).toLong, sgns.count(_ < 0).toLong,
        sgns.count(_ == 0).toLong, qmed2, nRuns, longest, pairs.head._1)
    }.sortBy(_._1)
    val got = EventOps.runs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSeq
    assert(got == want)
    assert(want.exists(_._7 > 1L), "some type must genuinely oscillate")
    // above ~ below by the median's construction: |n_above - n_below| <=
    // n_equal + 1 can fail only on heavy ties; assert the weak closure
    want.foreach(r => assert(r._3 + r._4 + r._5 == r._2, s"sign closure ${r._1}"))
  }

  test("weekday == local integer dow-profile residual census; peak pinned") {
    val Q = 1048576L
    val daily = ev.groupBy(e => (e._4, e._2 / 86400000000L))
      .map { case ((t, d), es) => (t, d, es.length.toLong) }.toSeq
    val prof = daily.groupBy(r => (r._1, r._2 % 7))
      .map { case (k, rs) => k -> (rs.map(_._3).sum * Q) / rs.size }
    val res = daily.map { case (t, d, c) => (t, d, c * Q - prof((t, d % 7))) }
    val want = res.groupBy(_._1).toSeq.map { case (t, rs) =>
      val pk = rs.map(r => (r._3, r._2)).max
      (t, rs.size.toLong, rs.count(_._3 > 0L).toLong, rs.count(_._3 < 0L).toLong,
        rs.filter(_._3 > 0L).map(_._3).sum, rs.filter(_._3 < 0L).map(_._3).sum,
        pk._1, pk._2)
    }.sortBy(_._1)
    val got = EventOps.weekday(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want)
    assert(want.exists(_._3 > 0L) && want.exists(_._4 > 0L),
      "residuals must land on both sides of the profile")
    // per type, residual mass balances only up to the div-flooring of
    // qmean: |pos_sum + neg_sum| < n_days * 7 (each day's floor loss < 7)
    want.foreach(r => assert(math.abs(r._5 + r._6) < r._2 * Q,
      s"residual mass implausible for ${r._1}"))
  }

  /** The stable-rule rank of each position in a triple: position i
    * precedes j > i iff x_i <= x_j — computed by SORTING (value,
    * position), the definitional form the engine's indicator sums and the
    * oracle's CASE chain must both reproduce.
    */
  private def ordPid(a: Long, b: Long, c: Long): Long = {
    val order = Seq((a, 0), (b, 1), (c, 2)).sortBy(identity)
    val rank = order.zipWithIndex.map { case ((_, pos), r) => pos -> r.toLong }.toMap
    rank(0) * 100 + rank(1) * 10 + rank(2)
  }

  test("ordPatterns == stable-rule sort recompute; indicator ranks == sort ranks on all 27 triples") {
    // the engine's indicator-sum arithmetic, replicated locally
    def indPid(a: Long, b: Long, c: Long): Long = {
      val ra = (if (b < a) 1L else 0L) + (if (c < a) 1L else 0L)
      val rb = (if (a <= b) 1L else 0L) + (if (c < b) 1L else 0L)
      val rc = (if (a <= c) 1L else 0L) + (if (b <= c) 1L else 0L)
      ra * 100 + rb * 10 + rc
    }
    for (a <- 0L to 2L; b <- 0L to 2L; c <- 0L to 2L)
      assert(indPid(a, b, c) == ordPid(a, b, c), s"triple ($a,$b,$c)")
    val want = haarBase.toSeq.flatMap { case (tpe, xs) =>
      xs.sliding(3).filter(_.length == 3)
        .map(w => (tpe, ordPid(w(0), w(1), w(2)))).toSeq
    }.groupBy(identity).map { case ((tpe, pid), ws) => (tpe, pid, ws.size.toLong) }
      .toSeq.sortBy(r => (r._1, r._2))
    val got = EventOps.ordPatterns(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(want.map(_._2).distinct.size >= 3,
      "fewer than 3 distinct patterns — census degenerate")
    // window-count closure: patterns per type sum to n - 2
    for ((tpe, xs) <- haarBase)
      assert(want.filter(_._1 == tpe).map(_._3).sum == xs.length - 2)
  }

  test("ccf == local per-lag pair recompute; lag-0 symmetry anchors the pair orientation") {
    val counts = ev.groupBy(e => (e._4, e._2 / 86400000000L))
      .map { case (k, es) => (k, es.length.toLong) }
    val types = counts.keys.map(_._1).toSeq.distinct.sorted
    val want = (for {
      ta <- types; tb <- types if ta < tb; lag <- 0L to 7L
    } yield {
      val pairs = counts.toSeq.collect {
        case ((t, d), x) if t == ta && counts.contains((tb, d + lag)) =>
          (x, counts((tb, d + lag)))
      }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      (ta, tb, lag, n, sx, sy, sxy, n * sxy - sx * sy)
    }).filter(_._4 > 0L).sortBy(r => (r._1, r._2, r._3))
    val got = EventOps.ccf(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want)
    assert(want.exists(_._8 != 0L), "cross-covariance must be non-degenerate")
    // at lag 0 the census is symmetric in the pair: swapping roles only
    // swaps sx/sy, so cov_num is identical — an internal consistency pin
    for ((ta, tb, _, n, sx, sy, _, cov) <- want.filter(_._3 == 0L)) {
      val swapped = counts.toSeq.collect {
        case ((t, d), x) if t == tb && counts.contains((ta, d)) => (x, counts((ta, d)))
      }
      val sn = swapped.length.toLong
      val ssx = swapped.map(_._1).sum; val ssy = swapped.map(_._2).sum
      val ssxy = swapped.map(p => p._1 * p._2).sum
      assert(sn == n && ssx == sy && ssy == sx && sn * ssxy - ssx * ssy == cov,
        s"lag-0 symmetry broken for ($ta, $tb)")
    }
  }

  test("lakeDiff == predicate replay; classes partition both snapshots; dq telescopes") {
    def q20(x: Double): Long = math.floor(x * 1048576.0).toLong
    val rows = ev.map(e => (e._1, q20(e._5))) // (event_id, qval)
    val del = rows.filter(_._1 % 97 == 0)
    val ins = rows.filter(_._1 % 101 == 0)
    val upd = rows.filter(r => r._1 % 97 != 0 && r._1 % 91 == 0)
    val unch = rows.filter(r => r._1 % 97 != 0 && r._1 % 91 != 0)
    val want = Seq(
      ("deleted", del.length.toLong, del.map(_._1).sum, -del.map(_._2).sum),
      ("inserted", ins.length.toLong, ins.map(_._1 + 1000000000000L).sum, ins.map(_._2).sum),
      ("unchanged", unch.length.toLong, unch.map(_._1).sum, 0L),
      ("updated", upd.length.toLong, upd.map(_._1).sum, upd.length.toLong * 1000L))
    val got = EventOps.lakeDiff(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(Seq(del, ins, upd).forall(_.nonEmpty), "every mutation class must bite")
    // conservation: the signed deltas telescope to total(v2) - total(v1)
    val v1 = rows.map(_._2).sum
    val v2 = rows.filter(_._1 % 97 != 0)
      .map(r => if (r._1 % 91 == 0) r._2 + 1000L else r._2).sum + ins.map(_._2).sum
    assert(want.map(_._4).sum == v2 - v1, "dq_sum must telescope across classes")
    // the four classes partition the union of both snapshots' key sets
    assert(del.length + upd.length + unch.length == rows.length)
    assert(got.map(_._2).sum == rows.length + ins.length)
  }

  test("profile == brute windowed L1 argmin with exclusion; the exclusion zone bites") {
    def l1(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
    val want = haarBase.toSeq.flatMap { case (tpe, xs) =>
      val wins = xs.sliding(4).filter(_.length == 4).map(_.toArray).toArray
      wins.indices.flatMap { i =>
        val cands = wins.indices.filter(j => math.abs(i - j) >= 2)
          .map(j => (l1(wins(i), wins(j)), j.toLong))
        if (cands.isEmpty) None
        else Some((tpe, i.toLong, cands.min._1, cands.min._2))
      }
    }.sortBy(r => (r._1, r._2))
    val got = EventOps.profile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // the exclusion zone must matter somewhere: an adjacent (|i-j| = 1)
    // window strictly beats the admissible minimum for some i
    val bites = haarBase.exists { case (_, xs) =>
      val wins = xs.sliding(4).filter(_.length == 4).map(_.toArray).toArray
      wins.indices.exists { i =>
        val admissible = wins.indices.filter(j => math.abs(i - j) >= 2)
          .map(j => l1(wins(i), wins(j)))
        admissible.nonEmpty && wins.indices.exists(j =>
          math.abs(i - j) == 1 && l1(wins(i), wins(j)) < admissible.min)
      }
    }
    assert(bites, "exclusion zone never bites — trivial-match contract untested")
    assert(want.map(_._3).distinct.size > 3, "profile must be non-degenerate")
  }

  test("changepoint == BigInt recursive recompute; level 1 == cusum; sentinel arms occur") {
    def q20(x: Double): Long = math.floor(x * 1048576.0).toLong
    def best(pre: Array[BigInt], l: Int, r: Int): Option[(Long, Long)] = {
      // segment [l, r] 1-based inclusive over prefix sums pre(0..n);
      // returns (smallest maximizing k, stat) over k in [l, r-1]
      if (r - l < 1) None
      else {
        val m = BigInt(r - l + 1); val pl = pre(l - 1); val s = pre(r) - pl
        Some((l until r).map { k =>
          ((m * (pre(k) - pl) - BigInt(k - l + 1) * s).abs, k.toLong)
        }.minBy { case (st, k) => (-st, k) } match {
          case (st, k) => (k, st.toLong)
        })
      }
    }
    val want = ev.groupBy(_._3).toSeq.flatMap { case (u, es) =>
      val qs = es.sortBy(_._2).map(e => q20(e._5))
      val n = qs.length
      val pre = qs.scanLeft(BigInt(0))(_ + _).toArray
      best(pre, 1, n).map { case (k1, stat1) =>
        val (k2l, s2l) = best(pre, 1, k1.toInt).getOrElse((-1L, 0L))
        val (k2r, s2r) = best(pre, k1.toInt + 1, n).getOrElse((-1L, 0L))
        (u, n.toLong, k1, stat1, k2l, s2l, k2r, s2r)
      }
    }.sortBy(_._1)
    val got = EventOps.changepoint(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want)
    // level 1 must agree with the standalone cusum operator exactly
    val cus = EventOps.cusum(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((u, n, k1, stat1, _, _, _, _) <- want) {
      val (cn, cmax, ck) = cus(u)
      assert(cn == n && cmax == stat1 && ck == k1, s"user $u: level 1 != cusum")
    }
    // both real arms must occur on this data
    assert(want.exists(r => r._5 > 0L && r._7 > 0L),
      "a user with both level-2 splits must exist")
    // the sentinel arm never occurs in this corpus (no user's best split
    // sits at an end), so exercise the contract on a synthetic frame:
    // values (100, 0, 0) put k1 = 1 -> left side has no interior split
    val tmp = java.nio.file.Files.createTempDirectory("graft-cp").toString
    import spark.implicits._
    Seq((1L, "2024-01-01 00:00:00", 7L, "view", 100.0),
      (2L, "2024-01-01 00:01:00", 7L, "view", 0.0),
      (3L, "2024-01-01 00:02:00", 7L, "view", 50.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val syn = EventOps.changepoint(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    // values (100, 0, 50): k1 = 1 (stat |2*100q - 50q|), left side [1,1]
    // has no interior -> sentinel; right side [2,3] splits at 2 with |50q|
    val q = 1048576L
    assert(syn == Seq((7L, 3L, 1L, 150L * q, -1L, 0L, 2L, 50L * q)),
      s"synthetic sentinel scenario mismatch: $syn")
  }
}

package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Convex hull: the monotone chain and the two-level distributed
  * reduction are checked against an INDEPENDENT local gift-wrapping march
  * (the oracle's algorithm, reimplemented here off-SQL), plus the
  * geometric validity property (every input point left-or-on every hull
  * edge) and the degenerate shapes the contract data never shows
  * (collinear sets, singletons, duplicates).
  */
class HullOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): Long =
    (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)

  private def d2(a: (Long, Long), b: (Long, Long)): Long =
    (b._1 - a._1) * (b._1 - a._1) + (b._2 - a._2) * (b._2 - a._2)

  /** Jarvis march, CCW, farthest-on-collinear (corners only) — the
    * independent reference (the same selection rule as the SQL oracle).
    */
  private def giftWrap(pts: Array[(Long, Long)]): Array[(Long, Long)] = {
    val p = pts.distinct
    if (p.length <= 1) return p
    val start = p.min
    val out = scala.collection.mutable.ArrayBuffer(start)
    var cur = start
    var steps = 0
    while (steps < p.length + 1) {
      var next: (Long, Long) = null
      p.foreach { q =>
        if (q != cur) {
          if (next == null) next = q
          else {
            val c = cross(cur, next, q)
            if (c < 0 || (c == 0 && d2(cur, q) > d2(cur, next))) next = q
          }
        }
      }
      if (next == start) return out.toArray
      out += next; cur = next; steps += 1
    }
    fail(s"giftWrap failed to close after ${p.length + 1} steps")
  }

  test("chainHull == gift wrapping on random integer point sets; hull is valid") {
    val rng = new scala.util.Random(20260818L)
    for (trial <- 0 until 40) {
      val n = 1 + rng.nextInt(60)
      val span = 1 + rng.nextInt(12) // small spans force many collinear runs
      val pts = Array.fill(n)((rng.nextInt(span).toLong, rng.nextInt(span).toLong))
      val chain = HullOps.chainHull(pts)
      val gift = giftWrap(pts)
      assert(chain.toSet == gift.toSet, s"trial $trial: corner sets differ")
      assert(chain.length == gift.length, s"trial $trial: corner multiplicity")
      assert(HullOps.area2(chain) == HullOps.area2(gift), s"trial $trial: area2")
      assert(HullOps.area2(chain) >= 0, s"trial $trial: not CCW")
      // validity: every input point left-or-on every hull edge
      if (chain.length >= 3) {
        val dpts = pts.distinct
        for (i <- chain.indices; p <- dpts) {
          val a = chain(i); val b = chain((i + 1) % chain.length)
          assert(cross(a, b, p) >= 0, s"trial $trial: $p right of edge $a->$b")
        }
      }
    }
  }

  test("degenerate shapes: singleton, duplicates, collinear") {
    assert(HullOps.chainHull(Array((3L, 4L))).toSeq == Seq((3L, 4L)))
    assert(HullOps.chainHull(Array((3L, 4L), (3L, 4L), (3L, 4L))).toSeq == Seq((3L, 4L)))
    val col = Array((0L, 0L), (2L, 2L), (5L, 5L), (3L, 3L), (0L, 0L))
    val h = HullOps.chainHull(col)
    assert(h.toSet == Set((0L, 0L), (5L, 5L)) && HullOps.area2(h) == 0L)
    assert(giftWrap(col).toSet == Set((0L, 0L), (5L, 5L)))
  }

  test("distributed hullOf == local chainHull per threshold (random partitioning)") {
    import spark.implicits._
    val rng = new scala.util.Random(77L)
    val pts = (0 until 3).flatMap { ti =>
      Array.fill(80 + rng.nextInt(40))((ti, rng.nextInt(30).toLong, rng.nextInt(20).toLong))
    }
    val got = HullOps.hullOf(pts.toDS().repartition(7)).collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    (0 until 3).foreach { ti =>
      val local = HullOps.chainHull(pts.filter(_._1 == ti).map(p => (p._2, p._3)).toArray)
      val want = (local.length.toLong, local.map(_._1).sum, local.map(_._2).sum,
        HullOps.area2(local))
      assert(got(ti) == want, s"ti $ti")
    }
  }

  test("hullMetrics == brute-force definition over RAW points on random sets") {
    val rng = new scala.util.Random(20260819L)
    var sawWide = false
    for (trial <- 0 until 40) {
      val n = 1 + rng.nextInt(70)
      val span = 1 + rng.nextInt(trial % 4 match { case 0 => 6; case _ => 40 })
      val pts = Array.fill(n)((rng.nextInt(span).toLong, rng.nextInt(span).toLong))
      val dpts = pts.distinct
      val hull = HullOps.chainHull(pts)
      val (gotDiam, gotWidth) = HullOps.hullMetrics(hull)
      // diameter: max pairwise over ALL distinct raw points (the hull
      // cannot lose it — this recomputes from the definition, not the hull)
      val wantDiam =
        if (dpts.length < 2) 0L
        else (for (i <- dpts.indices; j <- dpts.indices if i < j)
          yield d2(dpts(i), dpts(j))).max
      assert(gotDiam == wantDiam, s"trial $trial diam")
      // width: min over hull edges of the quantized slab height against
      // ALL raw points (= against corners, since the hull contains them)
      val wantWidth =
        if (hull.length < 3) 0L
        else hull.indices.map { i =>
          val a = hull(i); val b = hull((i + 1) % hull.length)
          val mc = dpts.map(p => math.abs(cross(a, b, p))).max
          (BigInt(mc) * BigInt(mc) * BigInt(1048576) / BigInt(d2(a, b))).toLong
        }.min
      assert(gotWidth == wantWidth, s"trial $trial width")
      assert(gotWidth <= gotDiam * 1048576, s"trial $trial width exceeds diameter")
      if (gotWidth > 0) sawWide = true
    }
    assert(sawWide, "the trials must exercise a genuinely 2-D hull")
  }

  test("hullMetrics degenerate shapes: point, segment, collinear") {
    assert(HullOps.hullMetrics(Array((3L, 4L))) == ((0L, 0L)))
    assert(HullOps.hullMetrics(Array((0L, 0L), (3L, 4L))) == ((25L, 0L)))
    val col = HullOps.chainHull(Array((0L, 0L), (2L, 2L), (5L, 5L), (3L, 3L)))
    assert(HullOps.hullMetrics(col) == ((50L, 0L)))
  }

  test("hullCalipers end to end: segment metrics at sf0.001, slab at sf0.01") {
    val tiny = HullOps.hullCalipers(spark, "/root/testdata/sf0.001").collect()
    assert(tiny.length == 4)
    tiny.foreach { r =>
      assert(r.getLong(1) == 2 && r.getLong(2) > 0 && r.getLong(3) == 0)
    }
    val rows = HullOps.hullCalipers(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(1) >= 3)
      assert(r.getLong(3) > 0 && r.getLong(3) <= r.getLong(2) * 1048576)
    }
    // cross-check n_hull against convexHull (same hull, different stage-2)
    val nh = HullOps.convexHull(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == nh(r.getDouble(0))))
  }

  test("convexHull end to end: degenerate line hull at sf0.001, real hull at sf0.01") {
    // sf0.001 is a 100x10 grid -> every superpixel has py = 0: the hull of
    // each threshold's footprint is a SEGMENT (2 corners, zero area) — the
    // degenerate path exercised on real data
    val tiny = HullOps.convexHull(spark, "/root/testdata/sf0.001").collect()
    assert(tiny.length == 4)
    tiny.foreach { r =>
      assert(r.getLong(1) == 2, s"expected segment hull, got ${r.getLong(1)} corners")
      assert(r.getLong(4) == 0)
    }
    val rows = HullOps.convexHull(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(1) >= 3 && r.getLong(1) < 100) // corner count
      assert(r.getLong(4) > 0) // CCW doubled area
    }
  }
}

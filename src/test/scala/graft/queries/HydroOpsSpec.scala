package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Flow accumulation: the doubled-composition pair enumeration is checked
  * against a brute-force per-source path walk on random functional
  * forests (terminal-outside-keyset and pit cases included), on a long
  * chain that forces many doubling rounds, and end to end on the real
  * level-1 grid against an independent local recompute.
  */
class HydroOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pairsOf(succ: Map[Long, Long]): Set[(Long, Long)] = {
    val out = scala.collection.mutable.Set.empty[(Long, Long)]
    succ.keys.foreach { id =>
      var cur = succ(id)
      if (cur >= 0) {
        out += ((id, cur))
        while (succ.get(cur).exists(_ >= 0)) {
          cur = succ(cur)
          out += ((id, cur))
        }
      }
    }
    out.toSet
  }

  private def runEngine(succ: Map[Long, Long]): Seq[(Long, Long)] = {
    import spark.implicits._
    val df = succ.toSeq.toDF("id", "succ").repartition(5)
    HydroOps.downstreamPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("downstreamPairs == brute-force path walk on random functional forests") {
    val rng = new scala.util.Random(20260818L)
    for (trial <- 0 until 8) {
      val n = 20 + rng.nextInt(60)
      // strictly-decreasing "elevation" by construction: succ(i) < i, so
      // the graph is a forest; ~15% pits, ~10% drain to an out-of-keyset
      // terminal (a "boundary" id >= n, like the raster's edge cells)
      val succ = (0L until n.toLong).map { i =>
        val r = rng.nextDouble()
        val s = if (i == 0 || r < 0.15) -1L
        else if (r < 0.25) n.toLong + rng.nextInt(5)
        else rng.nextLong(i)
        i -> s
      }.toMap
      val got = runEngine(succ)
      assert(got.length == got.toSet.size, s"trial $trial: duplicate pairs")
      assert(got.toSet == pairsOf(succ), s"trial $trial")
    }
  }

  test("flowLengths == local step walk on random forests (payload doubling)") {
    import spark.implicits._
    val w = 7 // diag classification decodes from id arithmetic at this width
    def diag(id: Long, succ: Long): Boolean =
      succ % w != id % w && succ / w != id / w
    val rng = new scala.util.Random(20260819L)
    for (trial <- 0 until 6) {
      val n = 20 + rng.nextInt(60)
      val succ = (0L until n.toLong).map { i =>
        val r = rng.nextDouble()
        val s = if (i == 0 || r < 0.15) -1L
        else if (r < 0.25) n.toLong + rng.nextInt(5)
        else rng.nextLong(i)
        i -> s
      }.toMap
      val want = succ.keys.map { id =>
        var cur = succ(id); var nc = 0L; var nd = 0L
        if (cur >= 0) {
          if (diag(id, cur)) nd += 1 else nc += 1
          while (succ.get(cur).exists(_ >= 0)) {
            val nxt = succ(cur)
            if (diag(cur, nxt)) nd += 1 else nc += 1
            cur = nxt
          }
        }
        // pits carry sink = id through the union domain
        (id, nc, nd, if (succ(id) >= 0) cur else id)
      }.toSet
      val df = succ.toSeq.toDF("id", "succ").repartition(5)
      val got = HydroOps.flowLengths(df, w).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("flowLengths long chain: multi-round payload accumulation stays exact") {
    import spark.implicits._
    val w = 7
    val n = 300L
    val succ = (0L until n).map(i => i -> (if (i == n - 1) -1L else i + 1)).toMap
    val df = succ.toSeq.toDF("id", "succ").repartition(5)
    val got = HydroOps.flowLengths(df, w).collect()
      .map(r => (r.getLong(0), r.getLong(1) + r.getLong(2))).toMap
    // +1 steps are never diagonal at width 7 except across a row wrap —
    // total steps from i is always n-1-i either way
    (0L until n).foreach(i => assert(got(i) == n - 1 - i, s"cell $i"))
  }

  test("long chain forces multi-round doubling; acc(j) = j") {
    import spark.implicits._
    val n = 300L
    val succ = (0L until n).map(i => i -> (if (i == n - 1) -1L else i + 1)).toMap
    val got = runEngine(succ)
    assert(got.length == (n * (n - 1) / 2).toInt)
    val acc = got.groupBy(_._2).map { case (v, s) => (v, s.size.toLong) }
    (1L until n).foreach(j => assert(acc(j) == j, s"node $j"))
  }

  test("flowAccum on sf0.001 == local recompute over the level-1 grid") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (c1, w1, h1) = RasterOps.level1Cells(spark, dir)
    val cells = c1.collect()
    val g = Array.ofDim[Double](w1 * h1)
    cells.foreach { case (x, y, v) => g(y * w1 + x) = v }
    def v(y: Int, x: Int) = g(y * w1 + x)
    val Q = 1048576.0
    val succ = (for (y <- 1 to h1 - 2; x <- 1 to w1 - 2) yield {
      val packed = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) yield {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) math.sqrt(2.0) else 1.0
        math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
      }).max
      val id = y.toLong * w1 + x
      if (packed >= 16L) {
        val d = 8L - packed % 16L
        id -> ((y - (d / 3 - 1)) * w1 + (x - (d % 3 - 1)))
      } else id -> -1L
    }).toMap
    val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    pairsOf(succ).foreach { case (_, node) => if (succ.contains(node)) acc(node) += 1L }
    val want = succ.keys.toSeq.map(id => (id, acc(id)))
      .groupBy(_._2).map { case (a, s) => (a, s.size.toLong, s.map(_._1).sum) }
      .toSeq.sortBy(_._1)
    val got = HydroOps.flowAccum(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.map(_._2).sum == ((w1 - 2).toLong * (h1 - 2)))
  }

  test("basinBorders on sf0.001 == local sink-walk + adjacency census; closure holds") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (w, h) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)].collect()
    val g = Array.ofDim[Double](w * h)
    cells.foreach { case (x, y, v) => g(y * w + x) = v }
    def v(y: Int, x: Int) = g(y * w + x)
    val Q = 1048576.0
    val succ = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
      val packed = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) yield {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) math.sqrt(2.0) else 1.0
        math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
      }).max
      val id = y.toLong * w + x
      if (packed >= 16L) {
        val d = 8L - packed % 16L
        id -> ((y - (d / 3 - 1)) * w + (x - (d % 3 - 1)))
      } else id -> -1L
    }).toMap
    // a cell whose succ points OUTSIDE the interior keyset is terminal at
    // that target (the engine's pointer walk stops there)
    def sink(id: Long): Long = {
      var cur = id
      while (succ.get(cur).exists(_ >= 0L)) cur = succ(cur)
      cur
    }
    val lbl = succ.keys.map(id => id -> sink(id)).toMap
    val pairs = lbl.keys.toSeq.flatMap { id =>
      Seq(id + 1L, id + w.toLong).filter(lbl.contains)
        .map(nb => (lbl(id), lbl(nb)))
    }
    val border = pairs.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val want = (pairs.size.toLong, pairs.count(p => p._1 == p._2).toLong,
      border.size.toLong, border.map(_._2).sum, border.map(_._2).max,
      border.map(_._1._1).sum, border.map(_._1._2).sum)
    val got = HydroOps.basinBorders(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).head
    assert(got == want)
    // closure: adjacency count is a pure function of the interior dims
    val iw = (w - 2).toLong; val ih = (h - 2).toLong
    assert(want._1 == (iw - 1) * ih + iw * (ih - 1), "adjacency closure")
    assert(want._2 + want._4 == want._1, "internal + border == total")
    assert(want._3 > 1L, "multiple basin pairs must exist on real terrain")
  }

  test("basinPour on sf0.001 == local sink-walk + saddle census; argmin pinned") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (w, h) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)].collect()
    val g = Array.ofDim[Double](w * h)
    cells.foreach { case (x, y, v) => g(y * w + x) = v }
    def v(y: Int, x: Int) = g(y * w + x)
    val Q = 1048576.0
    val succ = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
      val packed = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) yield {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) math.sqrt(2.0) else 1.0
        math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
      }).max
      val id = y.toLong * w + x
      if (packed >= 16L) {
        val d = 8L - packed % 16L
        id -> ((y - (d / 3 - 1)) * w + (x - (d % 3 - 1)))
      } else id -> -1L
    }).toMap
    def sink(id: Long): Long = {
      var cur = id
      while (succ.get(cur).exists(_ >= 0L)) cur = succ(cur)
      cur
    }
    val lbl = succ.keys.map(id => id -> sink(id)).toMap
    def qv(id: Long) = math.floor(g(id.toInt) * Q).toLong
    val pours = lbl.keys.toSeq.flatMap { id =>
      Seq(id + 1L, id + w.toLong).filter(lbl.contains).flatMap { nb =>
        if (lbl(id) == lbl(nb)) None
        else Some(((math.min(lbl(id), lbl(nb)), math.max(lbl(id), lbl(nb))),
          math.max(qv(id), qv(nb))))
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toSeq
    val amin = pours.map { case ((lo, hi), p) => (p, lo, hi) }.min
    val want = (pours.size.toLong, pours.map(_._2).min, pours.map(_._2).max,
      pours.map(_._2).sum, amin._2, amin._3)
    val got = HydroOps.basinPour(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).head
    assert(got == want)
    assert(want._1 > 1L, "multiple basin pairs must exist on real terrain")
    // cross-operator closure: same pair universe as basinBorders
    val nbp = HydroOps.basinBorders(spark, dir).collect().head.getLong(2)
    assert(got._1 == nbp, "pair count must match basinBorders")
  }

  test("riparianOf == local Moore-buffer set algebra; interior edge never wraps") {
    import spark.implicits._
    def run(w: Int, h: Int, accOf: (Int, Int) => Long): Unit = {
      val dom = (for (y <- 1 until h - 1; x <- 1 until w - 1)
        yield (y.toLong * w + x, accOf(x, y))).toSeq
      val got = HydroOps.riparianOf(dom.toDF("id", "acc"), w).collect().head
      val chan = dom.filter(_._2 >= HydroOps.ChannelAcc).map(_._1).toSet
      val domSet = dom.map(_._1).toSet
      val near = chan.flatMap(id =>
        Seq(-w - 1, -w, -w + 1, -1, 1, w - 1, w, w + 1).map(o => id + o))
        .intersect(domSet) -- chan
      val want = (chan.size.toLong, chan.sum, near.size.toLong, near.sum,
        (domSet.size - chan.size - near.size).toLong)
      assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
        got.getLong(4)) == want, s"w=$w h=$h")
    }
    // channel hugging the right interior edge: id+1 shifts must fall OFF
    // the domain, never wrap into the next row's left edge
    run(8, 6, (x, _) => if (x == 6) 9L else 0L)
    run(8, 6, (_, _) => 0L) // empty channel: coalesced zero sums
    val rnd = new scala.util.Random(71)
    for (_ <- 0 until 3) {
      val vals = scala.collection.mutable.Map.empty[(Int, Int), Long]
      run(7 + rnd.nextInt(8), 6 + rnd.nextInt(6),
        (x, y) => vals.getOrElseUpdate((x, y), rnd.nextLong(8)))
    }
  }

  test("basinHypso on sf0.001 == local sink-walk + integer decile recompute") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (w, h) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)].collect()
    val g = Array.ofDim[Double](w * h)
    cells.foreach { case (x, y, v) => g(y * w + x) = v }
    def v(y: Int, x: Int) = g(y * w + x)
    val Q = 1048576.0
    val succ = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
      val packed = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) yield {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) math.sqrt(2.0) else 1.0
        math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
      }).max
      val id = y.toLong * w + x
      if (packed >= 16L) {
        val d = 8L - packed % 16L
        id -> ((y - (d / 3 - 1)) * w + (x - (d % 3 - 1)))
      } else id -> -1L
    }).toMap
    def sink(id: Long): Long = {
      var cur = id
      while (succ.get(cur).exists(_ >= 0L)) cur = succ(cur)
      cur
    }
    def qv(id: Long) = math.floor(g(id.toInt) * Q).toLong
    val bas = succ.keys.toSeq.groupBy(sink).toSeq.map { case (s, ids) =>
      val qs = ids.map(qv)
      val n = ids.size.toLong
      val dec = if (qs.max == qs.min) 10L
        else ((qs.sum - n * qs.min) * 10L) / (n * (qs.max - qs.min))
      (s, n, dec)
    }
    val want = bas.groupBy(_._3).toSeq.map { case (d, bs) =>
      (d, bs.size.toLong, bs.map(_._2).sum, bs.map(_._1).sum)
    }.sortBy(_._1)
    val got = HydroOps.basinHypso(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(want.count(_._1 <= 9L) > 1, "real terrain must spread over deciles")
  }

  test("basinMelton on sf0.001 == local sink-walk + integer mr2 recompute") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (w, h) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)].collect()
    val g = Array.ofDim[Double](w * h)
    cells.foreach { case (x, y, v) => g(y * w + x) = v }
    def v(y: Int, x: Int) = g(y * w + x)
    val Q = 1048576.0
    val succ = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
      val packed = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) yield {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) math.sqrt(2.0) else 1.0
        math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
      }).max
      val id = y.toLong * w + x
      if (packed >= 16L) {
        val d = 8L - packed % 16L
        id -> ((y - (d / 3 - 1)) * w + (x - (d % 3 - 1)))
      } else id -> -1L
    }).toMap
    def sink(id: Long): Long = {
      var cur = id
      while (succ.get(cur).exists(_ >= 0L)) cur = succ(cur)
      cur
    }
    def qv(id: Long) = math.floor(g(id.toInt) * Q).toLong
    def bucket(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x + 1L)
    val bas = succ.keys.toSeq.groupBy(sink).toSeq.map { case (s, ids) =>
      val qs = ids.map(qv)
      val rel = qs.max - qs.min
      (s, ids.size.toLong, rel * rel / ids.size)
    }
    val want = bas.groupBy(b => bucket(b._3).toLong).toSeq.map { case (b, bs) =>
      (b, bs.size.toLong, bs.map(_._2).sum, bs.map(_._1).sum, bs.map(_._3).max)
    }.sortBy(_._1)
    val got = HydroOps.basinMelton(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(want.size > 2, "real terrain must spread over mr2 buckets")
  }

  test("basinDepth on sf0.001 == local spill - pit elevation census") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (w, h) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)].collect()
    val g = Array.ofDim[Double](w * h)
    cells.foreach { case (x, y, v) => g(y * w + x) = v }
    def v(y: Int, x: Int) = g(y * w + x)
    val Q = 1048576.0
    val succ = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
      val packed = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) yield {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) math.sqrt(2.0) else 1.0
        math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
      }).max
      val id = y.toLong * w + x
      if (packed >= 16L) {
        val d = 8L - packed % 16L
        id -> ((y - (d / 3 - 1)) * w + (x - (d % 3 - 1)))
      } else id -> -1L
    }).toMap
    def sink(id: Long): Long = {
      var cur = id
      while (succ.get(cur).exists(_ >= 0L)) cur = succ(cur)
      cur
    }
    val lbl = succ.keys.map(id => id -> sink(id)).toMap
    def qv(id: Long) = math.floor(g(id.toInt) * Q).toLong
    val spill = scala.collection.mutable.Map.empty[Long, Long]
    lbl.keys.foreach { id =>
      Seq(id + 1L, id + w.toLong).filter(lbl.contains).foreach { nb =>
        if (lbl(id) != lbl(nb)) {
          val cr = math.max(qv(id), qv(nb))
          Seq(lbl(id), lbl(nb)).foreach { s =>
            spill(s) = math.min(spill.getOrElse(s, Long.MaxValue), cr)
          }
        }
      }
    }
    // .toSeq BEFORE collect: collecting pairs out of a Map would rebuild
    // a Map keyed by depth and silently collapse equal-depth pits
    val depths = succ.toSeq.collect { case (id, -1L) if spill.contains(id) =>
      (spill(id) - qv(id), id)
    }
    val dm = depths.max
    val want = (depths.size.toLong, depths.map(_._1).min, depths.map(_._1).max,
      depths.map(_._1).sum, dm._1, dm._2)
    val got = HydroOps.basinDepth(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).head
    assert(got == want)
    assert(want._1 > 1L, "real terrain must hold several pits")
    assert(want._3 > 0L, "the deepest pit must hold water")
  }

  test("basinElong on sf0.001 == local sink-walk + integer bbox recompute") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (w, h) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)].collect()
    val g = Array.ofDim[Double](w * h)
    cells.foreach { case (x, y, v) => g(y * w + x) = v }
    def v(y: Int, x: Int) = g(y * w + x)
    val Q = 1048576.0
    val succ = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
      val packed = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) yield {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) math.sqrt(2.0) else 1.0
        math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
      }).max
      val id = y.toLong * w + x
      if (packed >= 16L) {
        val d = 8L - packed % 16L
        id -> ((y - (d / 3 - 1)) * w + (x - (d % 3 - 1)))
      } else id -> -1L
    }).toMap
    def sink(id: Long): Long = {
      var cur = id
      while (succ.get(cur).exists(_ >= 0L)) cur = succ(cur)
      cur
    }
    val bas = succ.keys.toSeq.groupBy(sink).toSeq.map { case (s, ids) =>
      val xs = ids.map(_ % w); val ys = ids.map(_ / w)
      val bw = xs.max - xs.min + 1L; val bh = ys.max - ys.min + 1L
      val n = ids.size.toLong
      (s, n, bw * bh, (n * 10L) / (bw * bh),
        (math.max(bw, bh) * 1000L) / math.min(bw, bh))
    }
    val want = bas.groupBy(_._4).toSeq.map { case (d, bs) =>
      (d, bs.size.toLong, bs.map(_._2).sum, bs.map(_._1).sum,
        bs.map(_._3).sum, bs.map(_._5).max)
    }.sortBy(_._1)
    val got = HydroOps.basinElong(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    assert(want.exists(_._1 == 10L), "single-cell basins must pin decile 10")
    assert(want.count(_._1 < 10L) > 1, "real basins must spread below full fill")
  }

  test("basinDomdir on sf0.001 == local modal-direction recompute") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (w, h) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)].collect()
    val g = Array.ofDim[Double](w * h)
    cells.foreach { case (x, y, v) => g(y * w + x) = v }
    def v(y: Int, x: Int) = g(y * w + x)
    val Q = 1048576.0
    val succ = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
      val packed = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) yield {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) math.sqrt(2.0) else 1.0
        math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
      }).max
      val id = y.toLong * w + x
      if (packed >= 16L) {
        val d = 8L - packed % 16L
        id -> ((y - (d / 3 - 1)) * w + (x - (d % 3 - 1)))
      } else id -> -1L
    }).toMap
    def sink(id: Long): Long = {
      var cur = id
      while (succ.get(cur).exists(_ >= 0L)) cur = succ(cur)
      cur
    }
    def d8(id: Long): Long = {
      val s = succ(id)
      if (s < 0L) 4L else (s / w - id / w + 1L) * 3L + (s % w - id % w + 1L)
    }
    val bas = succ.keys.toSeq.groupBy(sink).toSeq.map { case (s, ids) =>
      val byDir = ids.groupBy(d8).toSeq.map { case (dd, cs) => cs.size.toLong * 16L + dd }
      val pk = byDir.max
      val n = ids.size.toLong
      (s, n, pk % 16L, ((pk / 16L) * 10L) / n)
    }
    val want = bas.groupBy(b => (b._3, b._4)).toSeq.map { case ((dd, sd), bs) =>
      (dd, sd, bs.size.toLong, bs.map(_._2).sum, bs.map(_._1).sum)
    }.sortBy(r => (r._1, r._2))
    val got = HydroOps.basinDomdir(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // (4, 10) would need a single-cell PIT basin — sf0.001's single-cell
    // basins all drain off-grid, so assert the robust shape instead
    assert(want.map(_._1).distinct.size > 2, "modal directions must spread")
    assert(want.exists(_._2 == 10L), "unanimous basins must exist")
    assert(want.exists(b => b._1 != 4L && b._2 < 10L),
      "multi-cell basins must spread below full share")
  }

  test("flowSinuosity on sf0.001 == local path-vs-chord integer recompute") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (w, h) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)].collect()
    val g = Array.ofDim[Double](w * h)
    cells.foreach { case (x, y, v) => g(y * w + x) = v }
    def v(y: Int, x: Int) = g(y * w + x)
    val Q = 1048576.0
    val succ = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
      val packed = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) yield {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) math.sqrt(2.0) else 1.0
        math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
      }).max
      val id = y.toLong * w + x
      if (packed >= 16L) {
        val d = 8L - packed % 16L
        id -> ((y - (d / 3 - 1)) * w + (x - (d % 3 - 1)))
      } else id -> -1L
    }).toMap
    def diag(a: Long, b: Long): Boolean = b % w != a % w && b / w != a / w
    val perCell = succ.toSeq.filter(_._2 >= 0L).map { case (id, first) =>
      var cur = first; var nc = 0L; var nd = 0L
      if (diag(id, cur)) nd += 1 else nc += 1
      while (succ.get(cur).exists(_ >= 0L)) {
        val nxt = succ(cur)
        if (diag(cur, nxt)) nd += 1 else nc += 1
        cur = nxt
      }
      val pq = nc * 1000L + nd * 1414L
      val dx = cur % w - id % w; val dy = cur / w - id / w
      val dist2 = dx * dx + dy * dy
      (id, (pq * pq) / (dist2 * 1000L))
    }
    val want = perCell.groupBy(c => java.lang.Long.toBinaryString(c._2).length.toLong)
      .toSeq.map { case (b, cs) =>
        (b, cs.size.toLong, cs.map(_._1).sum, cs.map(_._2).sum, cs.map(_._2).max)
      }.sortBy(_._1)
    val got = HydroOps.flowSinuosity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // the census must see both near-straight paths and real meanders
    assert(perCell.exists(_._2 <= 1000L), "no straight path in the census")
    assert(perCell.exists(_._2 > 2000L), "no meandering path in the census")
  }

  test("flowIndegree on sf0.001 == local inflow-count recompute") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val (w, h) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)].collect()
    val g = Array.ofDim[Double](w * h)
    cells.foreach { case (x, y, v) => g(y * w + x) = v }
    def v(y: Int, x: Int) = g(y * w + x)
    val Q = 1048576.0
    val succ = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
      val packed = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) yield {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) math.sqrt(2.0) else 1.0
        math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
      }).max
      val id = y.toLong * w + x
      if (packed >= 16L) {
        val d = 8L - packed % 16L
        id -> ((y - (d / 3 - 1)) * w + (x - (d % 3 - 1)))
      } else id -> -1L
    }).toMap
    // interior->interior inflow counts only: edges into boundary cells
    // target ids outside the succ key set and drop (the stated contract)
    val indeg = succ.toSeq.collect { case (_, s) if succ.contains(s) => s }
      .groupBy(identity).map { case (id, hits) => id -> hits.size.toLong }
    val want = succ.keys.toSeq
      .map(id => (indeg.getOrElse(id, 0L), if (succ(id) == -1L) 1L else 0L, id))
      .groupBy(t => (t._1, t._2)).toSeq.map { case ((d, p), cs) =>
        (d, p, cs.size.toLong, cs.map(_._3).sum)
      }.sortBy(t => (t._1, t._2))
    val got = HydroOps.flowIndegree(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(want.exists(t => t._1 >= 2L), "real terrain must hold junctions")
    assert(want.exists(t => t._1 == 0L), "ridge sources must exist")
  }

  /** Local drainage recompute over a functional forest: sinks by path
    * walk (terminal = pit or out-of-domain target), acc(v) = number of
    * strict ancestors whose path passes v, basins folded into the
    * channel-count histogram — the sequential formulation of
    * drainageCensus's pointer-doubling + doubled-composition plan.
    */
  private def drainageLocal(succ: Map[Long, Long], k: Long): Seq[(Long, Long, Long, Long)] = {
    def sink(id: Long): Long = {
      var cur = id
      while (succ.get(cur).exists(_ >= 0L)) cur = succ(cur)
      cur
    }
    val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    succ.keys.foreach { id =>
      var cur = succ(id)
      while (cur >= 0L) {
        acc(cur) += 1L
        cur = succ.get(cur).getOrElse(-1L)
      }
    }
    succ.keys.toSeq.map(id => (sink(id), id))
      .groupBy(_._1).toSeq
      .map { case (s, vs) =>
        (s, vs.size.toLong, vs.count(v => acc(v._2) >= k).toLong)
      }
      .groupBy(_._3).toSeq
      .map { case (nch, bs) =>
        (nch, bs.size.toLong, bs.map(_._2).sum, bs.map(_._1).sum)
      }.sortBy(_._1)
  }

  test("drainageCensus == local acc/sink recompute on random forests") {
    import spark.implicits._
    val rng = new scala.util.Random(690690L)
    var sawChannel = false
    for (trial <- 0 until 6) {
      val n = 40 + rng.nextInt(80)
      val succ = (0L until n.toLong).map { i =>
        val r = rng.nextDouble()
        val s = if (i == 0 || r < 0.15) -1L
        else if (r < 0.22) n.toLong + rng.nextInt(4)
        else rng.nextLong(i)
        i -> s
      }.toMap
      val want = drainageLocal(succ, HydroOps.ChannelAcc)
      val got = HydroOps.drainageCensus(succ.toSeq.toDF("id", "succ").repartition(5))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == want, s"trial $trial")
      if (want.exists(_._1 > 0L)) sawChannel = true
    }
    assert(sawChannel, "the trials must exercise a genuine channel cell")
  }

  /** Memoized sequential Strahler over a functional forest: children
    * lists from the successor map, order(v) = max child order (+1 when
    * >= 2 children attain the max), leaves order 1. The node domain is
    * every key plus every successor target, matching the engine.
    */
  private def strahlerLocal(succ: Map[Long, Long]): Map[Long, Long] = {
    val nodes = succ.keySet ++ succ.values.filter(_ >= 0L)
    val children = succ.toSeq.filter(_._2 >= 0L).groupBy(_._2)
      .view.mapValues(_.map(_._1)).toMap
    val memo = scala.collection.mutable.Map.empty[Long, Long]
    def ord(v: Long): Long = memo.getOrElseUpdate(v, {
      val cs = children.getOrElse(v, Nil).map(ord)
      if (cs.isEmpty) 1L
      else {
        val m = cs.max
        if (cs.count(_ == m) >= 2) m + 1 else m
      }
    })
    nodes.map(v => v -> ord(v)).toMap
  }

  test("strahlerOrders == memoized sequential Strahler on random forests") {
    import spark.implicits._
    val rng = new scala.util.Random(580580L)
    var sawOrder3 = false
    for (trial <- 0 until 8) {
      val n = 30 + rng.nextInt(80)
      val succ = (0L until n.toLong).map { i =>
        val r = rng.nextDouble()
        val s = if (i == 0 || r < 0.12) -1L
        else if (r < 0.2) n.toLong + rng.nextInt(4)
        else rng.nextLong(i)
        i -> s
      }.toMap
      val want = strahlerLocal(succ).toSeq
        .groupBy(_._2).map { case (o, vs) => (o, vs.size.toLong, vs.map(_._1).sum) }
        .toSeq.sortBy(_._1)
      val got = HydroOps.strahlerOrders(succ.toSeq.toDF("id", "succ").repartition(5))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"trial $trial")
      if (want.exists(_._1 >= 3L)) sawOrder3 = true
    }
    assert(sawOrder3, "the trials must exercise a genuine order-3 confluence")
  }

  test("strahler long chain: a path graph is order 1 everywhere") {
    import spark.implicits._
    val n = 200L
    val succ = (0L until n).map(i => i -> (if (i == n - 1) -1L else i + 1)).toMap
    val got = HydroOps.strahlerOrders(succ.toSeq.toDF("id", "succ").repartition(3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, n, n * (n - 1) / 2)))
  }

  test("channelCensus == local longest-path recompute on random forests") {
    import spark.implicits._
    val rng = new scala.util.Random(730730L)
    var sawDeep = false
    for (trial <- 0 until 6) {
      val n = 40 + rng.nextInt(80)
      val succ = (0L until n.toLong).map { i =>
        val r = rng.nextDouble()
        val s = if (i == 0 || r < 0.15) -1L
        else if (r < 0.22) n.toLong + rng.nextInt(4)
        else rng.nextLong(i)
        i -> s
      }.toMap
      def sink(id: Long): Long = {
        var c = id; while (succ.get(c).exists(_ >= 0L)) c = succ(c); c
      }
      def steps(id: Long): Long = {
        var c = id; var k = 0L
        while (succ.get(c).exists(_ >= 0L)) { k += 1; c = succ(c) }
        k
      }
      val bas = succ.keys.toSeq.groupBy(sink).toSeq.map { case (s, ids) =>
        val hd = ids.map(id => (steps(id), id)).max
        (s, ids.size.toLong, hd._1, hd._2)
      }
      val want = bas.groupBy(_._3).toSeq.map { case (ms, bs) =>
        (ms, bs.size.toLong, bs.map(_._2).sum, bs.map(_._1).sum, bs.map(_._4).sum)
      }.sortBy(_._1)
      val got = HydroOps.channelCensus(
          succ.toSeq.toDF("id", "succ").repartition(5), 50)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(got == want, s"trial $trial")
      if (want.exists(_._1 >= 3L)) sawDeep = true
    }
    assert(sawDeep, "the trials must exercise a genuinely deep main channel")
  }

  test("wetness on sf0.001 == local digit-count log2 x slope-bucket matrix") {
    val dir = "/root/testdata/sf0.001"
    val (c1, w1, h1) = RasterOps.level1Cells(spark, dir)
    val cells = c1.collect()
    val g = Array.ofDim[Double](w1 * h1)
    cells.foreach { case (x, y, v) => g(y * w1 + x) = v }
    def v(y: Int, x: Int) = g(y * w1 + x)
    val Q = 1048576.0
    def slot(y: Int, x: Int, o: Int) = v(y - (o / 3 - 1), x - (o % 3 - 1))
    val succ = (for (y <- 1 to h1 - 2; x <- 1 to w1 - 2) yield {
      val packed = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) yield {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) math.sqrt(2.0) else 1.0
        math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
      }).max
      val id = y.toLong * w1 + x
      if (packed >= 16L) {
        val d = 8L - packed % 16L
        id -> ((y - (d / 3 - 1)) * w1 + (x - (d % 3 - 1)))
      } else id -> -1L
    }).toMap
    val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    pairsOf(succ).foreach { case (_, node) => if (succ.contains(node)) acc(node) += 1L }
    val want = (for (y <- 1 to h1 - 2; x <- 1 to w1 - 2) yield {
      def s(o: Int) = slot(y, x, o)
      val gx = (((s(0) + s(3) * 2.0) + s(6)) - ((s(2) + s(5) * 2.0) + s(8))) / 8.0
      val gy = (((s(0) + s(1) * 2.0) + s(2)) - ((s(6) + s(7) * 2.0) + s(8))) / 8.0
      val q = math.floor(math.sqrt(gx * gx + gy * gy) * Q).toLong
      val id = y.toLong * w1 + x
      // digit count = floor(log2) + 1, exactly
      ((63 - java.lang.Long.numberOfLeadingZeros(acc(id) + 1)).toLong,
        q / 524288L, id)
    }).groupBy(t => (t._1, t._2)).map { case ((ab, sb), rs) =>
      (ab, sb, rs.size.toLong, rs.map(_._3).sum)
    }.toSeq.sorted
    val got = HydroOps.wetness(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(want.map(_._1).distinct.size > 1, "acc buckets must spread")
    assert(want.map(_._2).distinct.size > 1, "slope buckets must spread")
  }

  test("streamPower on sf0.001 == local slope x (acc + 1) recompute") {
    val dir = "/root/testdata/sf0.001"
    val (c1, w1, h1) = RasterOps.level1Cells(spark, dir)
    val cells = c1.collect()
    val g = Array.ofDim[Double](w1 * h1)
    cells.foreach { case (x, y, v) => g(y * w1 + x) = v }
    def v(y: Int, x: Int) = g(y * w1 + x)
    val Q = 1048576.0
    def slot(y: Int, x: Int, o: Int) = v(y - (o / 3 - 1), x - (o % 3 - 1))
    val succ = (for (y <- 1 to h1 - 2; x <- 1 to w1 - 2) yield {
      val packed = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) yield {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) math.sqrt(2.0) else 1.0
        math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
      }).max
      val id = y.toLong * w1 + x
      if (packed >= 16L) {
        val d = 8L - packed % 16L
        id -> ((y - (d / 3 - 1)) * w1 + (x - (d % 3 - 1)))
      } else id -> -1L
    }).toMap
    val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    pairsOf(succ).foreach { case (_, node) => if (succ.contains(node)) acc(node) += 1L }
    val want = (for (y <- 1 to h1 - 2; x <- 1 to w1 - 2) yield {
      def s(o: Int) = slot(y, x, o)
      val gx = (((s(0) + s(3) * 2.0) + s(6)) - ((s(2) + s(5) * 2.0) + s(8))) / 8.0
      val gy = (((s(0) + s(1) * 2.0) + s(2)) - ((s(6) + s(7) * 2.0) + s(8))) / 8.0
      val q = math.floor(math.sqrt(gx * gx + gy * gy) * Q).toLong
      val id = y.toLong * w1 + x
      (y.toLong, q * (acc(id) + 1L))
    }).groupBy(_._1).map { case (y, s) =>
      (y, s.size.toLong, s.map(_._2).sum, s.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val got = HydroOps.streamPower(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(want.exists(_._3 > 0))
  }
}

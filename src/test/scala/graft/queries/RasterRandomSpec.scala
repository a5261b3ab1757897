package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Random-dimension property tests for the grid-agnostic raster cores:
  * the events table is always 100 x h, so its oracle runs never exercise
  * tiny, odd, or degenerate dims — these seeded trials do (w or h down to
  * 1, where the 3x3 interior is empty and every upsample corner clamps).
  * Each trial compares bit-for-bit against an independent single-threaded
  * recompute of the same fixed-order expressions.
  */
class RasterRandomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val Q = 1048576.0

  private def randGrid(rng: scala.util.Random, w: Int, h: Int): Array[Double] =
    Array.fill(w * h)(math.floor(rng.nextDouble() * 256.0 * 64.0) / 64.0)

  private def cellsDf(g: Array[Double], w: Int, h: Int) = {
    import spark.implicits._
    (0 until w * h).map(i => (i % w, i / w, g(i))).toDF("x", "y", "v")
  }

  test("focalMean / hornSlope / d8FlowDir on random dims == local recompute") {
    val rng = new scala.util.Random(20260817L)
    for (_ <- 0 until 12) {
      val w = 1 + rng.nextInt(9)
      val h = 1 + rng.nextInt(9)
      val g = randGrid(rng, w, h)
      def v(y: Int, x: Int) = g(y * w + x)
      val cells = cellsDf(g, w, h)

      val wantMean = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
        def s(o: Int) = v(y - (o / 3 - 1), x - (o % 3 - 1))
        (y.toLong, math.floor(((((s(0) + s(1)) + s(2)) + ((s(3) + s(4)) + s(5)))
          + ((s(6) + s(7)) + s(8))) / 9.0 * Q).toLong)
      }).groupBy(_._1).map { case (y, qs) =>
        (y, qs.length.toLong, qs.map(_._2).sum, qs.map(_._2).min, qs.map(_._2).max)
      }.toSeq.sortBy(_._1)
      val gotMean = RasterOps.focalMeanOf(cells, w, h).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(gotMean == wantMean, s"focal ${w}x$h")

      val wantSlope = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
        def s(o: Int) = v(y - (o / 3 - 1), x - (o % 3 - 1))
        val gx = (((s(0) + s(3) * 2.0) + s(6)) - ((s(2) + s(5) * 2.0) + s(8))) / 8.0
        val gy = (((s(0) + s(1) * 2.0) + s(2)) - ((s(6) + s(7) * 2.0) + s(8))) / 8.0
        (y.toLong, math.floor(math.sqrt(gx * gx + gy * gy) * Q).toLong)
      }).groupBy(_._1).map { case (y, qs) =>
        (y, qs.length.toLong, qs.map(_._2).sum, qs.map(_._2).min, qs.map(_._2).max)
      }.toSeq.sortBy(_._1)
      val gotSlope = RasterOps.hornSlopeOf(cells, w, h).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(gotSlope == wantSlope, s"slope ${w}x$h")

      val wantShade = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
        def s(o: Int) = v(y - (o / 3 - 1), x - (o % 3 - 1))
        val gx = (((s(0) + s(3) * 2.0) + s(6)) - ((s(2) + s(5) * 2.0) + s(8))) / 8.0
        val gy = (((s(0) + s(1) * 2.0) + s(2)) - ((s(6) + s(7) * 2.0) + s(8))) / 8.0
        val shade = ((gx * 0.5 - gy * 0.5) + math.sqrt(2.0) / 2.0) /
          math.sqrt((1.0 + gx * gx) + gy * gy)
        (y.toLong, math.floor(math.max(shade, 0.0) * Q).toLong)
      }).groupBy(_._1).map { case (y, qs) =>
        (y, qs.length.toLong, qs.map(_._2).sum, qs.map(_._2).min, qs.map(_._2).max)
      }.toSeq.sortBy(_._1)
      val gotShade = RasterOps.hillshadeOf(cells, w, h).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(gotShade == wantShade, s"hillshade ${w}x$h")

      val sqrt2 = math.sqrt(2.0)
      val hist = scala.collection.mutable.Map[Long, (Long, Long)]()
      for (y <- 1 to h - 2; x <- 1 to w - 2) {
        var pmax = Long.MinValue
        for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) {
          val dxo = o % 3 - 1; val dyo = o / 3 - 1
          val dist = if (dxo != 0 && dyo != 0) sqrt2 else 1.0
          val p = math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
          if (p > pmax) pmax = p
        }
        val d = if (pmax >= 16L) 8L - pmax % 16L else -1L
        val (n, m) = hist.getOrElse(d, (0L, Long.MinValue))
        hist(d) = (n + 1, math.max(m, pmax))
      }
      val wantD8 = hist.toSeq.map { case (d, (n, m)) => (d, n, m) }.sortBy(_._1)
      val gotD8 = RasterOps.d8FlowDirOf(cells, w, h).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(gotD8 == wantD8, s"d8 ${w}x$h")
    }
  }

  test("slopeCells tiled per-cell emission == local recompute on random grids and tilings") {
    import spark.implicits._
    val rng = new scala.util.Random(606060L)
    for (trial <- 0 until 8) {
      val w = 1 + rng.nextInt(24)
      val h = 1 + rng.nextInt(24)
      val tw = 1 + rng.nextInt(9)
      val th = 1 + rng.nextInt(9)
      val g = randGrid(rng, w, h)
      def v(y: Int, x: Int) = g(y * w + x)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      val want = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
        def s(o: Int) = v(y - (o / 3 - 1), x - (o % 3 - 1))
        val gx = (((s(0) + s(3) * 2.0) + s(6)) - ((s(2) + s(5) * 2.0) + s(8))) / 8.0
        val gy = (((s(0) + s(1) * 2.0) + s(2)) - ((s(6) + s(7) * 2.0) + s(8))) / 8.0
        (y.toLong * w + x, math.floor(math.sqrt(gx * gx + gy * gy) * Q).toLong)
      }).sortBy(_._1)
      val got = RasterOps.slopeCellsTiledOf(typed, w, h, tw, th).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
      assert(got == want, s"trial $trial: ${w}x$h tiles ${tw}x$th")
      // each owned cell emitted exactly once across tiles
      assert(got.map(_._1).distinct.size == got.size)
    }
  }

  test("curvature on random dims == local Zevenbergen-Thorne recompute") {
    val rng = new scala.util.Random(81818181L)
    var sawNonzero = false
    for (_ <- 0 until 8) {
      val w = 1 + rng.nextInt(9)
      val h = 1 + rng.nextInt(9)
      val g = randGrid(rng, w, h)
      def v(y: Int, x: Int) = g(y * w + x)
      val cells = cellsDf(g, w, h)
      val perCell = for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
        def s(o: Int) = v(y - (o / 3 - 1), x - (o % 3 - 1))
        val dd = (s(5) + s(3)) / 2.0 - s(4)
        val ee = (s(7) + s(1)) / 2.0 - s(4)
        val ff = ((s(0) - s(2)) + (s(8) - s(6))) / 4.0
        val gg = (s(3) - s(5)) / 2.0
        val hh = (s(1) - s(7)) / 2.0
        val den = gg * gg + hh * hh
        val pl = if (den == 0.0) 0.0
          else 2.0 * ((dd * (hh * hh) + ee * (gg * gg)) - (ff * gg) * hh) / den
        val pr = if (den == 0.0) 0.0
          else -2.0 * ((dd * (gg * gg) + ee * (hh * hh)) + (ff * gg) * hh) / den
        (y.toLong, math.floor(pl * Q).toLong, math.floor(pr * Q).toLong)
      }
      if (perCell.exists(c => c._2 != 0L || c._3 != 0L)) sawNonzero = true
      val want = perCell.groupBy(_._1).map { case (y, qs) =>
        (y, qs.length.toLong, qs.map(_._2).sum, qs.map(_._2).min, qs.map(_._2).max,
          qs.map(_._3).sum, qs.map(_._3).min, qs.map(_._3).max)
      }.toSeq.sortBy(_._1)
      val got = RasterOps.curvatureOf(cells, w, h).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
      assert(got == want, s"curvature ${w}x$h")
    }
    // degenerate-guard: the trials must actually exercise curved cells
    assert(sawNonzero, "every trial produced flat-only curvature — broken test data")
  }

  test("focalCellsTiledOf on random dims and tilings == local recompute, each cell once") {
    import spark.implicits._
    val rng = new scala.util.Random(91919191L)
    for (trial <- 0 until 8) {
      val w = 1 + rng.nextInt(24)
      val h = 1 + rng.nextInt(24)
      val tw = 1 + rng.nextInt(9)
      val th = 1 + rng.nextInt(9)
      val g = randGrid(rng, w, h)
      def v(y: Int, x: Int) = g(y * w + x)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      val want = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
        def s(o: Int) = v(y - (o / 3 - 1), x - (o % 3 - 1))
        ((x - 1, y - 1),
          ((((s(0) + s(1)) + s(2)) + ((s(3) + s(4)) + s(5)))
            + ((s(6) + s(7)) + s(8))) / 9.0)
      }).toMap
      val got = RasterOps.focalCellsTiledOf(typed, w, h, tw, th).collect()
      assert(got.length == want.size, s"trial $trial: ${w}x$h tiles ${tw}x$th")
      // bit-exact values, each re-origined cell exactly once
      assert(got.map { case (x, y, m) => ((x, y), m) }.toMap == want,
        s"trial $trial: ${w}x$h tiles ${tw}x$th")
      assert(got.map(c => (c._1, c._2)).distinct.length == got.length)
    }
  }

  test("medianCellsTiledOf on random dims and tilings == local sorted pick, each cell once") {
    import spark.implicits._
    val rng = new scala.util.Random(60606060L)
    for (trial <- 0 until 8) {
      val w = 1 + rng.nextInt(24)
      val h = 1 + rng.nextInt(24)
      val tw = 1 + rng.nextInt(9)
      val th = 1 + rng.nextInt(9)
      val g = randGrid(rng, w, h)
      def v(y: Int, x: Int) = g(y * w + x)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      val want = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
        val win = for (dy <- -1 to 1; dx <- -1 to 1) yield v(y + dy, x + dx)
        ((x - 1, y - 1), win.sorted.apply(4))
      }).toMap
      val got = RasterOps.medianCellsTiledOf(typed, w, h, tw, th).collect()
      assert(got.length == want.size, s"trial $trial: ${w}x$h tiles ${tw}x$th")
      assert(got.map { case (x, y, m) => ((x, y), m) }.toMap == want,
        s"trial $trial: ${w}x$h tiles ${tw}x$th")
      assert(got.map(c => (c._1, c._2)).distinct.length == got.length)
    }
  }

  test("glcm on random dims == local co-occurrence recompute") {
    import spark.implicits._
    val rng = new scala.util.Random(88888888L)
    var sawOffDiag = false
    for (_ <- 0 until 8) {
      val w = 2 + rng.nextInt(10)
      val h = 2 + rng.nextInt(10)
      val g = randGrid(rng, w, h)
      val qv = g.map(v => math.floor(v * Q).toLong)
      val (mn, mx) = (qv.min, qv.max)
      val gl = qv.map(q => ((q - mn) * 16L) / (mx - mn + 1L))
      def id(i: Int) = i.toLong
      val pairs = (0 until w * h).flatMap { i =>
        val r = if (i % w < w - 1)
          Seq((math.min(gl(i), gl(i + 1)), math.max(gl(i), gl(i + 1)), id(i))) else Nil
        val d = if (i / w < h - 1)
          Seq((math.min(gl(i), gl(i + w)), math.max(gl(i), gl(i + w)), id(i))) else Nil
        r ++ d
      }
      val want = pairs.groupBy(p => (p._1, p._2)).toSeq.map { case ((lo, hi), ps) =>
        (lo, hi, ps.size.toLong, ps.map(_._3).sum, (hi - lo) * (hi - lo) * ps.size)
      }.sortBy(p => (p._1, p._2))
      if (want.exists(p => p._1 != p._2)) sawOffDiag = true
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      val got = RasterOps.glcmOf(typed, w).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got == want, s"glcm ${w}x$h")
    }
    assert(sawOffDiag, "every trial was single-level — broken test data")
  }

  test("halo-tiled kernels == cell-level scatter/pivot bit-for-bit on random grids and tilings") {
    import spark.implicits._
    val rng = new scala.util.Random(505050L)
    def collect5(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    def collect3(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def collect2(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (trial <- 0 until 10) {
      // dims 1..24, tile sizes 1..9 — covers tiles smaller than the halo,
      // single-tile grids, ragged last tiles, and empty interiors
      val w = 1 + rng.nextInt(24)
      val h = 1 + rng.nextInt(24)
      val tw = 1 + rng.nextInt(9)
      val th = 1 + rng.nextInt(9)
      val g = randGrid(rng, w, h)
      val cells = cellsDf(g, w, h)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      val label = s"trial $trial: ${w}x$h tiles ${tw}x$th"
      assert(collect5(RasterOps.focalMeanTiledOf(typed, w, h, tw, th))
        == collect5(RasterOps.focalMeanOf(cells, w, h)), s"focal $label")
      assert(collect5(RasterOps.hornSlopeTiledOf(typed, w, h, tw, th))
        == collect5(RasterOps.hornSlopeOf(cells, w, h)), s"slope $label")
      assert(collect3(RasterOps.d8FlowDirTiledOf(typed, w, h, tw, th))
        == collect3(RasterOps.d8FlowDirOf(cells, w, h)), s"d8 $label")
      assert(collect5(RasterOps.hillshadeTiledOf(typed, w, h, tw, th))
        == collect5(RasterOps.hillshadeOf(cells, w, h)), s"hillshade $label")
      assert(collect5(RasterOps.triTiledOf(typed, w, h, tw, th))
        == collect5(RasterOps.triOf(cells, w, h)), s"tri $label")
      def collect8(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
      assert(collect8(RasterOps.curvatureTiledOf(typed, w, h, tw, th))
        == collect8(RasterOps.curvatureOf(cells, w, h)), s"curvature $label")
      assert(collect2(RasterOps.aspectTiledOf(typed, w, h, tw, th))
        == collect2(RasterOps.aspectOf(cells, w, h)), s"aspect $label")
      assert(collect5(RasterOps.gridUpsampleTiledOf(typed, w, h, tw, th))
        == collect5(RasterOps.gridUpsampleOf(typed, w, h)), s"upsample $label")
      assert(collect5(RasterOps.focalMedianTiledOf(typed, w, h, tw, th))
        == collect5(RasterOps.focalMedianOf(cells, w, h)), s"median $label")
      def collectM(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(collectM(RasterOps.morphTiledOf(typed, w, h, tw, th))
        == collectM(RasterOps.morphOf(cells, w, h)), s"morph $label")
      def collectSucc(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(collectSucc(RasterOps.d8SuccCellsTiledOf(typed, w, h, tw, th))
        == collectSucc(RasterOps.d8SuccOf(cells, w, h)), s"d8succ $label")
    }
  }

  test("lbpHist on random dims and tilings == local bit-pack recompute") {
    import spark.implicits._
    val rng = new scala.util.Random(470470L)
    for (trial <- 0 until 10) {
      val w = 1 + rng.nextInt(24)
      val h = 1 + rng.nextInt(24)
      val g = randGrid(rng, w, h)
      def q(y: Int, x: Int) = math.floor(g(y * w + x) * Q).toLong
      // local reference: quantize-then-compare, bit o for o < 4 / o - 1
      // for o > 4 under the mirrored slot labeling
      val want = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
        val c = q(y, x)
        val code = (for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)
                         if q(y - (o / 3 - 1), x - (o % 3 - 1)) > c)
          yield 1L << (if (o < 4) o else o - 1)).sum
        (code, c)
      }).groupBy(_._1).map { case (code, cs) =>
        (code, cs.length.toLong, cs.map(_._2).sum)
      }.toSeq.sortBy(_._1)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      def got(tw: Int, th: Int) =
        RasterOps.lbpHistTiledOf(typed, w, h, tw, th).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val tw = 1 + rng.nextInt(9); val th = 1 + rng.nextInt(9)
      assert(got(tw, th) == want, s"lbp trial $trial ${w}x$h tiles ${tw}x$th")
      assert(got(50, 50) == want, s"lbp trial $trial ${w}x$h single tile")
    }
  }

  test("criticalPoints on random dims and tilings == local strict-extrema recompute") {
    import spark.implicits._
    val rng = new scala.util.Random(490490L)
    for (trial <- 0 until 10) {
      val w = 1 + rng.nextInt(24)
      val h = 1 + rng.nextInt(24)
      val g = randGrid(rng, w, h)
      def q(y: Int, x: Int) = math.floor(g(y * w + x) * Q).toLong
      val want = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
        val c = q(y, x)
        val nbrs = for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8))
          yield q(y - (o / 3 - 1), x - (o % 3 - 1))
        val isMax = nbrs.forall(_ < c); val isMin = nbrs.forall(_ > c)
        (y.toLong, if (isMax) 1L else 0L, if (isMin) 1L else 0L,
          if (isMax || isMin) c else 0L)
      }).groupBy(_._1).map { case (y, rs) =>
        (y, rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).sum, rs.map(_._4).sum)
      }.toSeq.sortBy(_._1)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      val tw = 1 + rng.nextInt(9); val th = 1 + rng.nextInt(9)
      def got(a: Int, b: Int) =
        RasterOps.criticalPointsTiledOf(typed, w, h, a, b).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(got(tw, th) == want, s"critical trial $trial ${w}x$h tiles ${tw}x$th")
      assert(got(50, 50) == want, s"critical trial $trial ${w}x$h single tile")
    }
  }

  test("saddlePoints on random dims and tilings == local ring-sign-change recompute") {
    import spark.implicits._
    val rng = new scala.util.Random(540540L)
    val rdx = Array(0, 1, 1, 1, 0, -1, -1, -1)
    val rdy = Array(-1, -1, 0, 1, 1, 1, 0, -1)
    for (trial <- 0 until 10) {
      val w = 1 + rng.nextInt(24)
      val h = 1 + rng.nextInt(24)
      val g = randGrid(rng, w, h)
      def q(y: Int, x: Int) = math.floor(g(y * w + x) * Q).toLong
      val want = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
        val c = q(y, x)
        val b = (0 until 8).map(i => q(y + rdy(i), x + rdx(i)) > c)
        val changes = (0 until 8).count(i => b(i) != b((i + 1) % 8))
        (y.toLong, if (changes >= 4) 1L else 0L, if (changes >= 4) c else 0L)
      }).groupBy(_._1).map { case (y, rs) =>
        (y, rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).sum)
      }.toSeq.sortBy(_._1)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      val tw = 1 + rng.nextInt(9); val th = 1 + rng.nextInt(9)
      def got(a: Int, b: Int) =
        RasterOps.saddleTiledOf(typed, w, h, a, b).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got(tw, th) == want, s"saddle trial $trial ${w}x$h tiles ${tw}x$th")
      assert(got(50, 50) == want, s"saddle trial $trial ${w}x$h single tile")
    }
  }

  test("binomial5 blur on random dims and tilings == local separable recompute") {
    import spark.implicits._
    val rng = new scala.util.Random(550550L)
    val wt = Array(1L, 4L, 6L, 4L, 1L)
    for (trial <- 0 until 10) {
      val w = 1 + rng.nextInt(24)
      val h = 1 + rng.nextInt(24)
      val g = randGrid(rng, w, h)
      def q(y: Int, x: Int) = math.floor(g(y * w + x) * Q).toLong
      // local reference is the SEPARABLE composition (rows then columns)
      // — the engine kernel sums the 25 terms directly, so this pins the
      // separability identity the oracle also rests on
      def rowPass(y: Int, x: Int) = (-2 to 2).map(i => wt(i + 2) * q(y, x + i)).sum
      val want = (for (y <- 2 to h - 3; x <- 2 to w - 3) yield {
        (y.toLong, (-2 to 2).map(j => wt(j + 2) * rowPass(y + j, x)).sum)
      }).groupBy(_._1).map { case (y, rs) =>
        (y, rs.length.toLong, rs.map(_._2).sum, rs.map(_._2).min, rs.map(_._2).max)
      }.toSeq.sortBy(_._1)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      // halo = 2 needs tile dims >= 2 (loudly required by the router)
      val tw = 2 + rng.nextInt(8); val th = 2 + rng.nextInt(8)
      def got(a: Int, b: Int) =
        RasterOps.binomialTiledOf(typed, w, h, a, b).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(got(tw, th) == want, s"blur trial $trial ${w}x$h tiles ${tw}x$th")
      assert(got(50, 50) == want, s"blur trial $trial ${w}x$h single tile")
    }
  }

  test("tophat on random dims and tilings == local two-stage morphology recompute") {
    import spark.implicits._
    val rng = new scala.util.Random(989898L)
    for (trial <- 0 until 10) {
      val w = 1 + rng.nextInt(24)
      val h = 1 + rng.nextInt(24)
      val g = randGrid(rng, w, h)
      def q(y: Int, x: Int) = math.floor(g(y * w + x) * Q).toLong
      // local reference is the staged composition (per-cell erode field,
      // then dilate of it) — the kernel computes the fused 5x5 directly,
      // so this pins the opening = dilate(erode) identity the oracle
      // also rests on
      def erode(y: Int, x: Int) =
        (for (dy <- -1 to 1; dx <- -1 to 1) yield q(y + dy, x + dx)).min
      val cells = (for (y <- 2 to h - 3; x <- 2 to w - 3) yield {
        val open = (for (dy <- -1 to 1; dx <- -1 to 1) yield erode(y + dy, x + dx)).max
        val th = q(y, x) - open
        (java.lang.Long.toBinaryString(th + 1L).length.toLong - 1L, th, y.toLong * w + x)
      })
      val want = cells.groupBy(_._1).map { case (b, cs) =>
        (b, cs.length.toLong, cs.map(_._2).sum, cs.map(_._3).sum)
      }.toSeq.sortBy(_._1)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      val tw = 2 + rng.nextInt(8); val th2 = 2 + rng.nextInt(8)
      def got(a: Int, b: Int) =
        RasterOps.tophatTiledOf(typed, w, h, a, b).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got(tw, th2) == want, s"tophat trial $trial ${w}x$h tiles ${tw}x$th2")
      assert(got(50, 50) == want, s"tophat trial $trial ${w}x$h single tile")
      if (cells.nonEmpty)
        assert(cells.forall(_._2 >= 0L), "anti-extensivity: th >= 0")
    }
  }

  test("glcmStats == fold of the glcm co-occurrence table") {
    import spark.implicits._
    val rng = new scala.util.Random(777333L)
    val w = 3 + rng.nextInt(10); val h = 3 + rng.nextInt(10)
    val g = randGrid(rng, w, h)
    val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
    val pairs = RasterOps.glcmOf(typed, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = (pairs.map(_._3).sum, pairs.size.toLong,
      pairs.map(p => p._3 * p._3).sum,
      pairs.map(p => p._3 * 1000L / (1L + p._2 - p._1)).sum,
      pairs.map(p => (p._2 - p._1) * (p._2 - p._1) * p._3).sum)
    val got = RasterOps.glcmStatsOf(typed, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).head
    assert(got == want)
    assert(want._1 > 0L)
  }

  test("rowPrefix scan on random dims and segment widths == local in-order recompute") {
    import spark.implicits._
    val rng = new scala.util.Random(909090L)
    for (trial <- 0 until 10) {
      val w = 1 + rng.nextInt(24)
      val h = 1 + rng.nextInt(10)
      val segW = 1 + rng.nextInt(9)
      val g = randGrid(rng, w, h)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      val want = (0 until h).map { y =>
        var run = 0L; var sp = 0L; var mp = Long.MinValue
        for (x <- 0 until w) {
          run += math.floor(g(y * w + x) * Q).toLong
          sp += run
          if (run > mp) mp = run
        }
        (y.toLong, w.toLong, sp, mp)
      }
      val got = RasterOps.rowPrefixOf(typed, w, h, segW).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == want, s"trial $trial: ${w}x$h seg $segW")
    }
  }

  test("integral image on random dims == local 2D prefix recompute") {
    import spark.implicits._
    val rng = new scala.util.Random(343434L)
    for (trial <- 0 until 8) {
      val w = 1 + rng.nextInt(16)
      val h = 1 + rng.nextInt(16)
      val g = randGrid(rng, w, h)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      val ii = Array.ofDim[Long](h, w)
      for (y <- 0 until h; x <- 0 until w) {
        val q = math.floor(g(y * w + x) * Q).toLong
        ii(y)(x) = q + (if (x > 0) ii(y)(x - 1) else 0L) +
          (if (y > 0) ii(y - 1)(x) else 0L) -
          (if (x > 0 && y > 0) ii(y - 1)(x - 1) else 0L)
      }
      val want = (0 until h).map(y =>
        (y.toLong, w.toLong, ii(y).sum, ii(y).max))
      val got = RasterOps.integralOf(typed, w, h).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == want, s"trial $trial: ${w}x$h")
    }
  }

  test("watershed basin labels on random grids and tilings == sequential pointer-following") {
    import spark.implicits._
    val rng = new scala.util.Random(121212L)
    for (trial <- 0 until 6) {
      val w = 3 + rng.nextInt(14)
      val h = 3 + rng.nextInt(14)
      val tw = 1 + rng.nextInt(9)
      val th = 1 + rng.nextInt(9)
      val g = randGrid(rng, w, h)
      def v(y: Int, x: Int) = g(y * w + x)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      val sqrt2 = math.sqrt(2.0)
      val succ = (for (y <- 1 to h - 2; x <- 1 to w - 2) yield {
        var pmax = Long.MinValue
        for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) {
          val dxo = o % 3 - 1; val dyo = o / 3 - 1
          val dist = if (dxo != 0 && dyo != 0) sqrt2 else 1.0
          val p = math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * Q).toLong * 16L + (8L - o)
          if (p > pmax) pmax = p
        }
        val id = y.toLong * w + x
        if (pmax >= 16L) {
          val dir = (8L - pmax % 16L).toInt
          id -> ((y - (dir / 3 - 1)).toLong * w + (x - (dir % 3 - 1)))
        } else id -> -1L
      }).toMap
      def sinkOf(c: Long): Long = {
        var cur = c
        while (succ.get(cur).exists(_ >= 0L)) cur = succ(cur)
        cur
      }
      val want = succ.keys.map(id => (id, sinkOf(id))).toSeq.sorted
      val got = HydroOps.basinLabels(
          RasterOps.d8SuccCellsTiledOf(typed, w, h, tw, th)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == want, s"trial $trial: ${w}x$h tiles ${tw}x$th")
    }
  }

  test("halo-tiled path shuffles a small fraction of the cell-level path's bytes") {
    import spark.implicits._
    import java.util.concurrent.atomic.AtomicLong
    val acc = new AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        acc.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val rng = new scala.util.Random(7L)
      val (w, h) = (100, 200)
      val g = randGrid(rng, w, h)
      val cells = cellsDf(g, w, h)
      val typed = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      // the listener bus drains asynchronously: poll until the counter is
      // stable for a full second (no fixed-sleep timing assumption — the
      // VM's noise phases can stall the bus well past any constant)
      def stabilized(): Long = {
        var prev = -1L
        var cur = acc.get()
        var stableMs = 0
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (stableMs < 1000 && System.nanoTime() < deadline) {
          Thread.sleep(100)
          prev = cur; cur = acc.get()
          if (cur == prev) stableMs += 100 else stableMs = 0
        }
        cur
      }
      def measure(f: => org.apache.spark.sql.DataFrame): Long = {
        stabilized(); acc.set(0L)
        f.collect()
        stabilized()
      }
      val cellBytes = measure(RasterOps.focalMeanOf(cells, w, h)) +
        measure(RasterOps.gridUpsampleOf(typed, w, h))
      val tiledBytes = measure(RasterOps.focalMeanTiledOf(typed, w, h)) +
        measure(RasterOps.gridUpsampleTiledOf(typed, w, h))
      info(s"shuffle write bytes: cell-level=$cellBytes tiled=$tiledBytes " +
        f"ratio=${tiledBytes.toDouble / cellBytes}%.3f")
      // cell-level ships every cell 9x (focal) / 16x (upsample); tiled ships
      // the raster ~1.08x in routing plus tiny per-row partials — require
      // at least a 3x margin so VM/listener noise can't flake the gate
      assert(tiledBytes * 3 < cellBytes,
        s"tiled=$tiledBytes not < cell/3 of $cellBytes")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("gridUpsample on random dims (incl. w or h = 1) == local clamp-gather recompute") {
    import spark.implicits._
    val rng = new scala.util.Random(424242L)
    for (_ <- 0 until 12) {
      val w = 1 + rng.nextInt(7)
      val h = 1 + rng.nextInt(7)
      val g = randGrid(rng, w, h)
      def v(y: Int, x: Int) = g(y * w + x)
      def clamp(c: Int, hi: Int) = math.max(0, math.min(c, hi))
      val want = (0 until 2 * h).map { oy =>
        val y0 = clamp(Math.floorDiv(oy - 1, 2), h - 1)
        val y1 = clamp(Math.floorDiv(oy + 1, 2), h - 1)
        val fy = if (oy % 2 == 0) 0.75 else 0.25
        val qs = (0 until 2 * w).map { ox =>
          val x0 = clamp(Math.floorDiv(ox - 1, 2), w - 1)
          val x1 = clamp(Math.floorDiv(ox + 1, 2), w - 1)
          val fx = if (ox % 2 == 0) 0.75 else 0.25
          val top = (v(y0, x0) * (1.0 - fx)) + (v(y0, x1) * fx)
          val bot = (v(y1, x0) * (1.0 - fx)) + (v(y1, x1) * fx)
          math.floor(((top * (1.0 - fy)) + (bot * fy)) * Q).toLong
        }
        (oy.toLong, qs.length.toLong, qs.sum, qs.min, qs.max)
      }
      val src = (0 until w * h).map(i => (i % w, i / w, g(i))).toDS()
      val got = RasterOps.gridUpsampleOf(src, w, h).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(got == want, s"upsample ${w}x$h")
    }
  }
}

package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** gridPyramid must reproduce, bit-for-bit, a single-threaded local
  * pooling of the same grid: fixed-order 2x2 means, ragged edges dropped,
  * floor(v * 2^20) per-cell quantization.
  */
class RasterOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("gridPyramid matches a local fixed-order pooling recompute") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    var w = 100
    var h = ev.length / w
    var grid = Array.tabulate(h, w)((y, x) => ev(y * w + x)._2)
    val expected = (0 to 3).map { level =>
      if (level > 0) {
        val (pw, ph) = (w / 2, h / 2)
        grid = Array.tabulate(ph, pw)((y, x) =>
          ((grid(2 * y)(2 * x) + grid(2 * y)(2 * x + 1))
            + (grid(2 * y + 1)(2 * x) + grid(2 * y + 1)(2 * x + 1))) / 4.0)
        w = pw; h = ph
      }
      val q = grid.flatten.map(v => math.floor(v * 1048576.0).toLong)
      (level.toLong, w.toLong, h.toLong, q.length.toLong, q.sum, q.min, q.max)
    }
    val got = RasterOps.gridPyramid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
  }

  test("focalMean matches a local fixed-order 3x3 recompute") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100
    val h = ev.length / w
    def v(y: Int, x: Int) = ev(y * w + x)._2
    // slot o holds the value at (tx - dx_o, ty - dy_o), dx = o%3-1,
    // dy = o/3-1; same fixed parenthesization as the engine
    val expected = (1 to h - 2).map { y =>
      val qs = (1 to w - 2).map { x =>
        def s(o: Int) = v(y - (o / 3 - 1), x - (o % 3 - 1))
        val mean = ((((s(0) + s(1)) + s(2)) + ((s(3) + s(4)) + s(5)))
          + ((s(6) + s(7)) + s(8))) / 9.0
        math.floor(mean * 1048576.0).toLong
      }
      (y.toLong, qs.length.toLong, qs.sum, qs.min, qs.max)
    }
    val got = RasterOps.focalMean(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty && expected.head._2 == w.toLong - 2)
  }

  test("hornSlope matches a local fixed-order recompute") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100
    val h = ev.length / w
    def v(y: Int, x: Int) = ev(y * w + x)._2
    val expected = (1 to h - 2).map { y =>
      val qs = (1 to w - 2).map { x =>
        def s(o: Int) = v(y - (o / 3 - 1), x - (o % 3 - 1))
        val gx = (((s(0) + s(3) * 2.0) + s(6)) - ((s(2) + s(5) * 2.0) + s(8))) / 8.0
        val gy = (((s(0) + s(1) * 2.0) + s(2)) - ((s(6) + s(7) * 2.0) + s(8))) / 8.0
        math.floor(math.sqrt(gx * gx + gy * gy) * 1048576.0).toLong
      }
      (y.toLong, qs.length.toLong, qs.sum, qs.min, qs.max)
    }
    val got = RasterOps.hornSlope(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.exists(_._5 > 0))
  }

  test("pyramidSlope == local pool-then-slope recompute on the level-1 grid") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val (w, h) = (100, ev.length / 100)
    val (pw, ph) = (w / 2, h / 2)
    val pooled = Array.tabulate(ph * pw) { i =>
      val (y, x) = (i / pw, i % pw)
      def v(yy: Int, xx: Int) = ev(yy * w + xx)._2
      ((v(2 * y, 2 * x) + v(2 * y, 2 * x + 1))
        + (v(2 * y + 1, 2 * x) + v(2 * y + 1, 2 * x + 1))) / 4.0
    }
    def pv(y: Int, x: Int) = pooled(y * pw + x)
    val expected = (1 to ph - 2).map { y =>
      val qs = (1 to pw - 2).map { x =>
        def s(o: Int) = pv(y - (o / 3 - 1), x - (o % 3 - 1))
        val gx = (((s(0) + s(3) * 2.0) + s(6)) - ((s(2) + s(5) * 2.0) + s(8))) / 8.0
        val gy = (((s(0) + s(1) * 2.0) + s(2)) - ((s(6) + s(7) * 2.0) + s(8))) / 8.0
        math.floor(math.sqrt(gx * gx + gy * gy) * 1048576.0).toLong
      }
      (y.toLong, qs.length.toLong, qs.sum, qs.min, qs.max)
    }
    val got = RasterOps.pyramidSlope(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty && expected.exists(_._5 > 0))
  }

  test("distributed pyramid level-1 contours equal single-process core on the pooled grid") {
    import spark.implicits._
    import graft.core.{ContourConfig, CoreContour}
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val (w, h) = (100, ev.length / 100)
    val (pw, ph) = (w / 2, h / 2)
    val pooled = Array.tabulate(ph * pw) { i =>
      val (y, x) = (i / pw, i % pw)
      def v(yy: Int, xx: Int) = ev(yy * w + xx)._2
      ((v(2 * y, 2 * x) + v(2 * y, 2 * x + 1))
        + (v(2 * y + 1, 2 * x) + v(2 * y + 1, 2 * x + 1))) / 4.0
    }
    val core = new CoreContour(ContourConfig(pw, ph, smooth = true))
      .contours(pooled, graft.queries.EventsGrid.Thresholds.toArray)
    def checksum(polys: Seq[graft.core.Poly]): (Long, Long, Long) = {
      var n = 0L; var qx = 0L; var qy = 0L
      polys.iterator.flatMap(p => Iterator.single(p.exterior) ++ p.holes.iterator)
        .foreach { ring =>
          var i = 0
          val m = ring.length - 2 // closing duplicate
          while (i < m) {
            qx += math.floor(ring(i) * 1048576.0).toLong
            qy += math.floor(ring(i + 1) * 1048576.0).toLong
            n += 1; i += 2
          }
        }
      (n, qx, qy)
    }
    val expected = core.map(c => { val (n, qx, qy) = checksum(c.polygons); (c.threshold, n, qx, qy) })
      .sortBy(_._1)
    val got = graft.SparkEntry.queries("q_pyramid_contours")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(expected.exists(_._2 > 0))
  }

  test("distributed pyramid level-1 isobands equal single-process core on the pooled grid") {
    import spark.implicits._
    import graft.core.{ContourConfig, CoreContour}
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val (w, h) = (100, ev.length / 100)
    val (pw, ph) = (w / 2, h / 2)
    val pooled = Array.tabulate(ph * pw) { i =>
      val (y, x) = (i / pw, i % pw)
      def v(yy: Int, xx: Int) = ev(yy * w + xx)._2
      ((v(2 * y, 2 * x) + v(2 * y, 2 * x + 1))
        + (v(2 * y + 1, 2 * x) + v(2 * y + 1, 2 * x + 1))) / 4.0
    }
    val core = new CoreContour(ContourConfig(pw, ph, smooth = true))
      .isobands(pooled, graft.queries.EventsGrid.Thresholds.toArray)
    def checksum(polys: Seq[graft.core.Poly]): (Long, Long, Long) = {
      var n = 0L; var qx = 0L; var qy = 0L
      polys.iterator.flatMap(p => Iterator.single(p.exterior) ++ p.holes.iterator)
        .foreach { ring =>
          val m0 = ring.length
          val m = if (m0 >= 4 && ring(0) == ring(m0 - 2) && ring(1) == ring(m0 - 1)) m0 - 2 else m0
          var i = 0
          while (i < m) {
            qx += math.floor(ring(i) * 1048576.0).toLong
            qy += math.floor(ring(i + 1) * 1048576.0).toLong
            n += 1; i += 2
          }
        }
      (n, qx, qy)
    }
    val expected = core.map(b => { val (n, qx, qy) = checksum(b.polygons); (b.minV, b.maxV, n, qx, qy) })
      .sortBy(_._1)
    val got = graft.SparkEntry.queries("q_pyramid_isobands")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.exists(_._3 > 0))
  }

  test("distributed focal-mean isobands equal single-process core on the filtered grid") {
    import spark.implicits._
    import graft.core.{ContourConfig, CoreContour}
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val (w, h) = (100, ev.length / 100)
    def v(y: Int, x: Int) = ev(y * w + x)._2
    val (fw, fh) = (w - 2, h - 2)
    val filtered = Array.tabulate(fh * fw) { i =>
      val (y, x) = (i / fw + 1, i % fw + 1)
      val (v0, v1, v2) = (v(y + 1, x + 1), v(y + 1, x), v(y + 1, x - 1))
      val (v3, v4, v5) = (v(y, x + 1), v(y, x), v(y, x - 1))
      val (v6, v7, v8) = (v(y - 1, x + 1), v(y - 1, x), v(y - 1, x - 1))
      ((((v0 + v1) + v2) + ((v3 + v4) + v5)) + ((v6 + v7) + v8)) / 9.0
    }
    val core = new CoreContour(ContourConfig(fw, fh, smooth = true))
      .isobands(filtered, graft.queries.EventsGrid.Thresholds.toArray)
    def checksum(polys: Seq[graft.core.Poly]): (Long, Long, Long) = {
      var n = 0L; var qx = 0L; var qy = 0L
      polys.iterator.flatMap(p => Iterator.single(p.exterior) ++ p.holes.iterator)
        .foreach { ring =>
          val m0 = ring.length
          val m = if (m0 >= 4 && ring(0) == ring(m0 - 2) && ring(1) == ring(m0 - 1)) m0 - 2 else m0
          var i = 0
          while (i < m) {
            qx += math.floor(ring(i) * 1048576.0).toLong
            qy += math.floor(ring(i + 1) * 1048576.0).toLong
            n += 1; i += 2
          }
        }
      (n, qx, qy)
    }
    val expected = core.map(b => { val (n, qx, qy) = checksum(b.polygons); (b.minV, b.maxV, n, qx, qy) })
      .sortBy(_._1)
    val got = graft.SparkEntry.queries("q_fm_isobands")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.exists(_._3 > 0))
  }

  test("distributed median-filtered isolines equal single-process core on the filtered grid") {
    import spark.implicits._
    import graft.core.{ContourConfig, CoreContour}
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val (w, h) = (100, ev.length / 100)
    def v(y: Int, x: Int) = ev(y * w + x)._2
    val (fw, fh) = (w - 2, h - 2)
    val filtered = Array.tabulate(fh * fw) { i =>
      val (y, x) = (i / fw + 1, i % fw + 1)
      val win = for (dy <- -1 to 1; dx <- -1 to 1) yield v(y + dy, x + dx)
      win.sorted.apply(4)
    }
    val core = new CoreContour(ContourConfig(fw, fh, smooth = true))
      .lines(filtered, graft.queries.EventsGrid.Thresholds.toArray)
    // the engine-side ringChecksum convention: drop the closing duplicate
    // when present (conditionally — plateau collapse can remove it)
    def checksum(rings: Seq[Array[Double]]): (Long, Long, Long) = {
      var n = 0L; var qx = 0L; var qy = 0L
      rings.foreach { ring =>
        val m0 = ring.length
        val m = if (m0 >= 4 && ring(0) == ring(m0 - 2) && ring(1) == ring(m0 - 1)) m0 - 2 else m0
        var i = 0
        while (i < m) {
          qx += math.floor(ring(i) * 1048576.0).toLong
          qy += math.floor(ring(i + 1) * 1048576.0).toLong
          n += 1; i += 2
        }
      }
      (n, qx, qy)
    }
    val expected = core.map(c => { val (n, qx, qy) = checksum(c.lines.map(_.toArray)); (c.threshold, n, qx, qy) })
      .sortBy(_._1)
    val got = graft.SparkEntry.queries("q_med_contours")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(expected.exists(_._2 > 0))
  }

  test("distributed focal-mean contours equal single-process core on the filtered grid") {
    import spark.implicits._
    import graft.core.{ContourConfig, CoreContour}
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val (w, h) = (100, ev.length / 100)
    def v(y: Int, x: Int) = ev(y * w + x)._2
    val (fw, fh) = (w - 2, h - 2)
    val filtered = Array.tabulate(fh * fw) { i =>
      val (y, x) = (i / fw + 1, i % fw + 1)
      val (v0, v1, v2) = (v(y + 1, x + 1), v(y + 1, x), v(y + 1, x - 1))
      val (v3, v4, v5) = (v(y, x + 1), v(y, x), v(y, x - 1))
      val (v6, v7, v8) = (v(y - 1, x + 1), v(y - 1, x), v(y - 1, x - 1))
      ((((v0 + v1) + v2) + ((v3 + v4) + v5)) + ((v6 + v7) + v8)) / 9.0
    }
    val core = new CoreContour(ContourConfig(fw, fh, smooth = true))
      .contours(filtered, graft.queries.EventsGrid.Thresholds.toArray)
    def checksum(polys: Seq[graft.core.Poly]): (Long, Long, Long) = {
      var n = 0L; var qx = 0L; var qy = 0L
      polys.iterator.flatMap(p => Iterator.single(p.exterior) ++ p.holes.iterator)
        .foreach { ring =>
          var i = 0
          val m = ring.length - 2
          while (i < m) {
            qx += math.floor(ring(i) * 1048576.0).toLong
            qy += math.floor(ring(i + 1) * 1048576.0).toLong
            n += 1; i += 2
          }
        }
      (n, qx, qy)
    }
    val expected = core.map(c => { val (n, qx, qy) = checksum(c.polygons); (c.threshold, n, qx, qy) })
      .sortBy(_._1)
    val got = graft.SparkEntry.queries("q_fm_contours")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    assert(expected.exists(_._2 > 0))
  }

  test("d8FlowDir matches a local packed-argmax recompute; pits reported as -1") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100
    val h = ev.length / w
    def v(y: Int, x: Int) = ev(y * w + x)._2
    val sqrt2 = math.sqrt(2.0)
    val hist = scala.collection.mutable.Map[Long, (Long, Long)]()
    for (y <- 1 to h - 2; x <- 1 to w - 2) {
      var pmax = Long.MinValue
      for (o <- Seq(0, 1, 2, 3, 5, 6, 7, 8)) {
        val dxo = o % 3 - 1; val dyo = o / 3 - 1
        val dist = if (dxo != 0 && dyo != 0) sqrt2 else 1.0
        val p = math.floor((v(y, x) - v(y - dyo, x - dxo)) / dist * 1048576.0).toLong * 16L + (8L - o)
        if (p > pmax) pmax = p
      }
      val dir = if (pmax >= 16L) 8L - pmax % 16L else -1L
      val (n, m) = hist.getOrElse(dir, (0L, Long.MinValue))
      hist(dir) = (n + 1, math.max(m, pmax))
    }
    val expected = hist.toSeq.map { case (d, (n, m)) => (d, n, m) }.sortBy(_._1)
    val got = RasterOps.d8FlowDir(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(expected.map(_._2).sum == (w - 2).toLong * (h - 2)) // every interior cell classified
  }

  test("gridUpsample matches a local fixed-order bilinear recompute") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100
    val h = ev.length / w
    def v(y: Int, x: Int) = ev(y * w + x)._2
    def clamp(c: Int, hi: Int) = math.max(0, math.min(c, hi))
    val expected = (0 until 2 * h).map { oy =>
      val y0 = clamp(Math.floorDiv(oy - 1, 2), h - 1)
      val y1 = clamp(Math.floorDiv(oy + 1, 2), h - 1)
      val fy = if (oy % 2 == 0) 0.75 else 0.25
      val qs = (0 until 2 * w).map { ox =>
        val x0 = clamp(Math.floorDiv(ox - 1, 2), w - 1)
        val x1 = clamp(Math.floorDiv(ox + 1, 2), w - 1)
        val fx = if (ox % 2 == 0) 0.75 else 0.25
        val top = (v(y0, x0) * (1.0 - fx)) + (v(y0, x1) * fx)
        val bot = (v(y1, x0) * (1.0 - fx)) + (v(y1, x1) * fx)
        math.floor(((top * (1.0 - fy)) + (bot * fy)) * 1048576.0).toLong
      }
      (oy.toLong, qs.length.toLong, qs.sum, qs.min, qs.max)
    }
    val got = RasterOps.gridUpsample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.length == 2 * h && got.head._2 == 2L * w)
  }

  test("gridCc == local BFS labeling of the level-2 mask (tile sizes 3 and 16)") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    var w = 100
    var h = ev.length / w
    var grid = Array.tabulate(h, w)((y, x) => ev(y * w + x)._2)
    for (_ <- 1 to 2) {
      val (pw, ph) = (w / 2, h / 2)
      grid = Array.tabulate(ph, pw)((y, x) =>
        ((grid(2 * y)(2 * x) + grid(2 * y)(2 * x + 1))
          + (grid(2 * y + 1)(2 * x) + grid(2 * y + 1)(2 * x + 1))) / 4.0)
      w = pw; h = ph
    }
    val expected = Seq(25.0, 50.0, 75.0, 100.0).flatMap { th =>
      val mask = Array.tabulate(h, w)((y, x) => grid(y)(x) >= th)
      val lbl = Array.fill(h, w)(-1L)
      var comps = List.empty[(Long, Long)] // (minId, size)
      for (y <- 0 until h; x <- 0 until w if mask(y)(x) && lbl(y)(x) < 0) {
        var stack = List((x, y))
        var size = 0L
        var minId = Long.MaxValue
        lbl(y)(x) = 0
        while (stack.nonEmpty) {
          val (cx, cy) = stack.head; stack = stack.tail
          size += 1; minId = math.min(minId, cy.toLong * w + cx)
          for ((nx, ny) <- Seq((cx + 1, cy), (cx - 1, cy), (cx, cy + 1), (cx, cy - 1))
               if nx >= 0 && nx < w && ny >= 0 && ny < h && mask(ny)(nx) && lbl(ny)(nx) < 0) {
            lbl(ny)(nx) = 0; stack ::= ((nx, ny))
          }
        }
        comps ::= ((minId, size))
      }
      if (comps.isEmpty) None
      else Some((th, comps.map(_._2).sum, comps.size.toLong,
        comps.map(_._2).max, comps.map(_._1).sum))
    }
    val cells = spark.createDataset(
      for (y <- 0 until h; x <- 0 until w) yield (x, y, grid(y)(x)))
    for (tile <- Seq(3, 16)) {
      val got = RasterOps.gridCcOf(cells, w, h, tile, Seq(25.0, 50.0, 75.0, 100.0))
        .collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
      assert(got == expected, s"tile=$tile")
    }
    assert(expected.exists(_._3 > 1L), "multi-component thresholds must exist")
  }

  test("distTransform == brute-force L1 min over mask cells (random grid + level-2 path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val w = 17
    val h = 9
    val vals = Array.fill(h * w)(rnd.nextDouble() * 120.0)
    val ths = Seq(30.0, 60.0, 90.0, 119.5)
    def brute(grid: Array[Double], gw: Int, gh: Int): Seq[(Double, Long, Long, Long, Long)] =
      ths.flatMap { th =>
        val mask = for (y <- 0 until gh; x <- 0 until gw if grid(y * gw + x) >= th) yield (x, y)
        if (mask.isEmpty) None
        else Some {
          val ds = for (y <- 0 until gh; x <- 0 until gw)
            yield (y, mask.map(m => math.abs(x - m._1) + math.abs(y - m._2)).min.toLong)
          (th, ds)
        }
      }.flatMap { case (th, ds) =>
        ds.groupBy(_._1).toSeq.map { case (y, rows) =>
          (th, y.toLong, rows.size.toLong, rows.map(_._2).sum, rows.map(_._2).max)
        }
      }.sortBy(r => (r._1, r._2))
    val cells = spark.createDataset(
      for (y <- 0 until h; x <- 0 until w) yield (x, y, vals(y * w + x)))
      .toDF("x", "y", "v")
    val got = RasterOps.distTransformOf(cells, ths).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == brute(vals, w, h))
    assert(got.exists(_._5 > 1L), "distances beyond the immediate neighborhood must occur")
    // sparse high threshold exercises rows with empty masks (INF carry)
    assert(ths.exists(th => vals.count(_ >= th) < h), "a threshold must leave empty rows")
  }

  test("gridPole == brute argmax of L1-to-complement; interior disk is all-mask") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val w = 17
    val h = 9
    val vals = Array.fill(h * w)(rnd.nextDouble() * 120.0)
    // 0.0 makes an all-mask threshold (empty complement -> drops);
    // 150 an all-complement one (empty mask -> drops)
    val ths = Seq(0.0, 30.0, 60.0, 90.0, 150.0)
    val brute = ths.flatMap { th =>
      val mask = for (y <- 0 until h; x <- 0 until w if vals(y * w + x) >= th) yield (x, y)
      val comp = for (y <- 0 until h; x <- 0 until w if vals(y * w + x) < th) yield (x, y)
      if (mask.isEmpty || comp.isEmpty) None
      else {
        val ds = mask.map { case (x, y) =>
          (comp.map(c => math.abs(x - c._1) + math.abs(y - c._2)).min.toLong, y.toLong, x.toLong)
        }
        val best = ds.minBy(d => (-d._1, d._2, d._3))
        Some((th, mask.size.toLong, best._1, best._2, best._3))
      }
    }.sortBy(_._1)
    val cells = spark.createDataset(
      for (y <- 0 until h; x <- 0 until w) yield (x, y, vals(y * w + x)))
      .toDF("x", "y", "v")
    val got = RasterOps.poleOf(cells, ths).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == brute)
    assert(got.size == 3, "the all-mask and all-complement thresholds must drop")
    assert(got.exists(_._3 > 1L), "a pole strictly interior must occur")
    // interior-disk invariant: every in-grid cell with L1 < pole_d of the
    // pole is a mask cell (the definition of inaccessibility depth)
    for ((th, _, d, py, px) <- got; y <- 0 until h; x <- 0 until w
         if math.abs(x - px) + math.abs(y - py) < d)
      assert(vals(y * w + x) >= th, s"disk cell ($x, $y) below threshold $th")
  }

  test("gridTopology: bit-quad Euler == BFS components minus holes; perimeter == exposed edges") {
    import spark.implicits._
    def comps(cells: Set[(Int, Int)], dirs: Seq[(Int, Int)]): Seq[Set[(Int, Int)]] = {
      val seen = scala.collection.mutable.Set.empty[(Int, Int)]
      cells.toSeq.sorted.flatMap { start =>
        if (seen(start)) None
        else {
          val comp = scala.collection.mutable.Set(start)
          val queue = scala.collection.mutable.Queue(start)
          while (queue.nonEmpty) {
            val (x, y) = queue.dequeue()
            for ((dx, dy) <- dirs; nb = (x + dx, y + dy)
                 if cells(nb) && !comp(nb)) { comp += nb; queue += nb }
          }
          seen ++= comp
          Some(comp.toSet)
        }
      }
    }
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 3) {
      val w = 7 + rnd.nextInt(12)
      val h = 5 + rnd.nextInt(8)
      val vals = Array.fill(h * w)(rnd.nextDouble() * 100.0)
      val ths = Seq(20.0, 50.0, 80.0)
      val cells = spark.createDataset(
        for (y <- 0 until h; x <- 0 until w) yield (x, y, vals(y * w + x)))
      val got = RasterOps.topoTiledOf(cells, w, h, ths, 5, 4).collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got.map(_._1) == ths, s"trial $trial: all thresholds must emit")
      for ((th, n, perim, e4, e8) <- got) {
        def m(x: Int, y: Int) = x >= 0 && x < w && y >= 0 && y < h && vals(y * w + x) >= th
        val maskSet = (for (y <- 0 until h; x <- 0 until w if m(x, y)) yield (x, y)).toSet
        assert(n == maskSet.size)
        val pe = maskSet.toSeq.map { case (x, y) =>
          Seq((x - 1, y), (x + 1, y), (x, y - 1), (x, y + 1))
            .count { case (xx, yy) => !m(xx, yy) }.toLong
        }.sum
        assert(perim == pe, s"trial $trial th $th: perimeter")
        // Euler via the INDEPENDENT formulation: BFS component and hole
        // counts (complement padded by one background ring; a complement
        // component not reaching the ring is a hole)
        val compSet = (for (y <- -1 to h; x <- -1 to w if !m(x, y)) yield (x, y)).toSet
        val d4 = Seq((1, 0), (-1, 0), (0, 1), (0, -1))
        val d8 = d4 ++ Seq((1, 1), (1, -1), (-1, 1), (-1, -1))
        val c4 = comps(maskSet, d4).size.toLong
        val c8 = comps(maskSet, d8).size.toLong
        val holes8 = comps(compSet, d8).count(c => !c.contains((-1, -1))).toLong
        val holes4 = comps(compSet, d4).count(c => !c.contains((-1, -1))).toLong
        assert(e4 == c4 - holes8, s"trial $trial th $th: chi4 $e4 != $c4 - $holes8")
        assert(e8 == c8 - holes4, s"trial $trial th $th: chi8 $e8 != $c8 - $holes4")
      }
    }
  }

  /** Local 4-connected min-cell-id labeling of the v >= th mask — the
    * independent BFS formulation behind the nesting cross-check.
    */
  private def bfsLabels(vals: Array[Double], w: Int, h: Int, th: Double): Map[(Int, Int), Long] = {
    def m(x: Int, y: Int) = x >= 0 && x < w && y >= 0 && y < h && vals(y * w + x) >= th
    val seen = scala.collection.mutable.Set.empty[(Int, Int)]
    val out = scala.collection.mutable.Map.empty[(Int, Int), Long]
    for (y <- 0 until h; x <- 0 until w if m(x, y) && !seen((x, y))) {
      val comp = scala.collection.mutable.Set((x, y))
      val queue = scala.collection.mutable.Queue((x, y))
      while (queue.nonEmpty) {
        val (cx, cy) = queue.dequeue()
        for ((dx, dy) <- Seq((1, 0), (-1, 0), (0, 1), (0, -1));
             nb = (cx + dx, cy + dy)
             if m(nb._1, nb._2) && !comp(nb)) { comp += nb; queue += nb }
      }
      val lbl = comp.map { case (px, py) => py.toLong * w + px }.min
      comp.foreach(c => out(c) = lbl)
      seen ++= comp
    }
    out.toMap
  }

  private def nestingBrute(vals: Array[Double], w: Int, h: Int,
                           ths: Seq[Double]): Seq[(Double, Double, Long, Long, Long, Long, Long, Long, Long)] = {
    val labels = ths.map(th => bfsLabels(vals, w, h, th))
    (0 until ths.size - 1).flatMap { ti =>
      val lo = labels(ti); val hi = labels(ti + 1)
      val nLo = lo.values.toSet.size.toLong
      if (nLo == 0L) None
      else {
        val links = hi.keys.map(c => (lo(c), hi(c))).toSet // child cell is in BOTH masks
        val perParent = links.groupBy(_._1).view.mapValues(_.size.toLong)
        Some((ths(ti), ths(ti + 1), nLo, hi.values.toSet.size.toLong,
          perParent.size.toLong, links.size.toLong,
          if (perParent.isEmpty) 0L else perParent.values.max,
          links.toSeq.map(_._1).sum, links.toSeq.map(_._2).sum))
      }
    }
  }

  test("percolationOf == BFS spanning census on crafted strips + random grids") {
    import spark.implicits._
    def brute(vals: Array[Double], w: Int, h: Int, ths: Seq[Double]) =
      ths.flatMap { th =>
        val labels = bfsLabels(vals, w, h, th)
        if (labels.isEmpty) None
        else {
          val per = labels.toSeq.groupBy(_._2).toSeq.map { case (lbl, cs) =>
            val xs = cs.map(_._1._1); val ys = cs.map(_._1._2)
            (lbl, cs.size.toLong, xs.min == 0 && xs.max == w - 1,
              ys.min == 0 && ys.max == h - 1)
          }
          val sp = per.filter(p => p._3 || p._4)
          Some((th, per.size.toLong, per.count(_._3).toLong,
            per.count(_._4).toLong,
            if (sp.isEmpty) 0L else sp.map(_._2).max, sp.map(_._1).sum))
        }
      }
    def run(vals: Array[Double], w: Int, h: Int, ths: Seq[Double], tile: Int) = {
      val cells = spark.createDataset(
        for (y <- 0 until h; x <- 0 until w) yield (x, y, vals(y * w + x)))
      RasterOps.percolationOf(cells, w, h, tile, ths).collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
    }
    // crafted: a horizontal strip spans h-wise only at the low threshold;
    // nothing spans at the high one
    val w0 = 9; val h0 = 5
    val strip = Array.fill(h0 * w0)(5.0)
    for (x <- 0 until w0) strip(2 * w0 + x) = 50.0
    strip(2 * w0 + 4) = 90.0
    val gotS = run(strip, w0, h0, Seq(20.0, 60.0), 3)
    assert(gotS == brute(strip, w0, h0, Seq(20.0, 60.0)))
    assert(gotS.head._3 == 1L && gotS.head._4 == 0L && gotS.head._5 == w0.toLong,
      s"strip must span horizontally only: $gotS")
    assert(gotS(1)._3 == 0L && gotS(1)._4 == 0L && gotS(1)._5 == 0L,
      s"nothing spans at 60: $gotS")
    val rnd = new scala.util.Random(77)
    for (trial <- 0 until 2) {
      val w = 8 + rnd.nextInt(9)
      val h = 6 + rnd.nextInt(6)
      // dense-ish so spanning actually occurs sometimes
      val vals = Array.fill(h * w)(rnd.nextDouble() * 100.0)
      val ths = Seq(20.0, 55.0, 85.0)
      assert(run(vals, w, h, ths, 4) == brute(vals, w, h, ths), s"trial $trial")
    }
  }

  test("ccNesting == BFS containment census on random + crafted grids; one-parent theorem") {
    import spark.implicits._
    def run(vals: Array[Double], w: Int, h: Int, ths: Seq[Double], tile: Int) = {
      val cells = spark.createDataset(
        for (y <- 0 until h; x <- 0 until w) yield (x, y, vals(y * w + x)))
      RasterOps.ccNestingOf(cells, w, h, tile, ths).collect()
        .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSeq
    }
    // crafted two-peak ridge: one component at 20 splits into two at 60
    val w0 = 7; val h0 = 3
    val crafted = Array.fill(h0 * w0)(10.0)
    for (x <- 1 to 5) crafted(1 * w0 + x) = 50.0
    crafted(1 * w0 + 1) = 90.0; crafted(1 * w0 + 5) = 90.0
    val gotC = run(crafted, w0, h0, Seq(20.0, 60.0), 3)
    assert(gotC == nestingBrute(crafted, w0, h0, Seq(20.0, 60.0)))
    assert(gotC.head._3 == 1L && gotC.head._4 == 2L && gotC.head._7 == 2L,
      s"crafted split not observed: $gotC")
    // random grids, multi-threshold ladder, awkward tiling
    val rnd = new scala.util.Random(37)
    for (trial <- 0 until 2) {
      val w = 9 + rnd.nextInt(10)
      val h = 6 + rnd.nextInt(7)
      val vals = Array.fill(h * w)(rnd.nextDouble() * 100.0)
      val ths = Seq(30.0, 60.0, 90.0)
      val got = run(vals, w, h, ths, 4)
      assert(got == nestingBrute(vals, w, h, ths), s"trial $trial")
      // each higher component nests in exactly one lower: links == n_hi
      got.foreach(r => assert(r._6 == r._4, s"one-parent theorem broken: $r"))
    }
  }

  test("bandAdjacencyOf == brute-force rook census; cliffs and row ends pinned") {
    import spark.implicits._
    def brute(vals: Array[Double], w: Int, h: Int, ths: Seq[Double]) = {
      def bd(x: Int, y: Int) = ths.count(vals(y * w + x) >= _).toLong
      (for (y <- 0 until h; x <- 0 until w;
            (nx, ny) <- Seq((x + 1, y), (x, y + 1)) if nx < w && ny < h) yield {
        val (a, b) = (bd(x, y), bd(nx, ny))
        ((math.min(a, b), math.max(a, b)), y.toLong * w + x)
      }).groupBy(_._1).toSeq.map { case ((lo, hi), rs) =>
        (lo, hi, rs.size.toLong, rs.map(_._2).sum)
      }.sorted
    }
    def run(vals: Array[Double], w: Int, h: Int, ths: Seq[Double]) = {
      val cells = spark.createDataset(
        for (y <- 0 until h; x <- 0 until w) yield (x, y, vals(y * w + x)))
      RasterOps.bandAdjacencyOf(cells, w, ths).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    // crafted cliff at a row END: band 0 at x = w-1 next to band 2 row
    // start below — the id+1 wrap would fabricate a (0,2) horizontal pair
    val w0 = 4; val h0 = 2
    val cliff = Array(5.0, 5.0, 5.0, 5.0, 80.0, 80.0, 80.0, 80.0)
    val gotC = run(cliff, w0, h0, Seq(20.0, 60.0))
    assert(gotC == brute(cliff, w0, h0, Seq(20.0, 60.0)))
    assert(gotC == Seq((0L, 0L, 3L, 0L + 1L + 2L), (0L, 2L, 4L, 0L + 1L + 2L + 3L),
      (2L, 2L, 3L, 4L + 5L + 6L)), s"cliff census wrong: $gotC")
    val rnd = new scala.util.Random(74)
    for (trial <- 0 until 3) {
      val w = 5 + rnd.nextInt(10); val h = 4 + rnd.nextInt(8)
      val vals = Array.fill(h * w)(rnd.nextDouble() * 120.0)
      val ths = Seq(30.0, 60.0, 90.0)
      assert(run(vals, w, h, ths) == brute(vals, w, h, ths), s"trial $trial")
    }
  }

  /** Brute-force local viewshed of one row of quantized elevations:
    * visible x's (x = 0 always; x >= 1 iff its angle strictly beats every
    * predecessor's by integer cross-product).
    */
  private def viewshedRow(qs: Array[Long]): Seq[Int] =
    0 +: (1 until qs.length).filter { x =>
      (1 until x).forall { p =>
        (qs(x) - qs(0)) * p.toLong > (qs(p) - qs(0)) * x.toLong
      }
    }

  test("viewshed matches a local brute-force recompute") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100
    val h = ev.length / w
    val expected = (0 until h).map { y =>
      val qs = Array.tabulate(w)(x => math.floor(ev(y * w + x)._2 * 1048576.0).toLong)
      val vis = viewshedRow(qs)
      (y.toLong, w.toLong, vis.length.toLong, vis.map(_.toLong).sum, vis.last.toLong)
    }
    val got = RasterOps.viewshed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.exists(_._3 > 2L), "rows with several visible cells must exist")
    assert(expected.forall(_._3 < w.toLong), "occlusion must actually happen")
  }

  test("viewshedOf segment carry: tiny segW over a random grid == brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val w = 23
    val h = 5
    val vals = Array.fill(h * w)(rnd.nextDouble() * 200.0 - 50.0)
    val cells = spark.createDataset(
      for (y <- 0 until h; x <- 0 until w) yield (x, y, vals(y * w + x)))
    val expected = (0 until h).map { y =>
      val qs = Array.tabulate(w)(x => math.floor(vals(y * w + x) * 1048576.0).toLong)
      val vis = viewshedRow(qs)
      (y.toLong, w.toLong, vis.length.toLong, vis.map(_.toLong).sum, vis.last.toLong)
    }
    for (segW <- Seq(1, 3, 7, 23, 50)) {
      val got = RasterOps.viewshedOf(cells, w, h, segW).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(got == expected, s"segW=$segW")
    }
  }

  test("histEqualize == local integer CDF remap (16 levels)") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect()
    val n = ev.length.toLong
    val cells = ev.map { case (id, v) =>
      ((id % 100).toInt, (id / 100).toInt, math.floor(v).toLong)
    }
    val hist = cells.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val bins = hist.keys.toSeq.sorted
    val cumBelow = bins.zip(bins.scanLeft(0L)((acc, b) => acc + hist(b))).toMap
    val level = bins.map(b => b -> cumBelow(b) * 16L / n).toMap
    val expected = cells.groupBy(_._2).map { case (y, cs) =>
      val ls = cs.map(c => level(c._3))
      (y.toLong, cs.length.toLong, ls.sum, ls.min, ls.max)
    }.toSeq.sortBy(_._1)
    val got = RasterOps.histEqualize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // the remap uses the full level range (0 and 15 both present)
    assert(expected.map(_._4).min == 0L && expected.map(_._5).max == 15L)
  }

  private def moranBrute(vals: Array[Double], w: Int, h: Int)
      : (Long, Long, Long, Long, Long, Long) = {
    val q = vals.map(v => math.floor(v * 1048576.0).toLong)
    val n = q.length.toLong
    val s = q.map(BigInt(_)).sum
    val qbar = (s / n).toLong // BigInt / truncates toward zero, like div
    val dev = q.map(x => BigInt(x - qbar))
    var css = BigInt(0); var dss = BigInt(0); var wsum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val d = dev(y * w + x)
      dss += d * d
      if (x + 1 < w) { css += d * dev(y * w + x + 1); wsum += 1 }
      if (y + 1 < h) { css += d * dev((y + 1) * w + x); wsum += 1 }
    }
    (n, wsum, qbar, (dss / 1048576).toLong, (css / 1048576).toLong,
      ((BigInt(n) * css * 1000000) / (BigInt(wsum) * dss)).toLong)
  }

  private def majorityBrute(vals: Array[Double], w: Int, h: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    def bin(x: Int, y: Int) = math.floor(vals(y * w + x)).toLong
    (1 until h - 1).flatMap { y =>
      val modes = (1 until w - 1).map { x =>
        val bs = for (dy <- -1 to 1; dx <- -1 to 1) yield bin(x + dx, y + dy)
        // mode, smallest-bin tie-break
        bs.groupBy(identity).toSeq.map { case (b, xs) => (-xs.length, b) }.min._2
      }
      if (modes.nonEmpty)
        Some((y.toLong, modes.length.toLong, modes.sum, modes.min, modes.max))
      else None
    }
  }

  test("focalMajority == brute mode recompute on the events grid and random dims/tilings") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100; val h = ev.length / w
    val expected = majorityBrute(ev.map(_._2), w, h)
    val got = RasterOps.focalMajority(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)

    // random SMALL-RANGE grids force heavy bin ties — the tie-break path
    val rng = new scala.util.Random(424242L)
    for (trial <- 0 until 8) {
      val rw = 2 + rng.nextInt(10); val rh = 2 + rng.nextInt(10)
      val vals = Array.fill(rw * rh)(rng.nextInt(4).toDouble + rng.nextDouble() * 0.9)
      val cells = spark.createDataset(
        for (y <- 0 until rh; x <- 0 until rw) yield (x, y, vals(y * rw + x)))
      val tw = 1 + rng.nextInt(4); val th = 1 + rng.nextInt(4)
      val gotR = RasterOps.focalMajorityTiledOf(cells, rw, rh, tw, th).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(gotR.toSeq == majorityBrute(vals, rw, rh),
        s"trial $trial ${rw}x$rh tile ${tw}x$th")
    }
  }

  private def localMoranBrute(vals: Array[Double], w: Int, h: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val q = vals.map(v => math.floor(v * 1048576.0).toLong)
    val qbar = (q.map(BigInt(_)).sum / q.length).toLong
    def dev(x: Int, y: Int) = BigInt(q(y * w + x) - qbar)
    (1 until h - 1).flatMap { y =>
      val liqs = (1 until w - 1).map { x =>
        val nb = dev(x, y - 1) + dev(x, y + 1) + dev(x + 1, y) + dev(x - 1, y)
        // BigInt / truncates toward zero, like the kernel's Long /
        ((dev(x, y) * nb) / 1048576).toLong
      }
      if (liqs.nonEmpty)
        Some((y.toLong, liqs.length.toLong, liqs.sum, liqs.min, liqs.max))
      else None
    }
  }

  test("localMoran == brute force on the events grid and on random dims/tilings") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100; val h = ev.length / w
    val expected = localMoranBrute(ev.map(_._2), w, h)
    val got = RasterOps.localMoran(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
    assert(expected.exists(_._4 < 0L), "anticorrelated cells should exist")

    // random dims x tilings; w or h of 2 makes the interior EMPTY in that
    // direction (zero output rows) — the rim contract's edge case
    val rng = new scala.util.Random(20260818L)
    for (trial <- 0 until 8) {
      val rw = 2 + rng.nextInt(8); val rh = 2 + rng.nextInt(8)
      val vals = Array.fill(rw * rh)(
        math.floor((rng.nextDouble() * 512.0 - 256.0) * 64.0) / 64.0)
      val cells = spark.createDataset(
        for (y <- 0 until rh; x <- 0 until rw) yield (x, y, vals(y * rw + x)))
      val tw = 1 + rng.nextInt(4); val th = 1 + rng.nextInt(4)
      val gotR = RasterOps.localMoranOf(cells, rw, rh, tw, th).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(gotR.toSeq == localMoranBrute(vals, rw, rh),
        s"trial $trial ${rw}x$rh tile ${tw}x$th")
    }
  }

  private def laplacianBrute(vals: Array[Double], w: Int, h: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val q = vals.map(v => math.floor(v * 1048576.0).toLong)
    (1 until h - 1).flatMap { y =>
      val laps = (1 until w - 1).map { x =>
        q((y - 1) * w + x) + q((y + 1) * w + x) +
          q(y * w + x + 1) + q(y * w + x - 1) - 4 * q(y * w + x)
      }
      if (laps.nonEmpty)
        Some((y.toLong, laps.length.toLong, laps.sum, laps.min, laps.max))
      else None
    }
  }

  test("laplacian == brute force on the events grid and random dims/tilings; zero on a ramp") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100; val h = ev.length / w
    val got = RasterOps.laplacian(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == laplacianBrute(ev.map(_._2), w, h))

    val rng = new scala.util.Random(111111L)
    for (trial <- 0 until 8) {
      val rw = 2 + rng.nextInt(8); val rh = 2 + rng.nextInt(8)
      val vals = Array.fill(rw * rh)(
        math.floor((rng.nextDouble() * 512.0 - 256.0) * 64.0) / 64.0)
      val cells = spark.createDataset(
        for (y <- 0 until rh; x <- 0 until rw) yield (x, y, vals(y * rw + x)))
      val tw = 1 + rng.nextInt(4); val th = 1 + rng.nextInt(4)
      val gotR = RasterOps.laplacianTiledOf(cells, rw, rh, tw, th).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(gotR.toSeq == laplacianBrute(vals, rw, rh),
        s"trial $trial ${rw}x$rh tile ${tw}x$th")
    }

    // a linear ramp has zero Laplacian everywhere — the second-derivative
    // identity that distinguishes this kernel from the focal family
    val ramp = spark.createDataset(
      for (y <- 0 until 6; x <- 0 until 6) yield (x, y, (3 * x + 2 * y).toDouble))
    val gotRamp = RasterOps.laplacianTiledOf(ramp, 6, 6, 4, 4).collect()
    assert(gotRamp.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L))
  }

  private def sobelBrute(vals: Array[Double], w: Int, h: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val q = vals.map(v => math.floor(v * 1048576.0).toLong)
    def g(x: Int, y: Int) = q(y * w + x)
    (1 until h - 1).flatMap { y =>
      val gs = (1 until w - 1).map { x =>
        val gx = (g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1)) -
          (g(x - 1, y - 1) + 2 * g(x - 1, y) + g(x - 1, y + 1))
        val gy = (g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1)) -
          (g(x - 1, y - 1) + 2 * g(x, y - 1) + g(x + 1, y - 1))
        math.abs(gx) + math.abs(gy)
      }
      if (gs.nonEmpty) Some((y.toLong, gs.length.toLong, gs.sum, gs.min, gs.max))
      else None
    }
  }

  test("sobel == brute force on the events grid and random dims/tilings; zero on a constant") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100; val h = ev.length / w
    val got = RasterOps.sobel(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == sobelBrute(ev.map(_._2), w, h))

    val rng = new scala.util.Random(121212L)
    for (trial <- 0 until 8) {
      val rw = 2 + rng.nextInt(8); val rh = 2 + rng.nextInt(8)
      val vals = Array.fill(rw * rh)(
        math.floor((rng.nextDouble() * 512.0 - 256.0) * 64.0) / 64.0)
      val cells = spark.createDataset(
        for (y <- 0 until rh; x <- 0 until rw) yield (x, y, vals(y * rw + x)))
      val tw = 1 + rng.nextInt(4); val th = 1 + rng.nextInt(4)
      val gotR = RasterOps.sobelTiledOf(cells, rw, rh, tw, th).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(gotR.toSeq == sobelBrute(vals, rw, rh),
        s"trial $trial ${rw}x$rh tile ${tw}x$th")
    }

    // a constant raster has zero gradient everywhere
    val const = spark.createDataset(
      for (y <- 0 until 5; x <- 0 until 5) yield (x, y, 7.25))
    assert(RasterOps.sobelTiledOf(const, 5, 5, 3, 3).collect()
      .forall(r => r.getLong(2) == 0L && r.getLong(4) == 0L))
  }

  private def gearyBrute(vals: Array[Double], w: Int, h: Int)
      : (Long, Long, Long, Long, Long, Long) = {
    val q = vals.map(v => math.floor(v * 1048576.0).toLong)
    val n = q.length.toLong
    val qbar = (q.map(BigInt(_)).sum / n).toLong
    var ess = BigInt(0); var dss = BigInt(0); var ne = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val d = BigInt(q(y * w + x) - qbar)
      dss += d * d
      if (x + 1 < w) { val dd = BigInt(q(y * w + x) - q(y * w + x + 1)); ess += dd * dd; ne += 1 }
      if (y + 1 < h) { val dd = BigInt(q(y * w + x) - q((y + 1) * w + x)); ess += dd * dd; ne += 1 }
    }
    (n, ne, qbar, (dss / 1048576).toLong, (ess / 1048576).toLong,
      ((BigInt(n - 1) * ess * 1000000) / (BigInt(2 * ne) * dss)).toLong)
  }

  test("geary == brute force on the events grid and on random dims/tilings") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100; val h = ev.length / w
    val got = RasterOps.geary(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(gearyBrute(ev.map(_._2), w, h)))

    val rng = new scala.util.Random(101010L)
    for (trial <- 0 until 8) {
      val rw = 2 + rng.nextInt(8); val rh = 2 + rng.nextInt(8)
      val vals = Array.fill(rw * rh)(
        math.floor((rng.nextDouble() * 512.0 - 256.0) * 64.0) / 64.0)
      val cells = spark.createDataset(
        for (y <- 0 until rh; x <- 0 until rw) yield (x, y, vals(y * rw + x)))
      val tw = 1 + rng.nextInt(4); val th = 1 + rng.nextInt(4)
      val gotR = RasterOps.gearyOf(cells, rw, rh, tw, th).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(gotR.toSeq == Seq(gearyBrute(vals, rw, rh)),
        s"trial $trial ${rw}x$rh tile ${tw}x$th")
    }
  }

  test("morton == local bit-interleave recompute; blocks are 16x16 and code-contiguous") {
    import spark.implicits._
    // independent local formulation: per-bit gather, like the oracle
    def code(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect()
    val expected = ev.map { case (id, v) =>
      (code(id % 100, id / 100), math.floor(v * 1048576.0).toLong)
    }.groupBy(_._1 / 256).toSeq.map { case (blk, cs) =>
      (blk, cs.length.toLong, cs.map(_._2).sum, cs.map(_._1).min, cs.map(_._1).max)
    }.sortBy(_._1)
    val got = RasterOps.morton(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
    // every block's codes decode to one 16x16 spatial block (the locality
    // contract a Z-ordered layout is bucketed by)
    for ((blk, _, _, mMin, mMax) <- got) {
      assert(mMin >= blk * 256 && mMax < (blk + 1) * 256)
    }
  }

  test("moran == brute force on the events grid and on random dims/tilings") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100; val h = ev.length / w
    val expected = moranBrute(ev.map(_._2), w, h)
    val got = RasterOps.moran(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(expected))

    // random dims x tilings, incl. tiles smaller than the halo and
    // single-row/column grids (edges in one direction only); negative
    // values exercise the signed truncating divisions
    val rng = new scala.util.Random(20260818L)
    for (trial <- 0 until 8) {
      val rw = 2 + rng.nextInt(8); val rh = 2 + rng.nextInt(8)
      val vals = Array.fill(rw * rh)(
        math.floor((rng.nextDouble() * 512.0 - 256.0) * 64.0) / 64.0)
      val cells = spark.createDataset(
        for (y <- 0 until rh; x <- 0 until rw) yield (x, y, vals(y * rw + x)))
      val tw = 1 + rng.nextInt(4); val th = 1 + rng.nextInt(4)
      val gotR = RasterOps.moranOf(cells, rw, rh, tw, th).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(gotR.toSeq == Seq(moranBrute(vals, rw, rh)),
        s"trial $trial ${rw}x$rh tile ${tw}x$th")
    }
  }

  private def getisBrute(vals: Array[Double], w: Int, h: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val q = vals.map(v => math.floor(v * 1048576.0).toLong)
    val qtot = q.map(BigInt(_)).sum
    def qq(x: Int, y: Int) = BigInt(q(y * w + x))
    (1 until h - 1).flatMap { y =>
      val gs = (1 until w - 1).map { x =>
        val win = qq(x, y) + (qq(x, y - 1) + qq(x, y + 1)) + (qq(x + 1, y) + qq(x - 1, y))
        // BigInt / truncates toward zero, like the kernel's Long /
        ((win * 100000000) / qtot).toLong
      }
      if (gs.nonEmpty) Some((y.toLong, gs.length.toLong, gs.sum, gs.min, gs.max))
      else None
    }
  }

  test("getis == brute force on the events grid and on random dims/tilings") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100; val h = ev.length / w
    val expected = getisBrute(ev.map(_._2), w, h)
    val got = RasterOps.getis(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)

    // positive random grids (the share statistic's domain: qtot != 0)
    val rng = new scala.util.Random(20260818L)
    for (trial <- 0 until 8) {
      val rw = 2 + rng.nextInt(8); val rh = 2 + rng.nextInt(8)
      val vals = Array.fill(rw * rh)(
        math.floor((rng.nextDouble() * 512.0 + 1.0) * 64.0) / 64.0)
      val cells = spark.createDataset(
        for (y <- 0 until rh; x <- 0 until rw) yield (x, y, vals(y * rw + x)))
      val tw = 1 + rng.nextInt(4); val th = 1 + rng.nextInt(4)
      val gotR = RasterOps.getisOf(cells, rw, rh, tw, th).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(gotR.toSeq == getisBrute(vals, rw, rh),
        s"trial $trial ${rw}x$rh tile ${tw}x$th")
    }
  }

  test("hilbert: base case, 32x32 bijection with unit steps, blocks == local recompute") {
    import spark.implicits._
    import graft.core.RasterKernel.hilbertIndex
    // first-order curve: the U through (0,0) -> (0,1) -> (1,1) -> (1,0)
    assert(Seq((0, 0), (0, 1), (1, 1), (1, 0)).map { case (x, y) =>
      hilbertIndex(1, x, y) } == Seq(0L, 1L, 2L, 3L))
    // bits = 5: a full 32x32 grid is a bijection onto [0, 1024) and every
    // consecutive code pair is rook-adjacent — the property that defines
    // the curve (and that Z-order fails)
    val m = for (y <- 0 until 32; x <- 0 until 32)
      yield ((x, y), hilbertIndex(5, x, y))
    assert(m.map(_._2).sorted == (0L until 1024L))
    val byCode = m.map(_.swap).toMap
    (0L until 1023L).foreach { d =>
      val (x1, y1) = byCode(d); val (x2, y2) = byCode(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at code $d")
    }
    // contract query == local recompute of the block census
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100
    val rows = ev.map { case (id, v) =>
      val x = (id % w).toInt; val y = (id / w).toInt
      (hilbertIndex(16, x, y), math.floor(v * 1048576.0).toLong, x.toLong, y.toLong)
    }
    val expected = rows.groupBy(_._1 / 256).toSeq.map { case (b, rs) =>
      (b, rs.length.toLong, rs.map(_._2).sum, rs.map(_._1).min, rs.map(_._1).max,
        (rs.map(_._3).max - rs.map(_._3).min + 1) * (rs.map(_._4).max - rs.map(_._4).min + 1))
    }.sortBy(_._1)
    val got = RasterOps.hilbert(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(got == expected)
    // locality evidence: every block's bbox stays compact (vs the 100-wide
    // row-major stripes a linear id would give)
    assert(got.forall(_._6 <= 512L), "a block bbox blew past the locality bound")
  }

  private def costBrute(vals: Array[Double], w: Int, h: Int,
                        rounds: Int, thr: Double): Seq[(Long, Long, Long, Long, Long)] = {
    val Inf = Long.MaxValue / 4
    val qc = vals.map(v => math.floor(v * 1024.0).toLong + 1024L)
    var cost = vals.map(v => if (v >= thr) 0L else Inf)
    for (_ <- 0 until rounds) {
      val next = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        var nb = Inf
        if (x > 0) nb = math.min(nb, cost(i - 1))
        if (x + 1 < w) nb = math.min(nb, cost(i + 1))
        if (y > 0) nb = math.min(nb, cost(i - w))
        if (y + 1 < h) nb = math.min(nb, cost(i + w))
        if (nb < Inf) math.min(cost(i), nb + qc(i)) else cost(i)
      }
      cost = next
    }
    (0 until h).flatMap { y =>
      val cs = (0 until w).flatMap(x =>
        if (cost(y * w + x) < Inf) Some(cost(y * w + x)) else None)
      if (cs.nonEmpty) Some((y.toLong, cs.size.toLong, cs.sum, cs.min, cs.max))
      else None
    }
  }

  test("costHorizon == brute synchronous K-round relaxation; sourceless grids are empty") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100; val h = ev.length / w
    val expected = costBrute(ev.map(_._2), w, h, 8, 100.0)
    val got = RasterOps.costHorizon(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
    // non-source cells accumulate positive path costs (sf0.001's dense
    // sources reach everything within 8 hops; the random trials below
    // exercise the partial-reach horizon)
    assert(expected.exists(_._5 > 0L), "no positive-cost cell - sources everywhere?")

    // random dims x tilings x horizons (rounds <= min tile dim, the halo
    // contract); value range makes sources sparse-but-present usually
    val rng = new scala.util.Random(20260818L)
    for (trial <- 0 until 8) {
      val rw = 2 + rng.nextInt(8); val rh = 2 + rng.nextInt(8)
      val vals = Array.fill(rw * rh)(
        math.floor(rng.nextDouble() * 150.0 * 64.0) / 64.0)
      val cells = spark.createDataset(
        for (y <- 0 until rh; x <- 0 until rw) yield (x, y, vals(y * rw + x)))
      val tw = 1 + rng.nextInt(4); val th = 1 + rng.nextInt(4)
      val rounds = 1 + rng.nextInt(math.min(tw, th))
      val gotR = RasterOps.costHorizonOf(cells, rw, rh, tw, th, rounds)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(gotR.toSeq == costBrute(vals, rw, rh, rounds, 100.0),
        s"trial $trial ${rw}x$rh tile ${tw}x$th rounds $rounds")
    }

    // no sources at all -> empty frame, not a zero row
    val dead = spark.createDataset(
      for (y <- 0 until 4; x <- 0 until 4) yield (x, y, 1.5))
    assert(RasterOps.costHorizonOf(dead, 4, 4, 2, 2, 2).count() == 0L)
  }

  private def bruteCostField(vals: Array[Double], w: Int, h: Int, rounds: Int): Array[Long] = {
    val Inf = graft.core.RasterKernel.CostInf
    val qc = vals.map(v => math.floor(v * 1024.0).toLong + 1024L)
    var cost = vals.map(v => if (v >= 100.0) 0L else Inf)
    for (_ <- 0 until rounds) {
      val prev = cost
      cost = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        var nb = Inf
        if (x > 0) nb = math.min(nb, prev(i - 1))
        if (x + 1 < w) nb = math.min(nb, prev(i + 1))
        if (y > 0) nb = math.min(nb, prev(i - w))
        if (y + 1 < h) nb = math.min(nb, prev(i + w))
        if (nb < Inf) math.min(prev(i), nb + qc(i)) else prev(i)
      }
    }
    cost
  }

  test("costCellsOf == brute field incl. sentinel; isochrone == single-node reference") {
    import spark.implicits._
    val Inf = graft.core.RasterKernel.CostInf
    // a single corner source at 1 round leaves far cells on the sentinel
    val craft = Array.tabulate(16)(i => if (i == 0) 120.0 else 1.0)
    val craftCells = spark.createDataset(
      for (y <- 0 until 4; x <- 0 until 4) yield (x, y, craft(y * 4 + x)))
    val gotCraft = RasterOps.costCellsOf(craftCells, 4, 4, 2, 2, 1)
      .collect().toSeq.sorted
    val wantCraft = (for (y <- 0 until 4; x <- 0 until 4)
      yield (x, y, bruteCostField(craft, 4, 4, 1)(y * 4 + x).toDouble)).sorted
    assert(gotCraft == wantCraft)
    assert(wantCraft.count(_._3 == Inf.toDouble) == 13, "far cells must stay on the sentinel")

    val rng = new scala.util.Random(151515L)
    for (trial <- 0 until 8) {
      val rw = 2 + rng.nextInt(8); val rh = 2 + rng.nextInt(8)
      val vals = Array.fill(rw * rh)(
        math.floor(rng.nextDouble() * 150.0 * 64.0) / 64.0)
      val cells = spark.createDataset(
        for (y <- 0 until rh; x <- 0 until rw) yield (x, y, vals(y * rw + x)))
      val tw = 1 + rng.nextInt(4); val th = 1 + rng.nextInt(4)
      val rounds = 1 + rng.nextInt(math.min(tw, th))
      val field = bruteCostField(vals, rw, rh, rounds)
      val want = (for (y <- 0 until rh; x <- 0 until rw)
        yield (x, y, field(y * rw + x).toDouble)).sorted
      val got = RasterOps.costCellsOf(cells, rw, rh, tw, th, rounds).collect().toSeq.sorted
      assert(got == want, s"trial $trial ${rw}x$rh tile ${tw}x$th rounds $rounds")
    }

    // the isochrone COMPOSITION must equal the single-node CoreContour
    // reference run over the locally relaxed cost field — end-to-end
    // (distributed relaxation -> tiling -> stitch -> smoothing) vs the
    // bit-exact in-memory path
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100; val h = ev.length / w
    val costD = bruteCostField(ev.map(_._2), w, h, 8).map(_.toDouble)
    val core = new graft.core.CoreContour(graft.core.ContourConfig(w, h, smooth = true))
    val want2 = core.contours(costD, Array(20000.0, 50000.0, 100000.0)).map { cr =>
      val vs = cr.polygons.iterator
        .flatMap(p => (p.exterior +: p.holes).iterator).flatMap { ring =>
          val n = ring.length / 2 - 1
          (0 until n).iterator.map(i => (ring(2 * i), ring(2 * i + 1)))
        }.toSeq
      (cr.threshold, vs.size.toLong,
        vs.map(v => math.floor(v._1 * 1048576.0).toLong).sum,
        vs.map(v => math.floor(v._2 * 1048576.0).toLong).sum)
    }
    val got2 = graft.SparkEntry.queries("q_isochrone")(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got2 == want2)
    assert(got2.exists(_._2 > 0L), "the cost field must produce rings")
  }

  private def variogramBrute(vals: Array[Double], w: Int, h: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val q = vals.map(v => math.floor(v * 1048576.0).toLong)
    (for (dir <- 0 to 1; li <- 0 to 3) yield {
      val lag = 1 << li
      val ds = (for (y <- 0 until h; x <- 0 until w) yield {
        if (dir == 0 && x + lag < w) Some(BigInt(q(y * w + x) - q(y * w + x + lag)))
        else if (dir == 1 && y + lag < h) Some(BigInt(q(y * w + x) - q((y + lag) * w + x)))
        else None
      }).flatten
      val ss = ds.map(d => d * d).sum
      val n = ds.size.toLong
      (dir.toLong, lag.toLong, n, (ss / 1048576).toLong,
        if (n > 0) (ss / (2 * n)).toLong else 0L)
    }).filter(_._3 > 0)
  }

  test("variogram == brute pair recompute on the events grid and on random dims/tilings") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100; val h = ev.length / w
    val expected = variogramBrute(ev.map(_._2), w, h)
    val got = RasterOps.variogram(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected)
    // structural: longer lags have strictly fewer pairs per direction
    val east = expected.filter(_._1 == 0L).map(_._3)
    assert(east == east.sorted.reverse && east.distinct == east,
      "n_pairs must strictly shrink with lag")

    // random dims x tilings (tiles >= the max lag, the halo contract);
    // tiny grids drop whole (dir, lag) rows — the empty-pair edge
    val rng = new scala.util.Random(161616L)
    for (trial <- 0 until 8) {
      val rw = 2 + rng.nextInt(14); val rh = 2 + rng.nextInt(14)
      val vals = Array.fill(rw * rh)(
        math.floor((rng.nextDouble() * 512.0 - 256.0) * 64.0) / 64.0)
      val cells = spark.createDataset(
        for (y <- 0 until rh; x <- 0 until rw) yield (x, y, vals(y * rw + x)))
      val tw = 8 + rng.nextInt(5); val th = 8 + rng.nextInt(5)
      val gotR = RasterOps.variogramOf(cells, rw, rh, tw, th).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(gotR.toSeq == variogramBrute(vals, rw, rh),
        s"trial $trial ${rw}x$rh tile ${tw}x$th")
    }
  }

  test("tileSkew == textbook rank-sum Gini over local per-tile masses") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val masses = ev.map { case (id, v) =>
      val x = (id % 100).toInt; val y = (id / 100).toInt
      ((x / 50, y / 50), math.floor(v * 1048576.0).toLong)
    }.groupBy(_._1).map { case (_, xs) => xs.map(_._2).sum }.toSeq.sorted
    val nt = masses.size.toLong
    val tot = masses.sum
    val mq = masses.max
    val gnum = masses.zipWithIndex.map { case (q, i0) =>
      BigInt(2L * (i0 + 1) - nt - 1) * q
    }.sum
    val want = (nt, tot, mq, mq * nt * 1000L / tot,
      (gnum * 1000000 / (BigInt(nt) * tot)).toLong)
    val got = RasterOps.tileSkew(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(want))
    assert(want._4 >= 1000L, "the max tile is at least the mean by definition")
    assert(want._5 >= 0L && want._5 < 1000000L)
  }

  private def tpiBrute(vals: Array[Double], w: Int, h: Int)
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    val q = vals.map(v => math.floor(v * 1048576.0).toLong)
    (for (r <- Seq(1, 2); y <- r until h - r) yield {
      val k = (2L * r + 1L) * (2L * r + 1L)
      val thr = k * 1048576L
      val tpis = for (x <- r until w - r) yield {
        val s = (for (dy <- -r to r; dx <- -r to r) yield q((y + dy) * w + (x + dx))).sum
        q(y * w + x) * k - s
      }
      (r.toLong, y.toLong, tpis.size.toLong,
        tpis.count(_ > thr).toLong, tpis.count(_ < -thr).toLong, tpis.sum)
    }).filter(_._3 > 0)
  }

  test("tpi == brute multi-scale window recompute on the events grid and random dims/tilings") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    val w = 100; val h = ev.length / w
    val expected = tpiBrute(ev.map(_._2), w, h)
    val got = RasterOps.tpi(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expected)
    assert(expected.exists(e => e._4 > 0 || e._5 > 0),
      "the events grid must classify some ridge/valley cells or the thresholds are vacuous")

    // random dims x tilings (tile >= the r = 2 halo); grids narrower than
    // 2*r+1 drop that scale's rows entirely — the empty-interior edge
    val rng = new scala.util.Random(171717L)
    for (trial <- 0 until 8) {
      val rw = 3 + rng.nextInt(13); val rh = 3 + rng.nextInt(13)
      val vals = Array.fill(rw * rh)(
        math.floor((rng.nextDouble() * 512.0 - 256.0) * 64.0) / 64.0)
      val cells = spark.createDataset(
        for (y <- 0 until rh; x <- 0 until rw) yield (x, y, vals(y * rw + x)))
      val tw = 2 + rng.nextInt(9); val th = 2 + rng.nextInt(9)
      val gotR = RasterOps.tpiOf(cells, rw, rh, tw, th).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(gotR.toSeq == tpiBrute(vals, rw, rh),
        s"trial $trial ${rw}x$rh tile ${tw}x$th")
    }
  }
}

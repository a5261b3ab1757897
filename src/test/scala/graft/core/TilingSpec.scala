package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Tiling invariance: the per-tile kernel + hierarchical fragment merge must
  * reproduce the full-grid sweep byte-for-byte (same rings, same rotation,
  * same order) for any tiling — the core guarantee that makes the
  * distributed pipeline's output identical to the reference's.
  */
class TilingSpec extends AnyFunSuite {
  import Goldens._

  private def fullRings(values: Array[Double], dx: Int, dy: Int,
                        t: Double, smooth: Boolean): Seq[Array[Double]] = {
    val rings = MarchingSquares.sweepFullGrid(values, dx, dy, t)
    rings.foreach { r =>
      if (smooth) Smoother.smoothInPlace(r.pts, values, dx, 0, 0, dx, dy, t)
    }
    rings.map(_.pts).toSeq
  }

  private def assertSame(got: Seq[Array[Double]], want: Seq[Array[Double]], hint: String): Unit = {
    assert(got.length == want.length, s"$hint ring count ${got.length} != ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g.toSeq == w.toSeq, s"$hint ring $i differs")
    }
  }

  private val goldenGrids: Seq[(String, Array[Double], Int, Int, Array[Double])] = Seq(
    ("zeros", zeros10x10, 10, 10, Array(0.5)),
    ("simple", simpleGrid, 10, 10, Array(0.5)),
    ("hole", holeGrid, 10, 10, Array(0.5)),
    ("multi", multiGrid, 10, 10, Array(0.5)),
    ("multiHole", multiHoleGrid, 10, 10, Array(0.5)),
    ("noSmooth", noSmoothGrid, 10, 10, Array(0.5)),
    ("multiThresh", multiThreshGrid, 10, 10, Array(0.5, 1.5))
  )

  test("tiled == full grid on golden grids (2x2, 3x3, 4x4, 1x10, 7x3 tilings)") {
    for ((name, g, dx, dy, ts) <- goldenGrids;
         (tw, th) <- Seq((5, 5), (4, 4), (3, 3), (10, 1), (7, 3), (1, 1));
         smooth <- Seq(true, false);
         t <- ts) {
      val want = fullRings(g.clone(), dx, dy, t, smooth)
      val got = Tiling.tiledRings(g.clone(), dx, dy, tw, th, t, smooth)
      assertSame(got, want, s"$name tiles=${tw}x$th smooth=$smooth t=$t:")
    }
  }

  test("tiled == full grid on fixtures") {
    for ((res, ts) <- Seq(
        ("/fixtures/issue18.json", Seq(10.0)),
        ("/fixtures/volcano.json", Seq(100.0, 140.0, 170.0)),
        ("/fixtures/pot_pop_fr.json", Seq(1.0, 500000.0, 5000000.0)));
         (tw, th) <- Seq((16, 16), (37, 23));
         t <- ts) {
      val (data, w, h) = loadFixture(res)
      val want = fullRings(data.clone(), w, h, t, smooth = true)
      val got = Tiling.tiledRings(data.clone(), w, h, tw, th, t, smooth = true)
      assertSame(got, want, s"$res tiles=${tw}x$th t=$t:")
    }
  }

  test("property: tiling invariance on random grids (seeded)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 120) {
      val dx = 1 + rnd.nextInt(24)
      val dy = 1 + rnd.nextInt(24)
      val vals = Array.fill(dx * dy) {
        if (rnd.nextBoolean()) rnd.nextDouble() * 3.0
        else rnd.nextInt(3).toDouble // plateaus hit values exactly at threshold
      }
      val tw = 1 + rnd.nextInt(dx)
      val th = 1 + rnd.nextInt(dy)
      val t = Seq(0.5, 1.0, 1.5)(rnd.nextInt(3))
      val smooth = rnd.nextBoolean()
      val want = fullRings(vals.clone(), dx, dy, t, smooth)
      val got = Tiling.tiledRings(vals.clone(), dx, dy, tw, th, t, smooth)
      assertSame(got, want, s"trial=$trial dx=$dx dy=$dy tiles=${tw}x$th t=$t smooth=$smooth:")
    }
  }

  test("sweepMulti == per-threshold sweep (fixtures + random + NaN)") {
    val rnd = new scala.util.Random(13)
    val cases = Seq(
      { val (d, w, h) = loadFixture("/fixtures/volcano.json"); (d, w, h, (90 to 200 by 5).map(_.toDouble).toArray) },
      { val (d, w, h) = loadFixture("/fixtures/issue18.json"); (d, w, h, Array(9.0, 10.0, 10.3)) }
    ) ++ (0 until 25).map { _ =>
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(20)
      val d = Array.fill(w * h)(if (rnd.nextInt(10) == 0) Double.NaN else rnd.nextDouble() * 3)
      (d, w, h, Array(0.5, 1.5, 2.5, -1.0, 99.0))
    }
    for ((d, w, h, ts) <- cases) {
      val multi = MarchingSquares.sweepMulti(d, w, h, 0, 0, w, h, -1, w - 1, -1, h - 1, ts)
      ts.zipWithIndex.foreach { case (t, ti) =>
        val single = MarchingSquares.sweep(d, w, h, 0, 0, w, h, -1, w - 1, -1, h - 1, t)
        assert(multi(ti).rings.length == single.rings.length, s"t=$t rings")
        multi(ti).rings.zip(single.rings).foreach { case (a, b) =>
          assert(a.maxKey == b.maxKey && a.pts.toSeq == b.pts.toSeq, s"t=$t")
        }
        assert(multi(ti).frags.length == single.frags.length, s"t=$t frags")
        multi(ti).frags.zip(single.frags).foreach { case (a, b) =>
          assert(a == b.copy(pts = a.pts) && a.pts.toSeq == b.pts.toSeq, s"t=$t frag")
        }
      }
    }
  }

  test("threshold boundary: values exactly at threshold are inside") {
    val g = Array.fill(9)(0.5)
    val rings = MarchingSquares.sweepFullGrid(g, 3, 3, 0.5)
    assert(rings.nonEmpty) // 0.5 >= 0.5
    val none = MarchingSquares.sweepFullGrid(g, 3, 3, 0.5000001)
    assert(none.isEmpty)
  }
}

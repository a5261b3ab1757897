package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** RingIndex must be bit-identical to Geom.ringContains / Geom.contains on
  * every input — including points exactly on vertices, edges, and the
  * degenerate closing segment.
  */
class RingIndexSpec extends AnyFunSuite {

  test("exact equivalence with Geom.ringContains on random rings/points") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 300) {
      // random marching-squares-like ring: short segments, half-integer verts
      val n = 4 + rnd.nextInt(60)
      val pts = new Array[Double](2 * (n + 1))
      var x = rnd.nextInt(20) * 0.5
      var y = rnd.nextInt(20) * 0.5
      for (i <- 0 until n) {
        pts(2 * i) = x
        pts(2 * i + 1) = y
        x += (rnd.nextInt(3) - 1) * 0.5
        y += (rnd.nextInt(3) - 1) * 0.5
      }
      pts(2 * n) = pts(0)
      pts(2 * n + 1) = pts(1)
      val idx = new RingIndex(pts)
      for (_ <- 0 until 60) {
        val qx = rnd.nextInt(24) * 0.25 - 0.5
        val qy = rnd.nextInt(24) * 0.25 - 0.5
        assert(idx.contains(qx, qy) == Geom.ringContains(pts, qx, qy),
          s"trial=$trial q=($qx,$qy) ring=${pts.mkString(",")}")
      }
      // vertices themselves must return 0
      for (i <- 0 until n) {
        val (vx, vy) = (pts(2 * i), pts(2 * i + 1))
        assert(idx.contains(vx, vy) == Geom.ringContains(pts, vx, vy))
      }
    }
  }

  test("exact equivalence on smoothed volcano rings") {
    val (data, w, h) = Goldens.loadFixture("/fixtures/volcano.json")
    val core = new CoreContour(ContourConfig(w, h, smooth = true))
    val rings = core.contourRings(data, 150.0) ++ core.contourRings(data, 120.0)
    val smoothRings = rings.map { r =>
      Smoother.smoothInPlace(r, data, w, 0, 0, w, h, 150.0); r
    }
    val rnd = new scala.util.Random(11)
    for (a <- smoothRings; b <- smoothRings) {
      val idx = new RingIndex(a)
      assert(idx.containsRing(b) == Geom.contains(a, b))
      for (_ <- 0 until 40) {
        val qx = rnd.nextDouble() * (w + 2) - 1
        val qy = rnd.nextDouble() * (h + 2) - 1
        assert(idx.contains(qx, qy) == Geom.ringContains(a, qx, qy))
      }
    }
  }
}

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

  test("outside-bbox margins: sub-epsilon-off-line claims still match the walk") {
    // near-vertical segment (|dx| < EPSILON, tall): a point 1 ulp OUTSIDE
    // the ring's x-bbox on that segment's line is still claimed by
    // segment_contains — the exact per-ring xMargin must route it to the
    // bucket walk, not the -1 short circuit
    val e = 1e-16 // < Geom.Epsilon
    val ring = Array(
      0.5, 0.0, 0.5 + e, 1.0, 2.0, 1.0, 2.0, 0.0, 0.5, 0.0)
    val idx = new RingIndex(ring)
    val probes = Seq(
      (0.5 - 1e-16, 0.5), // 1 ulp outside bminX, collinear within budget
      (0.5 - 1e-15, 0.5), // further out: beyond the claim budget
      (0.5 + 1e-16, 0.5), // inside
      (2.0 + 1e-16, 0.5), // 1 ulp right of bmaxX
      (1.0, -1e-16), (1.0, 1.0 + 1e-16)) // 1 ulp below/above in y
    probes.foreach { case (qx, qy) =>
      assert(idx.contains(qx, qy) == Geom.ringContains(ring, qx, qy),
        s"q=($qx,$qy)")
    }
    // x-dominant near-flat segment: y-claims up to EPSILON/|dx| below the
    // span must survive the y short circuit
    val flat = Array(0.0, 0.0, 2.0, 1e-16, 2.0, 1.0, 0.0, 1.0, 0.0, 0.0)
    val fidx = new RingIndex(flat)
    Seq((1.0, -1e-17), (1.0, 5e-17), (1.0, -1e-15), (0.5, 0.0)).foreach { case (qx, qy) =>
      assert(fidx.contains(qx, qy) == Geom.ringContains(flat, qx, qy), s"q=($qx,$qy)")
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

package graft.core

/** Linear-interpolation smoothing of ring/fragment vertices, mirroring the
  * reference's `smoooth_linear` (/root/reference/src/contourbuilder.rs:77-103)
  * with the same formula and f64 association order, generalized to read
  * samples from a (halo'd) tile sub-array of the global grid.
  *
  * A vertex exactly on an integer x (vertical-edge midpoint) with
  * 0 < x < gdx shifts to x + (value - v0)/(v1 - v0) - 0.5 where
  * v1 = sample(xt, yt), v0 = sample(xt-1, yt); symmetric in y with
  * v0 = sample(xt, yt-1). Operates in grid coordinates, before the affine
  * transform. The reference's `ix < len` guard is vacuous whenever the branch
  * conditions hold (proved by the vertex coordinate ranges of the case
  * table), so it is not replicated.
  *
  * All sample reads stay within the tile plus a 1-sample bottom halo row:
  * x-branch reads columns [sx0, sx0+tw-1] of rows the tile owns; y-branch
  * reads rows [sy0, sy0+th] (one row below the tile).
  */
object Smoother {
  private final val Eps = Geom.Epsilon

  /** Smooth `pts` in place. `values` covers global samples
    * [vx0, vx0+vw) x [vy0, vy0+vh).
    */
  def smoothInPlace(pts: Array[Double],
                    values: Array[Double], vw: Int, vx0: Int, vy0: Int,
                    gdx: Int, gdy: Int, threshold: Double): Unit = {
    var i = 0
    while (i < pts.length) {
      val x = pts(i)
      val y = pts(i + 1)
      val xt = x.toInt // trunc; coords are >= 0 here
      val yt = y.toInt
      if (x > 0.0 && x < gdx.toDouble && math.abs(xt.toDouble - x) < Eps) {
        val v1 = values((yt - vy0) * vw + (xt - vx0))
        val v0 = values((yt - vy0) * vw + (xt - 1 - vx0))
        pts(i) = x + (threshold - v0) / (v1 - v0) - 0.5
      }
      if (y > 0.0 && y < gdy.toDouble && math.abs(yt.toDouble - y) < Eps) {
        val v1 = values((yt - vy0) * vw + (xt - vx0))
        val v0 = values((yt - 1 - vy0) * vw + (xt - vx0))
        pts(i + 1) = y + (threshold - v0) / (v1 - v0) - 0.5
      }
      i += 2
    }
  }
}

package graft.core

/** Marching-squares sweep over a rectangular range of cells of a (possibly
  * tiled) global grid, with rolling 2x2 corner bits (O(1) state per cell).
  *
  * Semantics: the reference's 3-phase row-major sweep with a virtual border of
  * below-threshold samples (/root/reference/src/isoringbuilder.rs:95-164),
  * generalized so a tile can sweep just the cell range it owns: cells
  * (x, y) with x in [cx0, cx1], y in [cy0, cy1] (inclusive, global coords,
  * where the full-grid domain is [-1, dx-1] x [-1, dy-1]). Restricting the
  * global row-major order to a rectangular sub-range preserves relative
  * order, so per-tile sweep keys compose into the exact global order.
  *
  * `values` covers global samples [vx0, vx0+vw) x [vy0, vy0+vh) row-major;
  * samples outside [0,gdx) x [0,gdy) are treated as below threshold
  * (NaN >= t is false, matching the reference).
  */
object MarchingSquares {

  /** Global row-major sweep key of segment `segIdx` of cell (x, y).
    * Strictly increasing in (y, x, segIdx) over the whole grid.
    */
  @inline def sweepKey(x: Int, y: Int, gdx: Int, segIdx: Int): Long =
    ((y + 1).toLong * (gdx.toLong + 1L) + (x + 1).toLong) * 2L + segIdx

  def sweep(values: Array[Double], vw: Int, vh: Int, vx0: Int, vy0: Int,
            gdx: Int, gdy: Int,
            cx0: Int, cx1: Int, cy0: Int, cy1: Int,
            threshold: Double): KernelOut = {
    val st = new Stitcher(gdx)
    val cases = Cases.table
    val casesX2 = Cases.tableX2

    @inline def bit(sx: Int, sy: Int): Int = {
      if (sx < 0 || sy < 0 || sx >= gdx || sy >= gdy) 0
      else if (values((sy - vy0) * vw + (sx - vx0)) >= threshold) 1
      else 0
    }

    var y = cy0
    while (y <= cy1) {
      // rolling corner bits: entering cell x we carry
      //   b0 = sample(x, y+1), b3 = sample(x, y)
      var b0 = bit(cx0, y + 1)
      var b3 = bit(cx0, y)
      var x = cx0
      while (x <= cx1) {
        val b1 = bit(x + 1, y + 1)
        val b2 = bit(x + 1, y)
        val idx = b0 | (b1 << 1) | (b2 << 2) | (b3 << 3)
        if (idx != 0 && idx != 15) {
          val segs = cases(idx)
          val segs2 = casesX2(idx)
          var s = 0
          var o = 0
          while (o < segs.length) {
            st.addSegment(
              x + segs(o), y + segs(o + 1), x + segs(o + 2), y + segs(o + 3),
              2L * x + segs2(o), 2L * y + segs2(o + 1),
              2L * x + segs2(o + 2), 2L * y + segs2(o + 3),
              sweepKey(x, y, gdx, s))
            s += 1
            o += 4
          }
        }
        b0 = b1
        b3 = b2
        x += 1
      }
      y += 1
    }
    new KernelOut(st.rings, st.openFragments())
  }

  /** Multi-threshold sweep: ONE pass over the cells for ALL thresholds.
    * Rolling state carries corner VALUES (not bits); per cell the corner
    * min/max bounds which thresholds can emit (mixed bits iff
    * min < t <= max), so cost is O(cells + emitted segments) instead of
    * O(cells * |thresholds|) — and the raster is streamed from memory once.
    * Per threshold, cells are visited in the same row-major order with the
    * same case bits as the single-threshold sweep, so each threshold's
    * output is byte-identical to `sweep`.
    *
    * NaN corners are normalized to -Infinity: `NaN >= t` and `-Inf >= t`
    * are both false for every t, so the case bits are unchanged.
    */
  def sweepMulti(values: Array[Double], vw: Int, vh: Int, vx0: Int, vy0: Int,
                 gdx: Int, gdy: Int,
                 cx0: Int, cx1: Int, cy0: Int, cy1: Int,
                 thresholds: Array[Double]): Array[KernelOut] = {
    val n = thresholds.length
    val sts = Array.fill(n)(new Stitcher(gdx))
    val cases = Cases.table
    val casesX2 = Cases.tableX2
    val NegInf = Double.NegativeInfinity

    @inline def valueAt(sx: Int, sy: Int): Double = {
      if (sx < 0 || sy < 0 || sx >= gdx || sy >= gdy) NegInf
      else {
        val v = values((sy - vy0) * vw + (sx - vx0))
        if (v != v) NegInf else v
      }
    }

    var y = cy0
    while (y <= cy1) {
      // rolling corner values: entering cell x we carry
      //   c0 = sample(x, y+1), c3 = sample(x, y)
      var c0 = valueAt(cx0, y + 1)
      var c3 = valueAt(cx0, y)
      var x = cx0
      while (x <= cx1) {
        val c1 = valueAt(x + 1, y + 1)
        val c2 = valueAt(x + 1, y)
        var lo = c0; var hi = c0
        if (c1 < lo) lo = c1 else if (c1 > hi) hi = c1
        if (c2 < lo) lo = c2 else if (c2 > hi) hi = c2
        if (c3 < lo) lo = c3 else if (c3 > hi) hi = c3
        var ti = 0
        while (ti < n) {
          val t = thresholds(ti)
          // mixed bits iff lo < t <= hi (else case 0 or 15: nothing emitted)
          if (t > lo && t <= hi) {
            val idx = (if (c0 >= t) 1 else 0) | (if (c1 >= t) 2 else 0) |
              (if (c2 >= t) 4 else 0) | (if (c3 >= t) 8 else 0)
            if (idx != 0 && idx != 15) {
              val segs = cases(idx)
              val segs2 = casesX2(idx)
              val st = sts(ti)
              var s = 0
              var o = 0
              while (o < segs.length) {
                st.addSegment(
                  x + segs(o), y + segs(o + 1), x + segs(o + 2), y + segs(o + 3),
                  2L * x + segs2(o), 2L * y + segs2(o + 1),
                  2L * x + segs2(o + 2), 2L * y + segs2(o + 3),
                  sweepKey(x, y, gdx, s))
                s += 1
                o += 4
              }
            }
          }
          ti += 1
        }
        c0 = c1
        c3 = c2
        x += 1
      }
      y += 1
    }
    sts.map(st => new KernelOut(st.rings, st.openFragments()))
  }

  /** Full-grid sweep (the reference's exact domain): values length must be
    * gdx*gdy. Every ring closes; asserts no open fragments remain.
    */
  def sweepFullGrid(values: Array[Double], gdx: Int, gdy: Int,
                    threshold: Double): scala.collection.Seq[ClosedRing] = {
    val out = sweep(values, gdx, gdy, 0, 0, gdx, gdy, -1, gdx - 1, -1, gdy - 1, threshold)
    require(out.frags.isEmpty, s"unexpected open fragments on full grid: ${out.frags.length}")
    out.rings
  }

  /** Per-case cell histogram over the same cell range (16 counts) — used by
    * the SQL-oracle queries; shares the bit/case semantics with `sweep`.
    */
  def caseHistogram(values: Array[Double], vw: Int, vh: Int, vx0: Int, vy0: Int,
                    gdx: Int, gdy: Int,
                    cx0: Int, cx1: Int, cy0: Int, cy1: Int,
                    threshold: Double): Array[Long] = {
    val hist = new Array[Long](16)
    @inline def bit(sx: Int, sy: Int): Int = {
      if (sx < 0 || sy < 0 || sx >= gdx || sy >= gdy) 0
      else if (values((sy - vy0) * vw + (sx - vx0)) >= threshold) 1
      else 0
    }
    var y = cy0
    while (y <= cy1) {
      var b0 = bit(cx0, y + 1)
      var b3 = bit(cx0, y)
      var x = cx0
      while (x <= cx1) {
        val b1 = bit(x + 1, y + 1)
        val b2 = bit(x + 1, y)
        hist(b0 | (b1 << 1) | (b2 << 2) | (b3 << 3)) += 1
        b0 = b1
        b3 = b2
        x += 1
      }
      y += 1
    }
    hist
  }
}

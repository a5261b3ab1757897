package graft.core

/** Per-tile raster-window kernels over a halo'd buffer — the ZERO-SHUFFLE
  * formulation of the focal/slope/D8/upsample operators: each tile owns
  * samples [ox0, ox0+ow) x [oy0, oy0+oh) of a w x h grid and carries a
  * 1-sample halo on every side (clipped at the grid edge), exactly the
  * dependency footprint of a 3x3 window / bilinear 2x stencil. The kernels
  * run cell loops INSIDE the tile and emit per-raster-row (or per-direction)
  * INTEGER partials, so the only exchange downstream is a tiny partial-
  * aggregate merge — never the raster itself (the cell-level scatter/pivot
  * formulation in queries.RasterOps ships every raster byte 9-16x through a
  * key-local shuffle; it remains as the bit-exact cross-check).
  *
  * EXACTNESS CONTRACT: every f64 expression below mirrors the cell-level
  * Column expressions token for token (same association tree, same mirrored
  * slot labeling s(o) = value at (x - dx_o, y - dy_o), dx_o = o%3 - 1,
  * dy_o = o/3 - 1), and every value quantizes PER CELL (floor(v * 2^20))
  * before entering an order-free integer sum — so tiled == cell-level
  * bit-for-bit (RasterRandomSpec asserts it on random grids and tilings),
  * and both match the DuckDB oracles.
  *
  * Buffer layout: `vals` row-major with origin (bx0, by0), dims bw x bh;
  * the owned region plus halo, so bx0 = max(ox0-1, 0) etc.
  */
object RasterKernel {

  /** 2^20 per-cell quantization, shared with the oracles. */
  final val Q20 = 1048576.0

  /** Per-row integer partials: (y, n, qsum, qmin, qmax). */
  type RowStat = (Long, Long, Long, Long, Long)

  /** 3x3 focal mean over the tile's owned INTERIOR cells (tx in [1, w-2],
    * ty in [1, h-2] intersected with the owned region) — per-row partials.
    */
  def focalRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                ox0: Int, oy0: Int, ow: Int, oh: Int,
                w: Int, h: Int): Seq[RowStat] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var qsum = 0L
      var qmin = Long.MaxValue; var qmax = Long.MinValue
      var tx = txLo
      while (tx <= txHi) {
        val v0 = g(tx + 1, ty + 1); val v1 = g(tx, ty + 1); val v2 = g(tx - 1, ty + 1)
        val v3 = g(tx + 1, ty); val v4 = g(tx, ty); val v5 = g(tx - 1, ty)
        val v6 = g(tx + 1, ty - 1); val v7 = g(tx, ty - 1); val v8 = g(tx - 1, ty - 1)
        val mean = ((((v0 + v1) + v2) + ((v3 + v4) + v5)) + ((v6 + v7) + v8)) / 9.0
        val q = math.floor(mean * Q20).toLong
        n += 1; qsum += q
        if (q < qmin) qmin = q
        if (q > qmax) qmax = q
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, qsum, qmin, qmax))
      ty += 1
    }
    out.toSeq
  }

  /** 3x3 focal mean emitted PER CELL as the RAW f64 value (identical
    * expression tree to [[focalRows]] — NO quantization: this is the
    * grid-valued form that feeds downstream f64 consumers, e.g. the
    * contour pipeline over the low-pass-filtered field), RE-ORIGINED to
    * the filtered grid's own frame: the interior cell (x, y) of the
    * w x h input becomes cell (x - 1, y - 1) of a (w-2) x (h-2) output
    * grid. Each owned interior cell is emitted exactly once across
    * tiles.
    */
  def focalCells(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                 ox0: Int, oy0: Int, ow: Int, oh: Int,
                 w: Int, h: Int): Seq[(Int, Int, Double)] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Int, Double)](
      math.max((tyHi - tyLo + 1) * (txHi - txLo + 1), 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var tx = txLo
      while (tx <= txHi) {
        val v0 = g(tx + 1, ty + 1); val v1 = g(tx, ty + 1); val v2 = g(tx - 1, ty + 1)
        val v3 = g(tx + 1, ty); val v4 = g(tx, ty); val v5 = g(tx - 1, ty)
        val v6 = g(tx + 1, ty - 1); val v7 = g(tx, ty - 1); val v8 = g(tx - 1, ty - 1)
        val mean = ((((v0 + v1) + v2) + ((v3 + v4) + v5)) + ((v6 + v7) + v8)) / 9.0
        out += ((tx - 1, ty - 1, mean))
        tx += 1
      }
      ty += 1
    }
    out.toSeq
  }

  /** Horn slope (sqrt(gx^2 + gy^2), correctly-rounded sqrt) over the same
    * interior — per-row partials.
    */
  def slopeRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                ox0: Int, oy0: Int, ow: Int, oh: Int,
                w: Int, h: Int): Seq[RowStat] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var qsum = 0L
      var qmin = Long.MaxValue; var qmax = Long.MinValue
      var tx = txLo
      while (tx <= txHi) {
        val v0 = g(tx + 1, ty + 1); val v1 = g(tx, ty + 1); val v2 = g(tx - 1, ty + 1)
        val v5 = g(tx - 1, ty); val v3 = g(tx + 1, ty)
        val v6 = g(tx + 1, ty - 1); val v7 = g(tx, ty - 1); val v8 = g(tx - 1, ty - 1)
        val gx = (((v0 + v3 * 2.0) + v6) - ((v2 + v5 * 2.0) + v8)) / 8.0
        val gy = (((v0 + v1 * 2.0) + v2) - ((v6 + v7 * 2.0) + v8)) / 8.0
        val q = math.floor(math.sqrt(gx * gx + gy * gy) * Q20).toLong
        n += 1; qsum += q
        if (q < qmin) qmin = q
        if (q > qmax) qmax = q
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, qsum, qmin, qmax))
      ty += 1
    }
    out.toSeq
  }

  /** Sun direction for [[hillshadeRows]]: azimuth 315 deg, altitude 45 deg,
    * chosen so every component of the unit sun vector is EXACTLY
    * deterministic in f64 — lx = cos(alt)*sin(az) = -0.5 and
    * ly = cos(alt)*cos(az) = 0.5 are exact literals, lz = sin(alt) =
    * sqrt(2)/2 is a correctly-rounded sqrt followed by an exact halving.
    * (Any other sun angle would drag sin/cos — libm-dependent, not
    * correctly rounded — onto the oracle-exact surface.)
    */
  final val SunLz = math.sqrt(2.0) / 2.0

  /** Lambertian hillshade over the same interior — per-row partials.
    * Horn gradients p = gx, q = gy (identical expressions to slopeRows),
    * unnormalized surface normal (-p, -q, 1); shade = max(0, n . l / |n|) =
    * max(0, ((p*0.5 - q*0.5) + lz) / sqrt((1 + p^2) + q^2)) after folding
    * the exact sun components in (-p*lx = p*0.5, -q*ly = -q*0.5). Division
    * and sqrt are correctly rounded, the max compares exactly, and the
    * result quantizes per cell before the order-free integer row sums.
    */
  def hillshadeRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                    ox0: Int, oy0: Int, ow: Int, oh: Int,
                    w: Int, h: Int): Seq[RowStat] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var qsum = 0L
      var qmin = Long.MaxValue; var qmax = Long.MinValue
      var tx = txLo
      while (tx <= txHi) {
        val v0 = g(tx + 1, ty + 1); val v1 = g(tx, ty + 1); val v2 = g(tx - 1, ty + 1)
        val v5 = g(tx - 1, ty); val v3 = g(tx + 1, ty)
        val v6 = g(tx + 1, ty - 1); val v7 = g(tx, ty - 1); val v8 = g(tx - 1, ty - 1)
        val gx = (((v0 + v3 * 2.0) + v6) - ((v2 + v5 * 2.0) + v8)) / 8.0
        val gy = (((v0 + v1 * 2.0) + v2) - ((v6 + v7 * 2.0) + v8)) / 8.0
        val shade = ((gx * 0.5 - gy * 0.5) + SunLz) /
          math.sqrt((1.0 + gx * gx) + gy * gy)
        val q = math.floor(math.max(shade, 0.0) * Q20).toLong
        n += 1; qsum += q
        if (q < qmin) qmin = q
        if (q > qmax) qmax = q
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, qsum, qmin, qmax))
      ty += 1
    }
    out.toSeq
  }

  /** Per-row integer partials carrying TWO quantized stats:
    * (y, n, s1sum, s1min, s1max, s2sum, s2min, s2max). */
  type RowStat2 = (Long, Long, Long, Long, Long, Long, Long, Long)

  /** Zevenbergen & Thorne (1987) curvature pair over the same interior —
    * per-row partials of PLAN curvature (curvature of the contour line
    * through the cell: ridge/valley planform convergence) and PROFILE
    * curvature (curvature along the slope line: acceleration of flow),
    * the two second-derivative terrain classifiers read next to slope and
    * aspect. Quadratic-surface coefficients over the 3x3 window (unit cell
    * size):
    *   d = (v5 + v3)/2 - v4, e = (v7 + v1)/2 - v4,
    *   f = ((v0 - v2) + (v8 - v6))/4, g = (v3 - v5)/2, h = (v1 - v7)/2;
    *   den = g^2 + h^2;
    *   plan    =  2 * ((d*h^2 + e*g^2) - f*g*h) / den  (0 when den = 0)
    *   profile = -2 * ((d*g^2 + e*h^2) + f*g*h) / den  (0 when den = 0)
    * Every operation is a fixed-association f64 +,-,*,/ (all correctly
    * rounded, no libm), the flat-cell guard compares exactly against
    * +0.0 (den >= 0 always), and both values quantize per cell
    * (floor(v * 2^20)) before the order-free integer row sums — the same
    * exactness contract as the slope family.
    */
  def curvatureRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                    ox0: Int, oy0: Int, ow: Int, oh: Int,
                    w: Int, h: Int): Seq[RowStat2] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat2](math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L
      var plSum = 0L; var plMin = Long.MaxValue; var plMax = Long.MinValue
      var prSum = 0L; var prMin = Long.MaxValue; var prMax = Long.MinValue
      var tx = txLo
      while (tx <= txHi) {
        val v0 = g(tx + 1, ty + 1); val v1 = g(tx, ty + 1); val v2 = g(tx - 1, ty + 1)
        val v5 = g(tx - 1, ty); val v4 = g(tx, ty); val v3 = g(tx + 1, ty)
        val v6 = g(tx + 1, ty - 1); val v7 = g(tx, ty - 1); val v8 = g(tx - 1, ty - 1)
        val dd = (v5 + v3) / 2.0 - v4
        val ee = (v7 + v1) / 2.0 - v4
        val ff = ((v0 - v2) + (v8 - v6)) / 4.0
        val gg = (v3 - v5) / 2.0
        val hh = (v1 - v7) / 2.0
        val den = gg * gg + hh * hh
        val pl = if (den == 0.0) 0.0
          else 2.0 * ((dd * (hh * hh) + ee * (gg * gg)) - (ff * gg) * hh) / den
        val pr = if (den == 0.0) 0.0
          else -2.0 * ((dd * (gg * gg) + ee * (hh * hh)) + (ff * gg) * hh) / den
        val qpl = math.floor(pl * Q20).toLong
        val qpr = math.floor(pr * Q20).toLong
        n += 1
        plSum += qpl; if (qpl < plMin) plMin = qpl; if (qpl > plMax) plMax = qpl
        prSum += qpr; if (qpr < prMin) prMin = qpr; if (qpr > prMax) prMax = qpr
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, plSum, plMin, plMax, prSum, prMin, prMax))
      ty += 1
    }
    out.toSeq
  }

  /** Horn slope over the same interior, emitted PER CELL as (cell id =
    * y * w + x, floor(slope * 2^20)) — the feed for compositions that need
    * the slope raster itself (e.g. zonal statistics of slope inside
    * contour zones) rather than row summaries. Identical expression tree
    * to [[slopeRows]]; still zero raster shuffle (each tile emits only its
    * owned cells, exactly once).
    */
  def slopeCells(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                 ox0: Int, oy0: Int, ow: Int, oh: Int,
                 w: Int, h: Int): Seq[(Long, Long)] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](
      math.max((tyHi - tyLo + 1) * (txHi - txLo + 1), 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var tx = txLo
      while (tx <= txHi) {
        val v0 = g(tx + 1, ty + 1); val v1 = g(tx, ty + 1); val v2 = g(tx - 1, ty + 1)
        val v5 = g(tx - 1, ty); val v3 = g(tx + 1, ty)
        val v6 = g(tx + 1, ty - 1); val v7 = g(tx, ty - 1); val v8 = g(tx - 1, ty - 1)
        val gx = (((v0 + v3 * 2.0) + v6) - ((v2 + v5 * 2.0) + v8)) / 8.0
        val gy = (((v0 + v1 * 2.0) + v2) - ((v6 + v7 * 2.0) + v8)) / 8.0
        out += ((ty.toLong * w + tx, math.floor(math.sqrt(gx * gx + gy * gy) * Q20).toLong))
        tx += 1
      }
      ty += 1
    }
    out.toSeq
  }

  /** Riley terrain ruggedness index (TRI) over the same interior — per-row
    * partials. tri = sqrt(sum over the 3x3 window of (s(o) - center)^2) with
    * the focal kernel's row-of-three association tree; the center term
    * (v4 - v4)^2 is EXACTLY +0.0 (x - x = +0.0, squares are non-negative,
    * and adding +0.0 to a non-negative f64 is the identity), so keeping it
    * preserves the shared tree shape at zero cost. sqrt is correctly
    * rounded, and the result quantizes per cell before the order-free
    * integer row sums.
    */
  def triRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
              ox0: Int, oy0: Int, ow: Int, oh: Int,
              w: Int, h: Int): Seq[RowStat] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var qsum = 0L
      var qmin = Long.MaxValue; var qmax = Long.MinValue
      var tx = txLo
      while (tx <= txHi) {
        val v0 = g(tx + 1, ty + 1); val v1 = g(tx, ty + 1); val v2 = g(tx - 1, ty + 1)
        val v3 = g(tx + 1, ty); val v4 = g(tx, ty); val v5 = g(tx - 1, ty)
        val v6 = g(tx + 1, ty - 1); val v7 = g(tx, ty - 1); val v8 = g(tx - 1, ty - 1)
        @inline def sq(v: Double): Double = (v - v4) * (v - v4)
        val tri = math.sqrt((((sq(v0) + sq(v1)) + sq(v2))
          + ((sq(v3) + sq(v4)) + sq(v5)))
          + ((sq(v6) + sq(v7)) + sq(v8)))
        val q = math.floor(tri * Q20).toLong
        n += 1; qsum += q
        if (q < qmin) qmin = q
        if (q > qmax) qmax = q
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, qsum, qmin, qmax))
      ty += 1
    }
    out.toSeq
  }

  /** The 22.5-degree octant-boundary slope: tan(pi/8) = sqrt(2) - 1.
    * DETERMINISTIC in f64 on both compare sides — sqrt is correctly
    * rounded and the subtraction is exact by the Sterbenz lemma
    * (1 <= sqrt(2) <= 2). Any other boundary constant would drag libm
    * tan onto the oracle surface.
    */
  final val Tan22_5 = math.sqrt(2.0) - 1.0

  /** 8-way aspect classification over the same interior — per-CLASS
    * counts. Aspect (the compass direction of steepest descent) normally
    * needs atan2 — libm-dependent, off the oracle-exact surface — but the
    * CLASS only needs octant membership, which is pure comparisons: with
    * the downslope vector (ax, ay) = (-gx, -gy) (Horn gradients),
    * class = -1 for flats (ax = 0 AND ay = 0), else
    * E(0)/W(4) when |ay| <= T * |ax| (sign of ax),
    * N(2)/S(6) when |ax| <= T * |ay| (sign of ay),
    * else the diagonal quadrant NE(1)/NW(3)/SW(5)/SE(7) by signs —
    * T = [[Tan22_5]], every comparison exact in f64 and mirrored token
    * for token by the oracle (boundaries land in the axis classes by the
    * <= on both guards).
    */
  def aspectClasses(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                    ox0: Int, oy0: Int, ow: Int, oh: Int,
                    w: Int, h: Int): Seq[(Long, Long)] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val counts = new Array[Long](9) // slot 0 = flat (-1), slots 1..8 = classes 0..7
    var ty = tyLo
    while (ty <= tyHi) {
      var tx = txLo
      while (tx <= txHi) {
        val v0 = g(tx + 1, ty + 1); val v1 = g(tx, ty + 1); val v2 = g(tx - 1, ty + 1)
        val v5 = g(tx - 1, ty); val v3 = g(tx + 1, ty)
        val v6 = g(tx + 1, ty - 1); val v7 = g(tx, ty - 1); val v8 = g(tx - 1, ty - 1)
        val gx = (((v0 + v3 * 2.0) + v6) - ((v2 + v5 * 2.0) + v8)) / 8.0
        val gy = (((v0 + v1 * 2.0) + v2) - ((v6 + v7 * 2.0) + v8)) / 8.0
        val ax = -gx; val ay = -gy
        val cls =
          if (ax == 0.0 && ay == 0.0) -1L
          else if (math.abs(ay) <= Tan22_5 * math.abs(ax)) { if (ax > 0.0) 0L else 4L }
          else if (math.abs(ax) <= Tan22_5 * math.abs(ay)) { if (ay > 0.0) 2L else 6L }
          else if (ax > 0.0 && ay > 0.0) 1L
          else if (ax < 0.0 && ay > 0.0) 3L
          else if (ax < 0.0 && ay < 0.0) 5L
          else 7L
        counts((cls + 1).toInt) += 1L
        tx += 1
      }
      ty += 1
    }
    (0 until 9).iterator.filter(counts(_) > 0L)
      .map(i => ((i - 1).toLong, counts(i))).toSeq
  }

  /** D8 flow direction over the same interior — per-DIRECTION partials
    * (dir, n, max packed value), dirs in [-1, 8]. Packed-argmax entirely in
    * the integer domain after per-neighbour quantization, identical to the
    * cell-level formulation: packed(o) = floor((center - s(o)) / dist *
    * 2^20) * 16 + (8 - o), ties to the smallest slot by construction.
    */
  def d8Dirs(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
             ox0: Int, oy0: Int, ow: Int, oh: Int,
             w: Int, h: Int): Seq[(Long, Long, Long)] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val sqrt2 = math.sqrt(2.0)
    val slots = Array(0, 1, 2, 3, 5, 6, 7, 8)
    val dists = slots.map(o => if (o % 3 - 1 != 0 && o / 3 - 1 != 0) sqrt2 else 1.0)
    val n = new Array[Long](10) // index dir + 1
    val mx = Array.fill(10)(Long.MinValue)
    var ty = tyLo
    while (ty <= tyHi) {
      var tx = txLo
      while (tx <= txHi) {
        val v4 = g(tx, ty)
        var pmax = Long.MinValue
        var si = 0
        while (si < 8) {
          val o = slots(si)
          val p = math.floor((v4 - g(tx - (o % 3 - 1), ty - (o / 3 - 1))) / dists(si) * Q20)
            .toLong * 16L + (8L - o)
          if (p > pmax) pmax = p
          si += 1
        }
        val dir = if (pmax >= 16L) (8L - pmax % 16L).toInt else -1
        n(dir + 1) += 1
        if (pmax > mx(dir + 1)) mx(dir + 1) = pmax
        tx += 1
      }
      ty += 1
    }
    (0 until 10).iterator.filter(n(_) > 0)
      .map(i => ((i - 1).toLong, n(i), mx(i))).toSeq
  }

  /** Per-cell 3x3 focal MEDIAN values re-origined to the (w-2) x (h-2)
    * filtered frame — [[focalCells]]' nonlinear sibling and
    * [[medianRows]]' cell-emitting form, the feed for contouring a
    * median-filtered field (speckle suppression before vectorization,
    * where the mean filter would smear impulse noise into neighbors).
    * The median is pure order statistics: the emitted value IS one of
    * the nine window samples, untouched by arithmetic, so the filtered
    * field is bit-exact against ANY correct 9-element sort (the oracle's
    * list_sort pick included; -0.0/0.0 ties are value-identical in every
    * downstream compare and sum).
    */
  def medianCells(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                  ox0: Int, oy0: Int, ow: Int, oh: Int,
                  w: Int, h: Int): Seq[(Int, Int, Double)] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val a = new Array[Double](9)
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Int, Double)](
      math.max((tyHi - tyLo + 1) * (txHi - txLo + 1), 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var tx = txLo
      while (tx <= txHi) {
        var o = 0
        while (o < 9) { a(o) = g(tx - (o % 3 - 1), ty - (o / 3 - 1)); o += 1 }
        var i = 1
        while (i < 9) {
          val x = a(i); var j = i - 1
          while (j >= 0 && a(j) > x) { a(j + 1) = a(j); j -= 1 }
          a(j + 1) = x; i += 1
        }
        out += ((tx - 1, ty - 1, a(4)))
        tx += 1
      }
      ty += 1
    }
    out.toSeq
  }

  /** 3x3 focal MEDIAN over the same interior — per-row partials. The
    * median is pure ORDER STATISTICS: an insertion sort of the 9 window
    * values and a pick of the 5th — no arithmetic touches the values at
    * all, so exactness needs no fixed association tree; the quantization
    * floor(median * 2^20) is the only operation. (-0.0/0.0 ties may order
    * differently across sorters, but the tied values quantize identically,
    * so the 5th element's quantum is deterministic either way.)
    */
  def medianRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                 ox0: Int, oy0: Int, ow: Int, oh: Int,
                 w: Int, h: Int): Seq[RowStat] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val a = new Array[Double](9)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var qsum = 0L
      var qmin = Long.MaxValue; var qmax = Long.MinValue
      var tx = txLo
      while (tx <= txHi) {
        var o = 0
        while (o < 9) { a(o) = g(tx - (o % 3 - 1), ty - (o / 3 - 1)); o += 1 }
        var i = 1
        while (i < 9) {
          val x = a(i); var j = i - 1
          while (j >= 0 && a(j) > x) { a(j + 1) = a(j); j -= 1 }
          a(j + 1) = x; i += 1
        }
        val q = math.floor(a(4) * Q20).toLong
        n += 1; qsum += q
        if (q < qmin) qmin = q
        if (q > qmax) qmax = q
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, qsum, qmin, qmax))
      ty += 1
    }
    out.toSeq
  }

  /** 3x3 focal MAJORITY (mode filter) over the same interior — the
    * classifier-smoothing analog of [[medianRows]]: each window sample
    * bins to floor(v) (the INTEGER VALUE buckets of the histogram
    * contract — a mode over raw doubles would be vacuously all-distinct),
    * the mode is the most frequent bin with the SMALLEST-BIN tie-break (a
    * stated convention, so engine/oracle/spec agree exactly), and per-row
    * partials summarize the mode values. Pure counting + selection — no
    * arithmetic touches the values, so nothing quantizes beyond the bin
    * floor itself. O(81) per cell: each of the 9 bins counted against the
    * window by two nested constant loops — no allocation, no sort.
    */
  def majorityRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                   ox0: Int, oy0: Int, ow: Int, oh: Int,
                   w: Int, h: Int): Seq[RowStat] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val b = new Array[Long](9)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var qsum = 0L
      var qmin = Long.MaxValue; var qmax = Long.MinValue
      var tx = txLo
      while (tx <= txHi) {
        var o = 0
        while (o < 9) {
          b(o) = math.floor(g(tx - (o % 3 - 1), ty - (o / 3 - 1))).toLong
          o += 1
        }
        var best = 0L; var bestCnt = 0
        var i = 0
        while (i < 9) {
          var c = 0; var j = 0
          while (j < 9) { if (b(j) == b(i)) c += 1; j += 1 }
          if (c > bestCnt || (c == bestCnt && b(i) < best)) { best = b(i); bestCnt = c }
          i += 1
        }
        n += 1; qsum += best
        if (best < qmin) qmin = best
        if (best > qmax) qmax = best
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, qsum, qmin, qmax))
      ty += 1
    }
    out.toSeq
  }

  /** Binary 3x3 morphology counts over the same interior, one row per
    * threshold: (threshold, n_mask, n_erode, n_dilate) where the mask is
    * v >= threshold, erosion keeps a center iff ALL 9 window samples are in
    * the mask (window min >= t) and dilation iff ANY is (window max >= t).
    * Entirely boolean/integer — the window min/max are exact selections,
    * the compares exact, nothing quantizes.
    */
  def morphCounts(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                  ox0: Int, oy0: Int, ow: Int, oh: Int,
                  w: Int, h: Int, thresholds: Array[Double]): Seq[(Double, Long, Long, Long)] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val nT = thresholds.length
    val nMask = new Array[Long](nT); val nEro = new Array[Long](nT); val nDil = new Array[Long](nT)
    var visited = 0L
    var ty = tyLo
    while (ty <= tyHi) {
      var tx = txLo
      while (tx <= txHi) {
        visited += 1
        val c = g(tx, ty)
        var mn = c; var mx = c
        var o = 0
        while (o < 9) {
          if (o != 4) {
            val v = g(tx - (o % 3 - 1), ty - (o / 3 - 1))
            if (v < mn) mn = v
            if (v > mx) mx = v
          }
          o += 1
        }
        var ti = 0
        while (ti < nT) {
          val t = thresholds(ti)
          if (c >= t) nMask(ti) += 1
          if (mn >= t) nEro(ti) += 1
          if (mx >= t) nDil(ti) += 1
          ti += 1
        }
        tx += 1
      }
      ty += 1
    }
    // every threshold emits (all-zero rows included) whenever the tile owns
    // interior cells — the merged output carries the dense threshold rows
    // the oracle's CROSS JOIN produces; interior-empty tiles emit nothing
    if (visited == 0L) Seq.empty
    else (0 until nT).map(i => (thresholds(i), nMask(i), nEro(i), nDil(i)))
  }

  /** BIT-QUAD topology counts of the `v >= threshold` mask, one row per
    * threshold: (threshold, n_mask, n_hpairs, n_vpairs, q1, q3, qd) —
    * the Gray (1971) pattern census over every 2x2 quad of the EXTENDED
    * lattice (anchors (x, y), x in [-1, w-1], y in [-1, h-1]; cells
    * outside the grid count as background), from which Euler
    * characteristics derive exactly: chi4 = (q1 - q3 + 2*qd) / 4
    * (4-connected components minus 8-connected holes) and chi8 =
    * (q1 - q3 - 2*qd) / 4, plus the boundary perimeter
    * 4*n - 2*(n_hpairs + n_vpairs). Attribution is EXACT-ONCE with only
    * the 1-cell halo: each owned cell (x, y) contributes the quad
    * anchored at (x-1, y-1); the right/bottom border quads (whose
    * off-grid cells are background anyway) ride the w-1 / h-1 owned
    * cells. Adjacent pairs attribute to their right/bottom cell.
    * Entirely boolean/integer — compares exact, nothing quantizes.
    */
  def topoCounts(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                 ox0: Int, oy0: Int, ow: Int, oh: Int,
                 w: Int, h: Int, thresholds: Array[Double]): Seq[(Double, Long, Long, Long, Long, Long, Long)] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val nT = thresholds.length
    val n = new Array[Long](nT); val nh = new Array[Long](nT); val nv = new Array[Long](nT)
    val q1 = new Array[Long](nT); val q3 = new Array[Long](nT); val qd = new Array[Long](nT)
    var visited = 0L
    var ty = oy0
    val tyHi = oy0 + oh - 1; val txHi = ox0 + ow - 1
    while (ty <= tyHi) {
      var tx = ox0
      while (tx <= txHi) {
        visited += 1
        var ti = 0
        while (ti < nT) {
          val t = thresholds(ti)
          @inline def m(x: Int, y: Int): Boolean =
            x >= 0 && x < w && y >= 0 && y < h && g(x, y) >= t
          @inline def quad(ax: Int, ay: Int): Unit = {
            val b00 = m(ax, ay); val b10 = m(ax + 1, ay)
            val b01 = m(ax, ay + 1); val b11 = m(ax + 1, ay + 1)
            val k = (if (b00) 1 else 0) + (if (b10) 1 else 0) +
              (if (b01) 1 else 0) + (if (b11) 1 else 0)
            if (k == 1) q1(ti) += 1
            else if (k == 3) q3(ti) += 1
            else if (k == 2 && b00 == b11 && b00 != b10) qd(ti) += 1
          }
          val c = m(tx, ty)
          if (c) {
            n(ti) += 1
            if (m(tx - 1, ty)) nh(ti) += 1
            if (m(tx, ty - 1)) nv(ti) += 1
          }
          quad(tx - 1, ty - 1)
          if (tx == w - 1) quad(tx, ty - 1)
          if (ty == h - 1) quad(tx - 1, ty)
          if (tx == w - 1 && ty == h - 1) quad(tx, ty)
          ti += 1
        }
        tx += 1
      }
      ty += 1
    }
    if (visited == 0L) Seq.empty
    else (0 until nT).map(i => (thresholds(i), n(i), nh(i), nv(i), q1(i), q3(i), qd(i)))
  }

  /** D8 successor per interior cell — (cell id = y * w + x, successor id,
    * or -1 for pits/flats): the same packed-argmax as [[d8Dirs]] decoded
    * to the downstream NEIGHBOUR (direction slot o drains to
    * (x - dx_o, y - dy_o) — the mirrored slot labeling). The feed for
    * watershed basin labeling; still zero raster shuffle (each tile emits
    * only its owned cells, exactly once). The flow graph is acyclic by
    * construction: a successor exists only on a quantized drop >= 1
    * quantum, so elevation strictly decreases along every path.
    */
  def d8SuccCells(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                  ox0: Int, oy0: Int, ow: Int, oh: Int,
                  w: Int, h: Int): Seq[(Long, Long)] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val sqrt2 = math.sqrt(2.0)
    val slots = Array(0, 1, 2, 3, 5, 6, 7, 8)
    val dists = slots.map(o => if (o % 3 - 1 != 0 && o / 3 - 1 != 0) sqrt2 else 1.0)
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](
      math.max((tyHi - tyLo + 1) * (txHi - txLo + 1), 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var tx = txLo
      while (tx <= txHi) {
        val v4 = g(tx, ty)
        var pmax = Long.MinValue
        var si = 0
        while (si < 8) {
          val o = slots(si)
          val p = math.floor((v4 - g(tx - (o % 3 - 1), ty - (o / 3 - 1))) / dists(si) * Q20)
            .toLong * 16L + (8L - o)
          if (p > pmax) pmax = p
          si += 1
        }
        val succ =
          if (pmax >= 16L) {
            val dir = (8L - pmax % 16L).toInt
            (ty - (dir / 3 - 1)).toLong * w + (tx - (dir % 3 - 1))
          } else -1L
        out += ((ty.toLong * w + tx, succ))
        tx += 1
      }
      ty += 1
    }
    out.toSeq
  }

  /** Bilinear 2x upsample (align_corners=false, clamped edges) of the
    * tile's owned OUTPUT range [2*ox0, 2*(ox0+ow)) x [2*oy0, 2*(oy0+oh)) —
    * per-OUTPUT-row partials. Source reads stay within the 1-sample halo:
    * x0 = clamp((X-1) floorDiv 2) >= ox0 - 1, x1 = clamp((X+1) floorDiv 2)
    * <= min(ox0 + ow, w - 1).
    */
  def upsampleRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                   ox0: Int, oy0: Int, ow: Int, oh: Int,
                   w: Int, h: Int): Seq[RowStat] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    @inline def clamp(c: Int, hi: Int): Int = math.max(0, math.min(c, hi))
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](2 * oh)
    var oy = 2 * oy0
    while (oy < 2 * (oy0 + oh)) {
      val y0 = clamp(Math.floorDiv(oy - 1, 2), h - 1)
      val y1 = clamp(Math.floorDiv(oy + 1, 2), h - 1)
      val fy = if (oy % 2 == 0) 0.75 else 0.25
      var n = 0L; var qsum = 0L
      var qmin = Long.MaxValue; var qmax = Long.MinValue
      var ox = 2 * ox0
      while (ox < 2 * (ox0 + ow)) {
        val x0 = clamp(Math.floorDiv(ox - 1, 2), w - 1)
        val x1 = clamp(Math.floorDiv(ox + 1, 2), w - 1)
        val fx = if (ox % 2 == 0) 0.75 else 0.25
        val top = (g(x0, y0) * (1.0 - fx)) + (g(x1, y0) * fx)
        val bot = (g(x0, y1) * (1.0 - fx)) + (g(x1, y1) * fx)
        val q = math.floor(((top * (1.0 - fy)) + (bot * fy)) * Q20).toLong
        n += 1; qsum += q
        if (q < qmin) qmin = q
        if (q > qmax) qmax = q
        ox += 1
      }
      if (n > 0) out += ((oy.toLong, n, qsum, qmin, qmax))
      oy += 1
    }
    out.toSeq
  }

  /** Per-cell Moran's-I partials over the tile's owned cells — the spatial
    * autocorrelation feed: each cell quantizes q = floor(v * 2^20) and
    * contributes, against the caller-supplied quantized mean qbar,
    * (dev^2, dev * devEast + dev * devSouth, edge count). Rook adjacency
    * with each undirected edge attributed to its unique WEST/NORTH cell,
    * so every edge is counted exactly once across tiles; the east/south
    * neighbours always sit inside the 1-sample halo (clipped at the grid
    * edge, where the edge simply doesn't exist). Zero raster shuffle —
    * only these per-cell integer triples feed a map-side-combinable
    * DECIMAL(38,0) sum downstream. LOUD Long contract: |q| and |qbar|
    * < 2^30 (|dev| < 2^31, every per-cell product < 2^62); the caller's
    * value domain owns the bound, the kernel enforces it per cell.
    */
  /** Local Moran's I (LISA hotspot analysis) over the tile's owned
    * INTERIOR cells — the per-cell companion of [[moranCells]]:
    * li = dev_c * (dev_N + dev_S + dev_E + dev_W) against the caller's
    * truncated quantized mean, emitted as per-row partials of
    * liq = li / 2^20 (Long division truncates toward zero — DuckDB's `//`
    * semantics). All four rook neighbours sit inside the 1-sample halo.
    * Arithmetic is EXACT-OR-LOUD: |q| < 2^30 is enforced like moranCells,
    * and the product runs through multiplyExact, so an input outside the
    * provable bound throws instead of wrapping.
    */
  def localMoranRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                     ox0: Int, oy0: Int, ow: Int, oh: Int,
                     w: Int, h: Int, qbar: Long): Seq[RowStat] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    @inline def dev(x: Int, y: Int): Long = {
      val qq = math.floor(g(x, y) * Q20).toLong
      require(math.abs(qq) < (1L << 30),
        s"localMoranRows: |q| = $qq >= 2^30 at ($x, $y) breaks the product bound")
      qq - qbar
    }
    require(math.abs(qbar) < (1L << 30), s"localMoranRows: |qbar| = $qbar >= 2^30")
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var sum = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      var tx = txLo
      while (tx <= txHi) {
        val nb = Math.addExact(Math.addExact(dev(tx, ty - 1), dev(tx, ty + 1)),
          Math.addExact(dev(tx + 1, ty), dev(tx - 1, ty)))
        val liq = Math.multiplyExact(dev(tx, ty), nb) / 1048576L
        n += 1; sum += liq
        if (liq < mn) mn = liq
        if (liq > mx) mx = liq
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, sum, mn, mx))
      ty += 1
    }
    out.toSeq
  }

  /** Geary's C partials over the tile's owned cells — the DIFFERENCE-based
    * companion of [[moranCells]] (Moran correlates deviations, Geary sums
    * squared neighbour differences, so C is the statistic that catches
    * local roughness a global correlation washes out). Per owned cell:
    * (dev^2, sum over the in-grid east+south rook edges of (q_c - q_nb)^2,
    * edge count) — each unordered edge counted exactly once, at its
    * west/north endpoint, mirroring moranCells' scatter. dev^2 needs the
    * caller's truncated quantized mean; the difference term needs no mean
    * at all (translation-invariant). Same |q| < 2^30 loud bound: diff^2 <
    * 2^62 per edge, two edges per cell < 2^63, addExact backstops.
    */
  def gearyCells(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                 ox0: Int, oy0: Int, ow: Int, oh: Int,
                 w: Int, h: Int, qbar: Long): Seq[(Long, Long, Long)] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    @inline def q(x: Int, y: Int): Long = {
      val qq = math.floor(g(x, y) * Q20).toLong
      require(math.abs(qq) < (1L << 30),
        s"gearyCells: |q| = $qq >= 2^30 at ($x, $y) breaks the Long product bound")
      qq
    }
    require(math.abs(qbar) < (1L << 30), s"gearyCells: |qbar| = $qbar >= 2^30")
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)](ow * oh)
    var y = oy0
    while (y < oy0 + oh) {
      var x = ox0
      while (x < ox0 + ow) {
        val qc = q(x, y)
        val dev = qc - qbar
        var diff2 = 0L
        var ne = 0L
        if (x + 1 < w) { val d = qc - q(x + 1, y); diff2 = Math.addExact(diff2, d * d); ne += 1 }
        if (y + 1 < h) { val d = qc - q(x, y + 1); diff2 = Math.addExact(diff2, d * d); ne += 1 }
        out += ((dev * dev, diff2, ne))
        x += 1
      }
      y += 1
    }
    out.toSeq
  }

  /** Sobel gradient magnitude (L1) over the tile's owned INTERIOR cells —
    * the first-derivative edge detector pairing [[laplacianRows]]:
    * gx = (qNE + 2qE + qSE) - (qNW + 2qW + qSW),
    * gy = (qSW + 2qS + qSE) - (qNW + 2qN + qNE), and the emitted
    * magnitude is the L1 norm |gx| + |gy| — the stated contract (the
    * Euclidean norm's sqrt would leave the exact-integer surface). Same
    * per-row partials, same interior-only contract; addExact backstops
    * every combination.
    */
  def sobelRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                ox0: Int, oy0: Int, ow: Int, oh: Int,
                w: Int, h: Int): Seq[RowStat] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    @inline def q(x: Int, y: Int): Long = math.floor(g(x, y) * Q20).toLong
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var sum = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      var tx = txLo
      while (tx <= txHi) {
        val nw = q(tx - 1, ty - 1); val nn = q(tx, ty - 1); val ne = q(tx + 1, ty - 1)
        val ww = q(tx - 1, ty); val ee = q(tx + 1, ty)
        val sw = q(tx - 1, ty + 1); val ss = q(tx, ty + 1); val se = q(tx + 1, ty + 1)
        val gx = Math.subtractExact(
          Math.addExact(Math.addExact(ne, Math.multiplyExact(2L, ee)), se),
          Math.addExact(Math.addExact(nw, Math.multiplyExact(2L, ww)), sw))
        val gy = Math.subtractExact(
          Math.addExact(Math.addExact(sw, Math.multiplyExact(2L, ss)), se),
          Math.addExact(Math.addExact(nw, Math.multiplyExact(2L, nn)), ne))
        val g1 = Math.addExact(math.abs(gx), math.abs(gy))
        n += 1; sum = Math.addExact(sum, g1)
        if (g1 < mn) mn = g1
        if (g1 > mx) mx = g1
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, sum, mn, mx))
      ty += 1
    }
    out.toSeq
  }

  /** Discrete 4-neighbour Laplacian over the tile's owned INTERIOR cells
    * — the second-derivative edge/ridge detector (zero on linear ramps,
    * extreme at peaks, pits and edges): lap = qN + qS + qE + qW - 4*qC
    * over the per-cell quantized values, per-row integer partials.
    * Interior-only is the stated contract (every scored cell has all four
    * rook neighbours inside the 1-sample halo). |q| < 2^52 keeps the
    * 5-term combination exact in Long with room to spare; addExact
    * backstops loudly.
    */
  def laplacianRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                    ox0: Int, oy0: Int, ow: Int, oh: Int,
                    w: Int, h: Int): Seq[RowStat] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    @inline def q(x: Int, y: Int): Long = math.floor(g(x, y) * Q20).toLong
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var sum = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      var tx = txLo
      while (tx <= txHi) {
        val lap = Math.subtractExact(
          Math.addExact(Math.addExact(q(tx, ty - 1), q(tx, ty + 1)),
            Math.addExact(q(tx + 1, ty), q(tx - 1, ty))),
          Math.multiplyExact(4L, q(tx, ty)))
        n += 1; sum = Math.addExact(sum, lap)
        if (lap < mn) mn = lap
        if (lap > mx) mx = lap
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, sum, mn, mx))
      ty += 1
    }
    out.toSeq
  }

  def moranCells(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                 ox0: Int, oy0: Int, ow: Int, oh: Int,
                 w: Int, h: Int, qbar: Long): Seq[(Long, Long, Long)] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    @inline def q(x: Int, y: Int): Long = {
      val qq = math.floor(g(x, y) * Q20).toLong
      require(math.abs(qq) < (1L << 30),
        s"moranCells: |q| = $qq >= 2^30 at ($x, $y) breaks the Long product bound")
      qq
    }
    require(math.abs(qbar) < (1L << 30), s"moranCells: |qbar| = $qbar >= 2^30")
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)](ow * oh)
    var y = oy0
    while (y < oy0 + oh) {
      var x = ox0
      while (x < ox0 + ow) {
        val dev = q(x, y) - qbar
        var cross = 0L
        var ne = 0L
        if (x + 1 < w) { cross += dev * (q(x + 1, y) - qbar); ne += 1 }
        if (y + 1 < h) { cross += dev * (q(x, y + 1) - qbar); ne += 1 }
        out += ((dev * dev, cross, ne))
        x += 1
      }
      y += 1
    }
    out.toSeq
  }

  /** Getis–Ord Gi* partials over the tile's owned INTERIOR cells — the
    * hotspot-share statistic pairing [[localMoranRows]] (LISA finds
    * clustering of deviations; Gi* measures each neighbourhood's share of
    * the global mass): giq = (win * 10^8) div qtot where win is the 5-cell
    * rook-plus-self quantized window sum and qtot the caller's global
    * quantized total. The z-score normalization of the textbook Gi* needs
    * a sqrt; the stated contract here is the exact fixed-point share (the
    * same monotone ranking, no float anywhere). Interior-only, same rim
    * contract as LISA. EXACT-OR-LOUD: |q| < 2^30 keeps win * 10^8 < 2^60;
    * multiplyExact backstops, qtot = 0 is refused (share undefined), and
    * Long `/` truncates toward zero — DuckDB's `//` semantics.
    */
  def getisRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                ox0: Int, oy0: Int, ow: Int, oh: Int,
                w: Int, h: Int, qtot: Long): Seq[RowStat] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    @inline def q(x: Int, y: Int): Long = {
      val qq = math.floor(g(x, y) * Q20).toLong
      require(math.abs(qq) < (1L << 30),
        s"getisRows: |q| = $qq >= 2^30 at ($x, $y) breaks the Long product bound")
      qq
    }
    require(qtot != 0L, "getisRows: qtot = 0 — the Gi* share is undefined")
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var sum = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      var tx = txLo
      while (tx <= txHi) {
        val win = Math.addExact(q(tx, ty),
          Math.addExact(Math.addExact(q(tx, ty - 1), q(tx, ty + 1)),
            Math.addExact(q(tx + 1, ty), q(tx - 1, ty))))
        val giq = Math.multiplyExact(win, 100000000L) / qtot
        n += 1; sum = Math.addExact(sum, giq)
        if (giq < mn) mn = giq
        if (giq > mx) mx = giq
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, sum, mn, mx))
      ty += 1
    }
    out.toSeq
  }

  /** K-round COST-DISTANCE horizon over the tile's owned cells — the
    * isochrone primitive (cost-weighted travel distance from every source
    * cell, truncated at K hops): sources are cells with v >= srcThreshold
    * at cost 0; stepping INTO cell c adds its positive integer entry cost
    * qc = floor(v * 2^10) + 2^10; after exactly `rounds` SYNCHRONOUS
    * min-plus relaxations, each cell holds the min cost over all source
    * paths of <= `rounds` rook steps (unreached cells are dropped). The
    * K-hop dependency footprint is the Manhattan-K ball, so a K-cell halo
    * makes owned cells EXACT with zero raster shuffle (the round-r value
    * of a cell at distance d from an owned cell only feeds it through
    * rounds r <= K - d — the standard stencil-composition argument); the
    * caller owes halo >= rounds. Entry costs must be positive (loud
    * require — a zero-cost cycle would make even the full closure
    * ill-posed). Emitted as per-owned-row partials over REACHED cells.
    */
  /** Sentinel for an unreached cell in the K-round cost relaxation (also
    * the isochrone composition's grid value for such cells — comfortably
    * above any reachable K-hop cost yet exactly representable).
    */
  val CostInf: Long = 1000000000L

  /** The shared K-round synchronous min-plus relaxation over a buffer —
    * see [[costHorizonRows]] for the semantics and exactness argument.
    */
  private def relaxedCosts(vals: Array[Double], bw: Int,
                           rounds: Int, srcThreshold: Double): Array[Long] = {
    val bh = vals.length / bw
    val n = bw * bh
    val Inf = CostInf
    val qc = new Array[Long](n)
    var cost = new Array[Long](n)
    var i = 0
    while (i < n) {
      val q = math.floor(vals(i) * 1024.0).toLong + 1024L
      require(q > 0 && q <= (CostInf - 1) / rounds,
        s"relaxedCosts: entry cost $q outside (0, (CostInf-1)/rounds] (v = ${vals(i)}) " +
          "— any <= rounds-hop path must stay strictly below the CostInf sentinel")
      qc(i) = q
      cost(i) = if (vals(i) >= srcThreshold) 0L else Inf
      i += 1
    }
    var r = 0
    while (r < rounds) {
      val next = new Array[Long](n)
      var y = 0
      while (y < bh) {
        var x = 0
        while (x < bw) {
          val idx = y * bw + x
          var nb = Inf
          if (x > 0 && cost(idx - 1) < nb) nb = cost(idx - 1)
          if (x + 1 < bw && cost(idx + 1) < nb) nb = cost(idx + 1)
          if (y > 0 && cost(idx - bw) < nb) nb = cost(idx - bw)
          if (y + 1 < bh && cost(idx + bw) < nb) nb = cost(idx + bw)
          var best = cost(idx)
          if (nb < Inf) {
            val cand = nb + qc(idx)
            if (cand < best) best = cand
          }
          next(idx) = best
          x += 1
        }
        y += 1
      }
      cost = next
      r += 1
    }
    cost
  }

  def costHorizonRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                      ox0: Int, oy0: Int, ow: Int, oh: Int,
                      w: Int, h: Int, rounds: Int, srcThreshold: Double): Seq[RowStat] = {
    val Inf = CostInf
    val cost = relaxedCosts(vals, bw, rounds, srcThreshold)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](oh)
    var ty = oy0
    while (ty < oy0 + oh) {
      var cnt = 0L; var sum = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      var tx = ox0
      while (tx < ox0 + ow) {
        val c = cost((ty - by0) * bw + (tx - bx0))
        if (c < Inf) {
          cnt += 1; sum = Math.addExact(sum, c)
          if (c < mn) mn = c
          if (c > mx) mx = c
        }
        tx += 1
      }
      if (cnt > 0) out += ((ty.toLong, cnt, sum, mn, mx))
      ty += 1
    }
    out.toSeq
  }

  /** Directional empirical SEMIVARIOGRAM contributions over the tile's
    * owned cells — the geostatistics primitive (the curve a kriging model
    * is fit to): for lags 1/2/4/8 in the east (dir 0) and south (dir 1)
    * directions, each valid pair's squared quantized difference, keyed by
    * idx = dir * 4 + log2(lag). Every pair is counted exactly once at its
    * west/north endpoint (the moranCells attribution rule), and the
    * partner always sits inside the caller's max-lag halo. Per-PAIR
    * emission keeps every value provably inside Long (|q| < 2^30 gives
    * d^2 < 2^62, loudly required); the downstream sum runs in
    * decimal(38,0) on the lag-cardinality key — map-side combinable,
    * nothing wide ever shuffles.
    */
  def variogramCells(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                     ox0: Int, oy0: Int, ow: Int, oh: Int,
                     w: Int, h: Int): Seq[(Int, Long)] = {
    @inline def g(x: Int, y: Int): Double = vals((y - by0) * bw + (x - bx0))
    @inline def q(x: Int, y: Int): Long = {
      val qq = math.floor(g(x, y) * Q20).toLong
      require(math.abs(qq) < (1L << 30),
        s"variogramCells: |q| = $qq >= 2^30 at ($x, $y) breaks the Long product bound")
      qq
    }
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Long)](ow * oh * 8)
    var y = oy0
    while (y < oy0 + oh) {
      var x = ox0
      while (x < ox0 + ow) {
        val qc = q(x, y)
        var li = 0
        while (li < 4) {
          val lag = 1 << li
          if (x + lag < w) { val d = qc - q(x + lag, y); out += ((li, d * d)) }
          if (y + lag < h) { val d = qc - q(x, y + lag); out += ((4 + li, d * d)) }
          li += 1
        }
        x += 1
      }
      y += 1
    }
    out.toSeq
  }

  /** The K-round cost FIELD per owned cell — the isochrone composition's
    * grid feed: (x, y, cost) with unreached cells carrying the
    * [[CostInf]] sentinel VALUE (so the downstream contour engine sees a
    * dense grid where the reachability frontier is a genuine level set).
    * Costs are integers exactly representable as f64 (< 2^53 by the
    * relaxation's loud bound), so the handoff to the f64 contour pipeline
    * is exact. Same relaxation, same halo-width-K contract as
    * [[costHorizonRows]].
    */
  def costCellsK(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                 ox0: Int, oy0: Int, ow: Int, oh: Int,
                 w: Int, h: Int, rounds: Int, srcThreshold: Double): Seq[(Int, Int, Double)] = {
    val cost = relaxedCosts(vals, bw, rounds, srcThreshold)
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Int, Double)](ow * oh)
    var ty = oy0
    while (ty < oy0 + oh) {
      var tx = ox0
      while (tx < ox0 + ow) {
        out += ((tx, ty, cost((ty - by0) * bw + (tx - bx0)).toDouble))
        tx += 1
      }
      ty += 1
    }
    out.toSeq
  }

  /** Hilbert-curve index of a point on the 2^bits x 2^bits grid — the
    * locality key that strictly beats [[graft.queries.RasterOps.morton]]'s
    * Z-order for range scans (no Z-jump discontinuities: consecutive codes
    * are always rook-adjacent cells). The classic mask-and-rotate descent:
    * per level s = 2^(bits-1)..1, quadrant digit (3*rx) XOR ry weighs
    * s^2, then the Gray-code frame rotation (reflect-then-swap when
    * ry = 0) re-bases the remaining low bits. Pure integer arithmetic —
    * bit-identical on every platform; bits <= 31 keeps s*s and the
    * accumulated d inside Long exactly.
    */
  /** Multi-scale Topographic Position Index landform census over the
    * tile's owned interior cells — the Weiss landform classifier: at each
    * window radius r (scale = r), tpi_num = q*K - S where q = the cell's
    * PER-CELL quantization floor(v * 2^20), K = (2r+1)^2, and S = the sum
    * of q over the full window INCLUDING the center (so tpi_num =
    * K * (q - window mean), never a float mean — the whole operator is
    * integer after the per-cell quantize). A cell is a RIDGE when
    * tpi_num > K * 2^20 (the cell sits more than 1.0 value unit above its
    * neighborhood mean), a VALLEY when tpi_num < -K * 2^20, flat
    * otherwise. Emits per-(scale, row) partials
    * (scale, y, n, n_ridge, n_valley, tpi_sum); the caller's halo must be
    * >= r. |q| < 2^30 is loudly required so q*K and the window sums stay
    * far inside Long.
    */
  def tpiRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
              ox0: Int, oy0: Int, ow: Int, oh: Int,
              w: Int, h: Int, r: Int): Seq[(Long, Long, Long, Long, Long, Long)] = {
    @inline def q(x: Int, y: Int): Long = {
      val qq = math.floor(vals((y - by0) * bw + (x - bx0)) * Q20).toLong
      require(math.abs(qq) < (1L << 30),
        s"tpiRows: |q| = $qq >= 2^30 at ($x, $y) breaks the Long window bound")
      qq
    }
    val k = (2L * r + 1L) * (2L * r + 1L)
    val thr = k * 1048576L
    val txLo = math.max(ox0, r); val txHi = math.min(ox0 + ow - 1, w - 1 - r)
    val tyLo = math.max(oy0, r); val tyHi = math.min(oy0 + oh - 1, h - 1 - r)
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long, Long)](
      math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var nRidge = 0L; var nValley = 0L; var tpiSum = 0L
      var tx = txLo
      while (tx <= txHi) {
        var s = 0L
        var dy = -r
        while (dy <= r) {
          var dx = -r
          while (dx <= r) { s += q(tx + dx, ty + dy); dx += 1 }
          dy += 1
        }
        val tpi = q(tx, ty) * k - s
        n += 1
        if (tpi > thr) nRidge += 1
        else if (tpi < -thr) nValley += 1
        tpiSum = Math.addExact(tpiSum, tpi)
        tx += 1
      }
      if (n > 0) out += ((r.toLong, ty.toLong, n, nRidge, nValley, tpiSum))
      ty += 1
    }
    out.toSeq
  }

  /** WHITE TOP-HAT census partials over the tile's owned 5x5-interior
    * (cells at distance >= 2 from the grid border — the opening's full
    * support): th = q(c) - opening(c) >= 0 with opening = max over the
    * 3x3 neighborhood of each neighbor's 3x3 min, ALL on quantized longs
    * (floor(v * 2^20) per access, the shared convention — quantize THEN
    * morph, so tiled == the oracle's two-stage least/greatest gather
    * bit-for-bit; anti-extensivity of the opening holds termwise in the
    * integer domain, hence th >= 0 exactly). Runs inside one K = 2 halo
    * tiling — the blur5 footprint — with zero raster shuffle; emits
    * per-bucket partials (bucket = binary digit count of th + 1, flat
    * cells in bucket 0) with count, th sum and a global-id checksum.
    * The 81 window reads per cell are tile-local array indexing.
    */
  def tophatRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                 ox0: Int, oy0: Int, ow: Int, oh: Int,
                 w: Int, h: Int): Seq[(Long, Long, Long, Long)] = {
    @inline def q(x: Int, y: Int): Long =
      math.floor(vals((y - by0) * bw + (x - bx0)) * Q20).toLong
    val txLo = math.max(ox0, 2); val txHi = math.min(ox0 + ow - 1, w - 3)
    val tyLo = math.max(oy0, 2); val tyHi = math.min(oy0 + oh - 1, h - 3)
    val nB = 64
    val cnt = new Array[Long](nB); val ths = new Array[Long](nB)
    val ids = new Array[Long](nB)
    var ty = tyLo
    while (ty <= tyHi) {
      var tx = txLo
      while (tx <= txHi) {
        var open = Long.MinValue
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            var mn = Long.MaxValue
            var ddy = -1
            while (ddy <= 1) {
              var ddx = -1
              while (ddx <= 1) {
                val v = q(tx + dx + ddx, ty + dy + ddy)
                if (v < mn) mn = v
                ddx += 1
              }
              ddy += 1
            }
            if (mn > open) open = mn
            dx += 1
          }
          dy += 1
        }
        val th = q(tx, ty) - open
        val b = 63 - java.lang.Long.numberOfLeadingZeros(th + 1L)
        cnt(b) += 1
        ths(b) = Math.addExact(ths(b), th)
        ids(b) = Math.addExact(ids(b), ty.toLong * w + tx)
        tx += 1
      }
      ty += 1
    }
    (0 until nB).withFilter(cnt(_) > 0L)
      .map(b => (b.toLong, cnt(b), ths(b), ids(b)))
  }

  /** Local-binary-pattern texture codes over the tile's owned interior:
    * each of the eight non-center window slots compares QUANTIZED
    * (floor(v * 2^20), the shared per-cell quantization) against the
    * quantized center — slot o (the mirrored labeling s(o) = value at
    * (x - (o%3 - 1), y - (o/3 - 1)) shared with every other kernel)
    * contributes bit (o < 4 ? o : o - 1) when q_o > q_center — so every
    * interior cell maps to a texture code in [0, 255]. Emitted as
    * per-code integer partials (code, n, center-q sum): comparisons and
    * sums of already-quantized longs only, so tiled == any other
    * evaluation order bit-for-bit and == the oracle's eight self-joins.
    */
  def lbpCodes(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
               ox0: Int, oy0: Int, ow: Int, oh: Int,
               w: Int, h: Int): Seq[(Long, Long, Long)] = {
    @inline def q(x: Int, y: Int): Long =
      math.floor(vals((y - by0) * bw + (x - bx0)) * Q20).toLong
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val n = new Array[Long](256); val qc = new Array[Long](256)
    var ty = tyLo
    while (ty <= tyHi) {
      var tx = txLo
      while (tx <= txHi) {
        val c = q(tx, ty)
        var code = 0
        var o = 0
        while (o < 9) {
          if (o != 4 && q(tx - (o % 3 - 1), ty - (o / 3 - 1)) > c)
            code |= 1 << (if (o < 4) o else o - 1)
          o += 1
        }
        n(code) += 1L
        qc(code) = Math.addExact(qc(code), c)
        tx += 1
      }
      ty += 1
    }
    (0 until 256).iterator.filter(n(_) > 0L)
      .map(c => (c.toLong, n(c), qc(c))).toSeq
  }

  /** Critical-point census over the tile's owned interior: a cell is a
    * strict local MAXIMUM when all eight quantized neighbours are < its
    * quantized center, a strict local MINIMUM when all are > — compares
    * run on floor(v * 2^20) (the shared per-cell quantization), so
    * plateau ties after quantization disqualify strictness (stated
    * contract, mirrored by the oracle's same quantized compares). Per-row
    * integer partials: (y, n, n_max, n_min, sum of extremal centers'
    * q) — comparisons and Long sums only, tiled == cell order-free.
    */
  def criticalRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                   ox0: Int, oy0: Int, ow: Int, oh: Int,
                   w: Int, h: Int): Seq[(Long, Long, Long, Long, Long)] = {
    @inline def q(x: Int, y: Int): Long =
      math.floor(vals((y - by0) * bw + (x - bx0)) * Q20).toLong
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long, Long)](
      math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var nMax = 0L; var nMin = 0L; var qxSum = 0L
      var tx = txLo
      while (tx <= txHi) {
        val c = q(tx, ty)
        var allBelow = true; var allAbove = true
        var o = 0
        while (o < 9) {
          if (o != 4) {
            val nv = q(tx - (o % 3 - 1), ty - (o / 3 - 1))
            if (nv >= c) allBelow = false
            if (nv <= c) allAbove = false
          }
          o += 1
        }
        n += 1
        if (allBelow) { nMax += 1; qxSum = Math.addExact(qxSum, c) }
        if (allAbove) { nMin += 1; qxSum = Math.addExact(qxSum, c) }
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, nMax, nMin, qxSum))
      ty += 1
    }
    out.toSeq
  }

  /** Binomial 5x5 blur (the integer Gaussian approximation: 1-4-6-4-1
    * separable weights, total mass 256) over the tile's owned DEEP
    * interior (tx in [2, w-3], ty in [2, h-3] — every scored cell has
    * the full 5x5 window inside the 2-sample halo, the K-halo router's
    * window-stencil case beside costCellsK's propagation case). The
    * per-cell quantization runs FIRST (q = floor(v * 2^20)), so the
    * 25-term weighted sum is exact integer arithmetic and agrees with
    * any evaluation order — the kernel computes it directly while the
    * oracle composes the two 1-D passes (rows then columns), putting the
    * separability identity itself under test. The raw weighted sum (mass
    * 256) is reported undivided: dividing would truncate per cell and
    * break separability. |blur| <= 256 * 2^52 needs no headroom care,
    * but addExact backstops loudly like the Laplacian's. Per-row
    * partials (y, n, sum, min, max).
    */
  def binomialRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                   ox0: Int, oy0: Int, ow: Int, oh: Int,
                   w: Int, h: Int): Seq[RowStat] = {
    @inline def q(x: Int, y: Int): Long =
      math.floor(vals((y - by0) * bw + (x - bx0)) * Q20).toLong
    val wt = Array(1L, 4L, 6L, 4L, 1L)
    val txLo = math.max(ox0, 2); val txHi = math.min(ox0 + ow - 1, w - 3)
    val tyLo = math.max(oy0, 2); val tyHi = math.min(oy0 + oh - 1, h - 3)
    val out = new scala.collection.mutable.ArrayBuffer[RowStat](math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var sum = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      var tx = txLo
      while (tx <= txHi) {
        var blur = 0L
        var j = -2
        while (j <= 2) {
          var i = -2
          while (i <= 2) {
            blur = Math.addExact(blur,
              Math.multiplyExact(wt(i + 2) * wt(j + 2), q(tx + i, ty + j)))
            i += 1
          }
          j += 1
        }
        n += 1; sum = Math.addExact(sum, blur)
        if (blur < mn) mn = blur
        if (blur > mx) mx = blur
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, sum, mn, mx))
      ty += 1
    }
    out.toSeq
  }

  /** Saddle-point census over the tile's owned interior — the Morse
    * completion of [[criticalRows]] (maxima and minima are where the
    * gradient vanishes with definite curvature; saddles are where it
    * vanishes with indefinite curvature, the pass points contour
    * topology changes through): walk the eight neighbours in the FIXED
    * CYCLIC ring order N, NE, E, SE, S, SW, W, NW, take the binary mask
    * b_i = (q_i > q_c) on the shared quantized values (ties fall on the
    * <= side — stated contract, mirrored by the oracle's identical
    * strict compares), and count cyclic sign changes; a cell is a saddle
    * when the ring changes sign >= 4 times (two rising and two falling
    * sectors). Comparisons and Long sums only, so tiled == cell order is
    * free. Per-row partials: (y, n, n_saddles, sum of saddle centers' q).
    */
  def saddleRows(vals: Array[Double], bx0: Int, by0: Int, bw: Int,
                 ox0: Int, oy0: Int, ow: Int, oh: Int,
                 w: Int, h: Int): Seq[(Long, Long, Long, Long)] = {
    @inline def q(x: Int, y: Int): Long =
      math.floor(vals((y - by0) * bw + (x - bx0)) * Q20).toLong
    // clockwise ring from North; the cyclic successor of slot 7 is slot 0
    val rdx = Array(0, 1, 1, 1, 0, -1, -1, -1)
    val rdy = Array(-1, -1, 0, 1, 1, 1, 0, -1)
    val txLo = math.max(ox0, 1); val txHi = math.min(ox0 + ow - 1, w - 2)
    val tyLo = math.max(oy0, 1); val tyHi = math.min(oy0 + oh - 1, h - 2)
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)](
      math.max(tyHi - tyLo + 1, 0))
    var ty = tyLo
    while (ty <= tyHi) {
      var n = 0L; var nSad = 0L; var qsSum = 0L
      var tx = txLo
      while (tx <= txHi) {
        val c = q(tx, ty)
        var changes = 0
        var prev = q(tx + rdx(7), ty + rdy(7)) > c
        var i = 0
        while (i < 8) {
          val cur = q(tx + rdx(i), ty + rdy(i)) > c
          if (cur != prev) changes += 1
          prev = cur
          i += 1
        }
        n += 1
        if (changes >= 4) { nSad += 1; qsSum = Math.addExact(qsSum, c) }
        tx += 1
      }
      if (n > 0) out += ((ty.toLong, n, nSad, qsSum))
      ty += 1
    }
    out.toSeq
  }

  def hilbertIndex(bits: Int, x0: Int, y0: Int): Long = {
    require(bits >= 1 && bits <= 31, s"hilbertIndex: bits = $bits out of [1, 31]")
    val n = 1 << bits
    require(x0 >= 0 && x0 < n && y0 >= 0 && y0 < n,
      s"hilbertIndex: ($x0, $y0) outside the 2^$bits grid")
    var x = x0; var y = y0; var d = 0L
    var s = n >>> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>>= 1
    }
    d
  }
}

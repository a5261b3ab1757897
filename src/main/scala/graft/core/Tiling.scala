package graft.core

import scala.collection.mutable.ArrayBuffer

/** Tiling of the global sample grid for distributed execution.
  *
  * A tile owns samples [sx0, sx0+tw) x [sy0, sy0+th) and the cells anchored
  * at those samples; the leftmost/topmost tiles additionally own the virtual
  * border cells (x = -1 / y = -1). Tiles store a halo of +1 sample column on
  * the right and +1 row on the bottom (clipped at the grid edge) — exactly
  * what the cell sweep (samples x+1, y+1) and linear smoothing of border
  * vertices need; left/top halos are provably never read.
  */
object Tiling {

  final case class TileSpec(tileX: Int, tileY: Int,
                            sx0: Int, sy0: Int, tw: Int, th: Int,
                            vx0: Int, vy0: Int, vw: Int, vh: Int,
                            cx0: Int, cx1: Int, cy0: Int, cy1: Int)

  def tileSpec(gdx: Int, gdy: Int, tileW: Int, tileH: Int,
               tileX: Int, tileY: Int): TileSpec = {
    val sx0 = tileX * tileW
    val sy0 = tileY * tileH
    val tw = math.min(tileW, gdx - sx0)
    val th = math.min(tileH, gdy - sy0)
    val vw = math.min(tw + 1, gdx - sx0)
    val vh = math.min(th + 1, gdy - sy0)
    TileSpec(tileX, tileY, sx0, sy0, tw, th,
      sx0, sy0, vw, vh,
      if (sx0 == 0) -1 else sx0, sx0 + tw - 1,
      if (sy0 == 0) -1 else sy0, sy0 + th - 1)
  }

  def tileSpecs(gdx: Int, gdy: Int, tileW: Int, tileH: Int): Seq[TileSpec] = {
    val nx = (gdx + tileW - 1) / tileW
    val ny = (gdy + tileH - 1) / tileH
    for (ty <- 0 until ny; tx <- 0 until nx) yield tileSpec(gdx, gdy, tileW, tileH, tx, ty)
  }

  /** Extract the halo'd sub-array of a full row-major grid for a tile. */
  def extract(values: Array[Double], gdx: Int, s: TileSpec): Array[Double] = {
    val out = new Array[Double](s.vw * s.vh)
    var r = 0
    while (r < s.vh) {
      System.arraycopy(values, (s.vy0 + r) * gdx + s.vx0, out, r * s.vw, s.vw)
      r += 1
    }
    out
  }

  /** Run the per-tile kernel: sweep the tile's cell range, smooth if
    * configured (pre-affine, reference order), return closed rings + open
    * boundary fragments. This is the task-level unit of the distributed
    * pipeline.
    */
  def tileKernel(vals: Array[Double], s: TileSpec, gdx: Int, gdy: Int,
                 threshold: Double, smooth: Boolean): KernelOut = {
    val out = MarchingSquares.sweep(vals, s.vw, s.vh, s.vx0, s.vy0,
      gdx, gdy, s.cx0, s.cx1, s.cy0, s.cy1, threshold)
    if (smooth) {
      out.rings.foreach(r => Smoother.smoothInPlace(r.pts, vals, s.vw, s.vx0, s.vy0, gdx, gdy, threshold))
      out.frags.foreach(f => Smoother.smoothInPlace(f.pts, vals, s.vw, s.vx0, s.vy0, gdx, gdy, threshold))
    }
    out
  }

  /** All thresholds in one pass over the tile (see sweepMulti); outputs are
    * byte-identical to running tileKernel per threshold.
    */
  def tileKernelMulti(vals: Array[Double], s: TileSpec, gdx: Int, gdy: Int,
                      thresholds: Array[Double], smooth: Boolean): Array[KernelOut] = {
    val outs = MarchingSquares.sweepMulti(vals, s.vw, s.vh, s.vx0, s.vy0,
      gdx, gdy, s.cx0, s.cx1, s.cy0, s.cy1, thresholds)
    if (smooth) {
      var ti = 0
      while (ti < outs.length) {
        val t = thresholds(ti)
        outs(ti).rings.foreach(r => Smoother.smoothInPlace(r.pts, vals, s.vw, s.vx0, s.vy0, gdx, gdy, t))
        outs(ti).frags.foreach(f => Smoother.smoothInPlace(f.pts, vals, s.vw, s.vx0, s.vy0, gdx, gdy, t))
        ti += 1
      }
    }
    outs
  }

  /** Single-process reference implementation of the distributed plan:
    * per-tile kernels, then hierarchical 2x2-block fragment merging
    * (O(log tiles) rounds — the shuffle structure of the Spark engine),
    * then global closure-order sort. Produces byte-identical rings to the
    * full-grid sweep; used to validate the plan without Spark.
    */
  def tiledRings(values: Array[Double], gdx: Int, gdy: Int,
                 tileW: Int, tileH: Int, threshold: Double,
                 smooth: Boolean): Seq[Array[Double]] = {
    val rings = new ArrayBuffer[ClosedRing]()
    var open = new ArrayBuffer[(Int, Int, OpenFrag)]() // (bx, by, frag)
    tileSpecs(gdx, gdy, tileW, tileH).foreach { s =>
      val vals = extract(values, gdx, s)
      val out = tileKernel(vals, s, gdx, gdy, threshold, smooth)
      rings ++= out.rings
      out.frags.foreach(f => open += ((s.tileX, s.tileY, f)))
    }
    var level = 0
    val maxTiles = math.max((gdx + tileW - 1) / tileW, (gdy + tileH - 1) / tileH)
    while (open.nonEmpty && level < 40) {
      level += 1
      val next = new ArrayBuffer[(Int, Int, OpenFrag)]()
      open.groupBy { case (bx, by, _) => (bx >> 1, by >> 1) }.toSeq.sortBy(_._1)
        .foreach { case ((nbx, nby), group) =>
          val res = FragmentMerge.merge(group.map(_._3).toSeq)
          rings ++= res.rings
          res.open.foreach(f => next += ((nbx, nby, f)))
        }
      require((1 << level) < 2 * maxTiles || next.isEmpty,
        s"open fragments survived final merge level $level: ${next.length}")
      open = next
    }
    rings.sortInPlaceBy(_.maxKey)
    rings.map(_.pts).toSeq
  }
}

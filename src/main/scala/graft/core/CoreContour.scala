package graft.core

/** Configuration record equivalent to the reference's ContourBuilder
  * (/root/reference/src/contourbuilder.rs:13-51): grid dims, smoothing flag,
  * affine grid placement (origin default 0, step default 1).
  */
final case class ContourConfig(dx: Int, dy: Int, smooth: Boolean,
                               xOrigin: Double = 0.0, yOrigin: Double = 0.0,
                               xStep: Double = 1.0, yStep: Double = 1.0) {
  def isIdentity: Boolean =
    Assembly.isIdentityAffine(xStep, yStep, xOrigin, yOrigin)
}

final case class LineResult(threshold: Double, lines: Seq[Array[Double]])
final case class ContourResult(threshold: Double, polygons: Seq[Poly])
final case class BandResult(minV: Double, maxV: Double, polygons: Seq[Poly])

/** Single-process engine with the full reference API surface: `lines`,
  * `contours`, `isobands`, `contourRings`. This is the semantic spec the
  * distributed pipeline must agree with byte-for-byte; it is also used as the
  * in-memory fast path for grids that fit one task.
  */
final class CoreContour(cfg: ContourConfig) {
  import cfg._

  private def validate(values: Array[Double]): Unit =
    if (values.length != dx * dy)
      throw new IllegalArgumentException(
        s"BadDimension: values.length=${values.length} != dx*dy=${dx * dy}")

  /** Raw rings for one threshold, grid coords, no smoothing/affine
    * (isoringbuilder.rs:50-58).
    */
  def contourRings(values: Array[Double], threshold: Double): Seq[Array[Double]] = {
    validate(values)
    MarchingSquares.sweepFullGrid(values, dx, dy, threshold).map(_.pts).toSeq
  }

  private def ringsFor(values: Array[Double], threshold: Double): Seq[Array[Double]] = {
    val rings = MarchingSquares.sweepFullGrid(values, dx, dy, threshold)
    rings.map { r =>
      val pts = r.pts
      if (smooth) Smoother.smoothInPlace(pts, values, dx, 0, 0, dx, dy, threshold)
      pts
    }.toSeq
  }

  def lines(values: Array[Double], thresholds: Array[Double]): Seq[LineResult] = {
    validate(values)
    thresholds.toSeq.map { t =>
      val rings = ringsFor(values, t)
      if (!isIdentity) rings.foreach(Assembly.applyAffine(_, xStep, yStep, xOrigin, yOrigin))
      LineResult(t, rings)
    }
  }

  def contours(values: Array[Double], thresholds: Array[Double]): Seq[ContourResult] = {
    validate(values)
    thresholds.toSeq.map { t =>
      val rings = ringsFor(values, t)
      if (!isIdentity) rings.foreach(Assembly.applyAffine(_, xStep, yStep, xOrigin, yOrigin))
      ContourResult(t, Assembly.assembleContour(rings))
    }
  }

  def isobands(values: Array[Double], thresholds: Array[Double]): Seq[BandResult] = {
    validate(values)
    if (thresholds.length < 2)
      throw new IllegalArgumentException("Unexpected: isobands needs >= 2 thresholds")
    // per threshold: rings -> smooth -> dedup -> affine -> keep len > 3
    val perThreshold = thresholds.toSeq.map { t =>
      val rings = ringsFor(values, t)
        .map(Assembly.dedupAdjacent)
        .map { r =>
          if (!isIdentity) Assembly.applyAffine(r, xStep, yStep, xOrigin, yOrigin)
          r
        }
        .filter(_.length / 2 > 3)
      (rings, t)
    }
    perThreshold.sliding(2).map { pair =>
      val (lower, minV) = pair(0)
      val (upper, maxV) = pair(1)
      BandResult(minV, maxV, Assembly.assembleBand(lower ++ upper))
    }.toSeq
  }
}

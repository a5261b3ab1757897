package graft.core

/** Planar geometry kernels with semantics (formulas, summation order, epsilon)
  * matching the reference so results are bit-identical f64:
  * /root/reference/src/area.rs.
  *
  * Rings are packed coordinate arrays [x0, y0, x1, y1, ...]; closed rings
  * repeat the first vertex at the end.
  */
object Geom {
  /** f64 machine epsilon, == Rust's f64::EPSILON (area.rs:60,71). */
  final val Epsilon: Double = 2.220446049250313e-16

  /** Doubled shoelace signed area (no /2) with the reference's exact
    * summation order: wraparound term first, then i = 1..n
    * (area.rs:7-18). Positive = winds around a >=threshold region
    * (y grows downward).
    */
  def area2(ring: Array[Double]): Double = {
    val n = ring.length / 2
    var area = ring(2 * (n - 1) + 1) * ring(0) - ring(2 * (n - 1)) * ring(1)
    var i = 1
    while (i < n) {
      area += ring(2 * (i - 1) + 1) * ring(2 * i) - ring(2 * (i - 1)) * ring(2 * i + 1)
      i += 1
    }
    area
  }

  /** Walks `hole` vertices, returns the first non-zero ringContains verdict:
    * 1 = a vertex strictly inside `ring`, -1 = strictly outside,
    * 0 = every tested vertex lies ON the boundary (area.rs:20-32).
    */
  def contains(ring: Array[Double], hole: Array[Double]): Int = {
    val n = hole.length / 2
    var i = 0
    while (i < n) {
      val c = ringContains(ring, hole(2 * i), hole(2 * i + 1))
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Even-odd ray casting; returns 0 immediately if the point lies on any
    * segment, else +1 inside / -1 outside (area.rs:34-56).
    */
  def ringContains(ring: Array[Double], x: Double, y: Double): Int = {
    val n = ring.length / 2
    var result = -1
    var j = n - 1
    var i = 0
    while (i < n) {
      val xi = ring(2 * i)
      val yi = ring(2 * i + 1)
      val xj = ring(2 * j)
      val yj = ring(2 * j + 1)
      if (segmentContains(xi, yi, xj, yj, x, y)) return 0
      if (((yi > y) != (yj > y)) && (x < (xj - xi) * (y - yi) / (yj - yi) + xi)) {
        result = -result
      }
      j = i
      i += 1
    }
    result
  }

  /** On-segment test: collinearity by cross-product < EPSILON, then 1-D
    * betweenness on the dominant axis (area.rs:58-76).
    */
  def segmentContains(ax: Double, ay: Double, bx: Double, by: Double,
                      cx: Double, cy: Double): Boolean = {
    if (collinear(ax, ay, bx, by, cx, cy)) {
      if (math.abs(ax - bx) < Epsilon) within(ay, cy, by)
      else within(ax, cx, bx)
    } else false
  }

  @inline private def collinear(ax: Double, ay: Double, bx: Double, by: Double,
                                cx: Double, cy: Double): Boolean =
    math.abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay)) < Epsilon

  @inline private def within(p: Double, q: Double, r: Double): Boolean =
    (p <= q && q <= r) || (r <= q && q <= p)

  /** Bounding box [minX, minY, maxX, maxY] of a packed ring. */
  def bbox(ring: Array[Double]): Array[Double] = {
    var minX = Double.PositiveInfinity; var minY = Double.PositiveInfinity
    var maxX = Double.NegativeInfinity; var maxY = Double.NegativeInfinity
    var i = 0
    while (i < ring.length) {
      val x = ring(i); val y = ring(i + 1)
      if (x < minX) minX = x
      if (x > maxX) maxX = x
      if (y < minY) minY = y
      if (y > maxY) maxY = y
      i += 2
    }
    Array(minX, minY, maxX, maxY)
  }
}

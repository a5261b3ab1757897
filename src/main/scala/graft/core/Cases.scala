package graft.core

/** The 16-entry marching-squares case table (the d3-contour convention).
  *
  * Case index = b0 | b1<<1 | b2<<2 | b3<<3 where, for the 2x2 sample window
  * anchored at cell (x, y) with y growing downward:
  *   b0 = sample(x,   y+1) >= threshold   (SW)
  *   b1 = sample(x+1, y+1) >= threshold   (SE)
  *   b2 = sample(x+1, y  ) >= threshold   (NE)
  *   b3 = sample(x,   y  ) >= threshold   (NW)
  *
  * Each entry is 0..2 directed segments, packed as (sx, sy, ex, ey) offsets
  * relative to (x, y); offsets take values in {0.5, 1.0, 1.5} so all ring
  * vertices are multiples of 0.5 before smoothing. Saddle cases 5 and 10 use
  * the fixed d3 disambiguation (no center-average test).
  *
  * Semantics per reference: /root/reference/src/isoringbuilder.rs:7-31.
  */
object Cases {
  /** table(i) = packed segment offsets (sx, sy, ex, ey) * nSegments. */
  val table: Array[Array[Double]] = Array(
    Array.empty, // 0
    Array(1.0, 1.5, 0.5, 1.0), // 1
    Array(1.5, 1.0, 1.0, 1.5), // 2
    Array(1.5, 1.0, 0.5, 1.0), // 3
    Array(1.0, 0.5, 1.5, 1.0), // 4
    Array(1.0, 1.5, 0.5, 1.0, 1.0, 0.5, 1.5, 1.0), // 5 (saddle)
    Array(1.0, 0.5, 1.0, 1.5), // 6
    Array(1.0, 0.5, 0.5, 1.0), // 7
    Array(0.5, 1.0, 1.0, 0.5), // 8
    Array(1.0, 1.5, 1.0, 0.5), // 9
    Array(0.5, 1.0, 1.0, 0.5, 1.5, 1.0, 1.0, 1.5), // 10 (saddle)
    Array(1.5, 1.0, 1.0, 0.5), // 11
    Array(0.5, 1.0, 1.5, 1.0), // 12
    Array(1.0, 1.5, 1.5, 1.0), // 13
    Array(0.5, 1.0, 1.0, 1.5), // 14
    Array.empty // 15
  )

  /** Same table with offsets doubled to exact ints (1, 2, 3) — used to derive
    * collision-free integer vertex keys without float hashing.
    */
  val tableX2: Array[Array[Int]] =
    table.map(_.map(d => (d * 2.0).toInt))

  /** Number of segments a given case emits (0, 1 or 2). */
  val segCount: Array[Int] = table.map(_.length / 4)
}

package graft.core

/** Y-bucketed segment index over one packed ring, answering the reference's
  * `ring_contains` with EXACTLY the same result (unconditionally — the
  * outside short-circuit margins are derived per ring from the EPSILON
  * budget of its own segments, see below) but O(candidates) per query
  * instead of O(ring length).
  *
  * Correctness argument: ring_contains is order-independent — the result is
  * 0 if ANY segment contains the point (segment_contains), else the ray-cast
  * parity, which is a XOR over independent per-segment straddle tests. So
  * evaluating only a candidate superset of segments that can possibly
  * (a) straddle the query's y (needs yLo <= y <= yHi) or
  * (b) pass segment_contains (needs y within the segment's y-range plus a
  *     slack of max(1, yMargin): for an x-dominant segment, |cross| <
  *     EPSILON and |bx-ax| >= EPSILON bound the query's y-deviation from
  *     the segment by EPSILON/|bx-ax| <= 1 in real arithmetic, plus the
  *     span-scaled FP rounding term folded into yMargin; y-dominant
  *     segments require y within range exactly)
  * yields bit-identical verdicts. Each segment is stored once (by
  * floor(yLo / bw)); queries scan the bucket range that covers
  * [y - maxSpan - ySlack, y + ySlack], so every candidate is visited
  * exactly once.
  */
final class RingIndex(ring: Array[Double]) {
  private val n = ring.length / 2

  // ONE constructor pass: bbox + degenerate-segment lines + the EXACT
  // outside-claim margins (see the short-circuit note below):
  //  - a segment with |dx| >= EPSILON (x-dominant branch) can claim a point
  //    whose y lies up to EPSILON/|dx| outside its y-span (and only with x
  //    inside the x-span) -> yMargin = max over segments of that bound;
  //  - a near-vertical segment (|dx| < EPSILON, vertical branch) requires y
  //    inside its exact y-span and can claim x up to EPSILON/|dy| off its
  //    line -> xMargin = max over segments; if such a segment is
  //    also sub-EPSILON flat (dy == 0) it claims its whole horizontal line
  //    exactly like a fully-degenerate segment -> collected into degYs.
  // The EPSILON/|d| bounds are real-arithmetic; the FP evaluation of the
  // cross product in Geom.collinear additionally carries rounding error
  // up to ~2*EPSILON*(|dx*(cy-ay)| + |(cx-ax)*dy|), i.e. proportional to
  // the SEGMENT SPAN for rings in arbitrary coordinate frames (post-affine
  // spans can exceed 1, unlike grid space). Each margin therefore adds
  // 8*EPSILON*max(1, dx+dy) — a generous over-bound of that term (the
  // deviation D solves D <= EPSILON/d + 2*EPSILON*(D + span), so the
  // scaled absolute term dominates) — keeping the short circuit EXACT in
  // ANY frame, not just grid space.
  private val (minY, bmaxY, bminX, bmaxX, degYs, xMargin, yMargin) = {
    var mnY = Double.PositiveInfinity; var mxY = Double.NegativeInfinity
    var mnX = Double.PositiveInfinity; var mxX = Double.NegativeInfinity
    var xm = 0.0; var ym = 0.0
    val dg = new scala.collection.mutable.ArrayBuffer[Double](2)
    var j = n - 1
    var i = 0
    while (i < n) {
      val x = ring(2 * i); val y = ring(2 * i + 1)
      if (y < mnY) mnY = y
      if (y > mxY) mxY = y
      if (x < mnX) mnX = x
      if (x > mxX) mxX = x
      val dx = math.abs(x - ring(2 * j))
      val dy = math.abs(y - ring(2 * j + 1))
      val fpSlack = 8.0 * Geom.Epsilon * math.max(1.0, dx + dy)
      if (dx < Geom.Epsilon) {
        if (dy == 0.0) dg += y // degenerate: claims the whole line y == ay
        else {
          val m = Geom.Epsilon / dy + fpSlack
          if (m > xm) xm = m
        }
      } else {
        val m = Geom.Epsilon / dx + fpSlack
        if (m > ym) ym = m
      }
      j = i
      i += 1
    }
    (mnY, mxY, mnX, mxX, dg.toArray, xm, ym)
  }
  // maxSpan and the CSR buckets below are LAZY: most containment queries in
  // the assembly's O(n^2) loops are answered by the constant-time
  // outside-bbox short circuit, so the bucket build (an O(ring) pass +
  // arrays) only happens for rings that actually receive an in-bbox query
  private lazy val maxSpan = {
    var s = 0.0
    var j = n - 1
    var i = 0
    while (i < n) {
      val d = math.abs(ring(2 * i + 1) - ring(2 * j + 1))
      if (d > s) s = d
      j = i
      i += 1
    }
    s
  }
  private lazy val bw = math.max(maxSpan, 1.0) // bucket width >= max segment y-span
  private lazy val nBuckets =
    math.max(1, (((bmaxY - minY) / bw).toInt + 2))
  // Outside-point short circuit semantics (EXACT in any coordinate frame —
  // the margins above include the FP product-rounding term): a point
  // outside the bbox straddles no countable segment — for y outside the
  // ring's y-range no segment straddles at all; for x < bminX every
  // straddling segment counts (total crossings of a closed curve by a full
  // horizontal line = even -> parity -1) and for x > bmaxX none does (the
  // ray intersection never exceeds bmaxX) — so the verdict is 0 iff some
  // segment CLAIMS the point, else -1. Claims beyond the bbox are bounded
  // by the per-ring margins computed above: beyond xMargin in x or yMargin
  // in y no non-degenerate segment can pass segment_contains (the FP
  // cross-product magnitude would exceed EPSILON even after worst-case
  // rounding), leaving only the degenerate y-lines in degYs. Points inside
  // the margins take the exact bucket walk below, which is correct for ANY
  // query point: the scanned yLo range [y - maxSpan - ySlack, y + ySlack]
  // covers every segment that can straddle or claim y, ySlack =
  // max(1, yMargin) being the largest possible y-claim deviation
  // (EPSILON/|dx| <= 1 whenever |dx| >= EPSILON, plus the rounding term
  // already folded into yMargin).
  private lazy val ySlack = math.max(1.0, yMargin)

  // CSR layout: bucketStart(b) .. bucketStart(b+1) indices into segIdx
  private lazy val (bucketStart, segIdx) = {
    val counts = new Array[Int](nBuckets + 1)
    @inline def bucketOf(i: Int): Int = {
      val j = if (i == 0) n - 1 else i - 1
      val yLo = math.min(ring(2 * i + 1), ring(2 * j + 1))
      math.min(nBuckets - 1, math.max(0, ((yLo - minY) / bw).toInt))
    }
    var i = 0
    while (i < n) { counts(bucketOf(i) + 1) += 1; i += 1 }
    var b = 0
    while (b < nBuckets) { counts(b + 1) += counts(b); b += 1 }
    val idx = new Array[Int](n)
    val fill = new Array[Int](nBuckets)
    i = 0
    while (i < n) {
      val bb = bucketOf(i)
      idx(counts(bb) + fill(bb)) = i
      fill(bb) += 1
      i += 1
    }
    (counts, idx)
  }

  /** Exact ring_contains(ring, (x, y)) — see Geom.ringContains. */
  def contains(x: Double, y: Double): Int = {
    if (x < bminX - xMargin || x > bmaxX + xMargin ||
        y < minY - yMargin || y > bmaxY + yMargin) {
      var k = 0
      while (k < degYs.length) { if (degYs(k) == y) return 0; k += 1 }
      return -1
    }
    // candidate buckets: yLo in [y - maxSpan - ySlack, y + ySlack]
    var b0 = ((y - maxSpan - ySlack - minY) / bw).toInt - 1
    var b1 = ((y + ySlack - minY) / bw).toInt + 1
    if (b0 < 0) b0 = 0
    if (b1 >= nBuckets) b1 = nBuckets - 1
    var result = -1
    var b = b0
    while (b <= b1) {
      var k = bucketStart(b)
      val end = bucketStart(b + 1)
      while (k < end) {
        val i = segIdx(k)
        val j = if (i == 0) n - 1 else i - 1
        val xi = ring(2 * i); val yi = ring(2 * i + 1)
        val xj = ring(2 * j); val yj = ring(2 * j + 1)
        if (Geom.segmentContains(xi, yi, xj, yj, x, y)) return 0
        if (((yi > y) != (yj > y)) && (x < (xj - xi) * (y - yi) / (yj - yi) + xi)) {
          result = -result
        }
        k += 1
      }
      b += 1
    }
    result
  }

  /** Exact contains(ring, hole): first non-zero verdict walking hole's
    * vertices in order (see Geom.contains).
    */
  def containsRing(hole: Array[Double]): Int = {
    val m = hole.length / 2
    var i = 0
    while (i < m) {
      val c = contains(hole(2 * i), hole(2 * i + 1))
      if (c != 0) return c
      i += 1
    }
    0
  }
}

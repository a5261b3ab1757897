package graft.core

/** Y-bucketed segment index over one packed ring, answering the reference's
  * `ring_contains` with EXACTLY the same result but O(candidates) per query
  * instead of O(ring length). (Exactness assumes no sub-EPSILON-tall
  * near-vertical segment with distinct endpoints exists — impossible at the
  * half-integer/interpolant coordinate resolution the engine emits; see the
  * short-circuit note below. All other cases are covered unconditionally.)
  *
  * Correctness argument: ring_contains is order-independent — the result is
  * 0 if ANY segment contains the point (segment_contains), else the ray-cast
  * parity, which is a XOR over independent per-segment straddle tests. So
  * evaluating only a candidate superset of segments that can possibly
  * (a) straddle the query's y (needs yLo <= y <= yHi) or
  * (b) pass segment_contains (needs y within the segment's y-range plus an
  *     absolute slack of 1.0: for an x-dominant segment, |cross| < EPSILON
  *     and |bx-ax| >= EPSILON bound the query's y-deviation from the segment
  *     by EPSILON/|bx-ax| <= 1; y-dominant segments require y within range
  *     exactly)
  * yields bit-identical verdicts. Each segment is stored once (by
  * floor(yLo / bw)); queries scan the bucket range that covers
  * [y - maxSpan - 1, y + 1], so every candidate is visited exactly once.
  */
final class RingIndex(ring: Array[Double]) {
  private val n = ring.length / 2

  // ONE constructor pass: bbox + degenerate-segment lines (see below)
  private val (minY, bmaxY, bminX, bmaxX, degYs) = {
    var mnY = Double.PositiveInfinity; var mxY = Double.NegativeInfinity
    var mnX = Double.PositiveInfinity; var mxX = Double.NegativeInfinity
    val dg = new scala.collection.mutable.ArrayBuffer[Double](2)
    var j = n - 1
    var i = 0
    while (i < n) {
      val x = ring(2 * i); val y = ring(2 * i + 1)
      if (y < mnY) mnY = y
      if (y > mxY) mxY = y
      if (x < mnX) mnX = x
      if (x > mxX) mxX = x
      if (x == ring(2 * j) && y == ring(2 * j + 1)) dg += y
      j = i
      i += 1
    }
    (mnY, mxY, mnX, mxX, dg.toArray)
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
  // Outside-point short circuit semantics: a point at least 1.0 outside
  // the bbox straddles no segment (ray parity stays even -> -1; crossings
  // need y strictly inside the ring's y-range, and for x > bmaxX the ray
  // intersection x never exceeds bmaxX). segment_contains claims on such a
  // point are bounded by the EPSILON budget: an x-dominant segment
  // (|bx-ax| >= EPSILON) tolerates |cy - ay| <= EPSILON/|bx-ax| +
  // |by-ay| <= 1 + y-span, so the 1.0 margin covers it (and symmetrically
  // for x); a near-vertical segment (|bx-ax| < EPSILON) requires cy
  // within its exact y-span and, >= 1.0 outside in x, a height below
  // ~EPSILON — i.e. only a segment whose endpoints are EXACTLY equal (the
  // closing duplicate's wrap segment, adjacent duplicate vertices), whose
  // y-lines are degYs, or a sub-EPSILON-tall near-vertical sliver, which
  // is below the coordinate grid's representable resolution (vertices are
  // half-integers or single-division interpolants; adjacent dedup removes
  // exact duplicates). Points within the 1.0 margin take the exact bucket
  // walk below, which is correct for ANY query point: the scanned yLo
  // range [y - maxSpan - 1, y + 1] covers every segment that can straddle
  // or claim y under the same EPSILON budget.

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
    if (x < bminX - 1.0 || x > bmaxX + 1.0 || y < minY - 1.0 || y > bmaxY + 1.0) {
      var k = 0
      while (k < degYs.length) { if (degYs(k) == y) return 0; k += 1 }
      return -1
    }
    // candidate buckets: yLo in [y - maxSpan - 1, y + 1]
    var b0 = ((y - maxSpan - 1.0 - minY) / bw).toInt - 1
    var b1 = ((y + 1.0 - minY) / bw).toInt + 1
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

package graft.core

/** Douglas–Peucker polyline/ring simplification — the full recursive
  * algorithm (complementing SpatialOps.simplifyStats' one-pass
  * Visvalingam filter, which is the embarrassingly-parallel variant).
  * Executed per ring inside a row map: rings are perimeter-bounded, so
  * the working set is bounded by the ring length — the distribution unit
  * is the ring, never the vertex.
  *
  * Deterministic by construction: the split vertex is the FARTHEST from
  * the current chord, ties broken by smallest index; closed rings anchor
  * at vertex 0 and the farthest vertex from it (same tie-break), then
  * simplify the two open chains. All comparisons are on squared f64
  * distances — no sqrt, no tolerance ulp games.
  *
  * Boxing-free hot path (the rings this targets can carry millions of
  * vertices): the DFS work stack and the kept-index buffer are primitive
  * Int arrays grown by doubling — no cons cells, no boxed Integers.
  */
object Simplify {

  /** Squared perpendicular distance from p to segment (a, b); falls back
    * to point distance when a == b.
    */
  private def distSq(ax: Double, ay: Double, bx: Double, by: Double,
                     px: Double, py: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val l2 = dx * dx + dy * dy
    if (l2 == 0.0) {
      val ex = px - ax; val ey = py - ay
      ex * ex + ey * ey
    } else {
      val t = ((px - ax) * dx + (py - ay) * dy) / l2
      val tc = if (t < 0.0) 0.0 else if (t > 1.0) 1.0 else t
      val ex = px - (ax + tc * dx); val ey = py - (ay + tc * dy)
      ex * ex + ey * ey
    }
  }

  /** Growable primitive int buffer (DoubleBuf's idiom). */
  private final class IntBuf(initialCap: Int) {
    var arr = new Array[Int](math.max(8, initialCap))
    var len = 0
    @inline def push(v: Int): Unit = {
      if (len == arr.length) {
        val na = new Array[Int](arr.length * 2)
        System.arraycopy(arr, 0, na, 0, len)
        arr = na
      }
      arr(len) = v; len += 1
    }
  }

  /** Simplify the OPEN chain ring[i0..i1] (interleaved xy, vertex
    * indices); appends kept INTERIOR vertex indices to `keep` (endpoints
    * are the caller's). Explicit primitive-int stack, not call recursion:
    * worst-case split depth is O(chain length) (e.g. a spiral whose
    * farthest point is always adjacent to an endpoint), which would
    * overflow the JVM stack on the multi-million-vertex perimeter rings a
    * 100 TB raster can produce. In-order emission is preserved by pushing
    * right-half, emit-marker (encoded as the pair (-v, -v)), then
    * left-half (LIFO): the left subchain fully resolves before its split
    * vertex, which precedes the right subchain.
    */
  private def dpChain(ring: Array[Double], c0: Int, c1: Int, epsSq: Double,
                      keep: IntBuf): Unit = {
    if (c1 - c0 < 2) return
    val stack = new IntBuf(32) // (i0, i1) pairs, top at the end
    stack.push(c0); stack.push(c1)
    while (stack.len > 0) {
      val i1 = stack.arr(stack.len - 1)
      val i0 = stack.arr(stack.len - 2)
      stack.len -= 2
      if (i1 - i0 >= 2) {
        val ax = ring(2 * i0); val ay = ring(2 * i0 + 1)
        val bx = ring(2 * i1); val by = ring(2 * i1 + 1)
        var best = -1
        var bestD = epsSq
        var i = i0 + 1
        while (i < i1) {
          val d = distSq(ax, ay, bx, by, ring(2 * i), ring(2 * i + 1))
          if (d > bestD) { bestD = d; best = i } // strict: ties keep smallest index
          i += 1
        }
        if (best >= 0) {
          // LIFO: left chain runs first, then the marker, then the right
          stack.push(best); stack.push(i1)
          stack.push(-best); stack.push(-best)
          stack.push(i0); stack.push(best)
        }
      } else if (i0 < 0 && i0 == i1) {
        keep.push(-i0) // emit marker: the split vertex, in order
      }
    }
  }

  /** Simplify a CLOSED ring (interleaved xy, first point repeated at the
    * end). Returns a closed ring over a subset of the input vertices, in
    * input order, anchored at vertex 0 and the vertex farthest from it.
    * Rings that simplify below 3 distinct vertices return the
    * degenerate anchor pair (caller decides whether to drop them).
    */
  def ring(r: Array[Double], eps: Double): Array[Double] = {
    val n = r.length / 2 - 1 // distinct vertices
    if (n < 3) return r.clone()
    val epsSq = eps * eps
    // anchor 1: vertex 0; anchor 2: farthest vertex from it (ties: smallest)
    var far = 1
    var farD = -1.0
    var i = 1
    while (i < n) {
      val dx = r(2 * i) - r(0); val dy = r(2 * i + 1) - r(1)
      val d = dx * dx + dy * dy
      if (d > farD) { farD = d; far = i }
      i += 1
    }
    val keep = new IntBuf(32)
    keep.push(0)
    dpChain(r, 0, far, epsSq, keep)
    keep.push(far)
    // second chain wraps: far .. n (where index n IS vertex 0, the closing
    // duplicate) — operate on the closed array directly
    dpChain(r, far, n, epsSq, keep)
    val out = new Array[Double](2 * keep.len + 2)
    var j = 0
    while (j < keep.len) {
      val k = keep.arr(j)
      out(2 * j) = r(2 * k); out(2 * j + 1) = r(2 * k + 1)
      j += 1
    }
    out(2 * j) = r(0); out(2 * j + 1) = r(1) // re-close
    out
  }
}

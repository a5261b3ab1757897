package graft.core

import scala.collection.mutable.ArrayBuffer

/** Cross-tile merge of open ring fragments — the same endpoint hash-join as
  * the in-tile stitcher, lifted from segments to whole fragments. Junction
  * vertices are present in BOTH adjoining fragments (each tile emits the
  * smoothed border vertex, bit-identically, from its halo), so concatenation
  * drops the duplicated head vertex of the appended fragment.
  *
  * The result set (closed rings + still-open fragments) is independent of
  * arrival order because each vertex key has globally unique in/out segments;
  * inputs are still sorted by maxKey for determinism.
  *
  * When a ring closes, it is rotated so it starts at the end vertex of its
  * globally maximal sweep-key segment — exactly where the reference's
  * single-threaded stitcher would have started it (see Stitcher's contract).
  */
object FragmentMerge {

  private final class MFrag(var startKey: Long, var endKey: Long,
                            var pts: DoubleBuf,
                            var maxKey: Long, var anchorPos: Int) {
    @inline def nPts: Int = pts.nPts
  }

  final class Result(val rings: ArrayBuffer[ClosedRing],
                     val open: ArrayBuffer[OpenFrag])

  /** Rotate a closed packed ring [v0..vn-1, v0] so it starts (and ends) at
    * vertex index `anchorPos` (mod n).
    */
  def rotateClosed(pts: Array[Double], anchorPos: Int): Array[Double] = {
    val n = pts.length / 2 - 1 // distinct vertices
    val a = ((anchorPos % n) + n) % n
    if (a == 0) return pts
    val out = new Array[Double](pts.length)
    // vertices a..n-1, then 0..a (inclusive -> closes at a)
    System.arraycopy(pts, 2 * a, out, 0, 2 * (n - a))
    System.arraycopy(pts, 0, out, 2 * (n - a), 2 * (a + 1))
    out
  }

  def merge(frags: Seq[OpenFrag]): Result = {
    // primitive open-addressing endpoint maps, same as Stitcher's: boxed
    // HashMap keys (junction vertex keys sit far outside the Long cache)
    // were measurable allocation traffic in merge-heavy rounds
    val byStart = new LongObjMap[MFrag]()
    val byEnd = new LongObjMap[MFrag]()
    val rings = new ArrayBuffer[ClosedRing]()

    val sorted = frags.sortBy(f => (f.maxKey, f.startKey))
    sorted.foreach { in =>
      val sk = in.startKey
      val ek = in.endKey
      val f = byEnd.get(sk)
      if (f != null) {
        val g = byStart.get(ek)
        if (g != null) {
          byEnd.remove(sk)
          byStart.remove(ek)
          if (f eq g) {
            // closure: f runs ek -> ... -> sk; append in (dropping its head,
            // which duplicates f's tail vertex). Result first == last.
            val base = f.nPts
            f.pts.appendArray(in.pts, 2)
            val (mk, ap) =
              if (in.maxKey > f.maxKey) (in.maxKey, base - 1 + in.anchorPos)
              else (f.maxKey, f.anchorPos)
            rings += ClosedRing(rotateClosed(f.pts.toArray, ap), mk)
          } else {
            byStart.remove(g.startKey) // stale; g merges into f
            val base = f.nPts
            f.pts.appendArray(in.pts, 2)
            val baseG = f.nPts
            f.pts.appendFrom(g.pts, 2)
            if (in.maxKey > f.maxKey) { f.maxKey = in.maxKey; f.anchorPos = base - 1 + in.anchorPos }
            if (g.maxKey > f.maxKey) { f.maxKey = g.maxKey; f.anchorPos = baseG - 1 + g.anchorPos }
            f.endKey = g.endKey
            byEnd.put(f.endKey, f)
          }
        } else {
          byEnd.remove(sk)
          val base = f.nPts
          f.pts.appendArray(in.pts, 2)
          if (in.maxKey > f.maxKey) { f.maxKey = in.maxKey; f.anchorPos = base - 1 + in.anchorPos }
          f.endKey = ek
          byEnd.put(ek, f)
        }
      } else {
        val h = byStart.get(ek)
        if (h != null) {
          // prepend: in runs sk -> ek == h.start
          byStart.remove(ek)
          val np = new DoubleBuf(in.pts.length + h.pts.len - 2)
          np.appendArray(in.pts, 0)
          np.appendFrom(h.pts, 2)
          val inN = in.pts.length / 2
          if (h.maxKey > in.maxKey) {
            h.anchorPos = inN - 1 + h.anchorPos
          } else {
            h.anchorPos = in.anchorPos
            h.maxKey = in.maxKey
          }
          h.pts = np
          h.startKey = sk
          byStart.put(sk, h)
        } else {
          val nf = new MFrag(sk, ek, new DoubleBuf(in.pts.length), in.maxKey, in.anchorPos)
          nf.pts.appendArray(in.pts, 0)
          byStart.put(sk, nf)
          byEnd.put(ek, nf)
        }
      }
    }

    val open = new ArrayBuffer[OpenFrag](byStart.size)
    // slot-order iteration: fine, because maxKey is unique per fragment
    // within one (grid, threshold) merge, so the sort below fully orders
    byStart.foreachValue { f =>
      open += OpenFrag(f.pts.toArray, f.startKey, f.endKey, f.maxKey, f.anchorPos)
    }
    open.sortInPlaceBy(_.maxKey)
    rings.sortInPlaceBy(_.maxKey)
    new Result(rings, open)
  }
}

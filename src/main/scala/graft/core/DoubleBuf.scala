package graft.core

/** Growable primitive double buffer for packed (x, y) point lists — avoids
  * the boxing of scala ArrayBuffer[Double] in the stitching hot path.
  * Prepend is O(n) (an array shift), mirroring the reference's
  * Vec::insert(0) cost profile.
  */
final class DoubleBuf(initialCap: Int) {
  private var arr = new Array[Double](math.max(4, initialCap))
  private var len0 = 0

  @inline def len: Int = len0
  @inline def nPts: Int = len0 / 2
  @inline def apply(i: Int): Double = arr(i)

  private def ensure(n: Int): Unit = {
    if (n > arr.length) {
      var cap = arr.length * 2
      while (cap < n) cap *= 2
      val na = new Array[Double](cap)
      System.arraycopy(arr, 0, na, 0, len0)
      arr = na
    }
  }

  def addPt(x: Double, y: Double): Unit = {
    ensure(len0 + 2)
    arr(len0) = x
    arr(len0 + 1) = y
    len0 += 2
  }

  def prependPt(x: Double, y: Double): Unit = {
    ensure(len0 + 2)
    System.arraycopy(arr, 0, arr, 2, len0)
    arr(0) = x
    arr(1) = y
    len0 += 2
  }

  /** Append o's doubles starting at double-index `from`. */
  def appendFrom(o: DoubleBuf, from: Int): Unit = {
    val n = o.len0 - from
    ensure(len0 + n)
    System.arraycopy(o.arr, from, arr, len0, n)
    len0 += n
  }

  def appendArray(o: Array[Double], from: Int): Unit = {
    val n = o.length - from
    ensure(len0 + n)
    System.arraycopy(o, from, arr, len0, n)
    len0 += n
  }

  def toArray: Array[Double] = java.util.Arrays.copyOf(arr, len0)

  /** toArray with one extra point appended (for ring closure). */
  def toArrayPlus(x: Double, y: Double): Array[Double] = {
    val out = java.util.Arrays.copyOf(arr, len0 + 2)
    out(len0) = x
    out(len0 + 1) = y
    out
  }
}

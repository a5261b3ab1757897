package graft.core

/** Minimal primitive-keyed open-addressing hash map (Long -> V, V non-null),
  * built for the stitcher's endpoint tables: get/put/remove on every
  * marching-squares segment were previously java.util.HashMap calls that
  * boxed each key (grid vertex keys are far outside the Long cache) and
  * showed as a top CPU frame in executor profiles. Linear probing,
  * power-of-two capacity, load factor 1/2, and Knuth's backward-shift
  * deletion (TAOCP 6.4 Algorithm R) — no tombstones, so probe chains never
  * degrade under the stitcher's heavy remove traffic.
  */
final class LongObjMap[V <: AnyRef](initialCapacity: Int = 16) {
  private var cap = {
    var c = 16
    while (c < initialCapacity) c <<= 1
    c
  }
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[AnyRef](cap) // null marks an empty slot
  private var n = 0

  @inline private def idx(k: Long): Int = {
    var h = k * -0x61c8864680b583ebL // fibonacci hashing; keys are structured
    h ^= h >>> 32
    (h & mask).toInt
  }

  def size: Int = n
  def isEmpty: Boolean = n == 0

  def get(k: Long): V = {
    var i = idx(k)
    while (vals(i) ne null) {
      if (keys(i) == k) return vals(i).asInstanceOf[V]
      i = (i + 1) & mask
    }
    null.asInstanceOf[V]
  }

  def put(k: Long, v: V): Unit = {
    var i = idx(k)
    while (vals(i) ne null) {
      if (keys(i) == k) { vals(i) = v; return }
      i = (i + 1) & mask
    }
    keys(i) = k
    vals(i) = v
    n += 1
    if (2 * n >= cap) grow()
  }

  def remove(k: Long): Unit = {
    var i = idx(k)
    while (vals(i) ne null) {
      if (keys(i) == k) {
        // backward-shift deletion: pull chain entries whose ideal slot
        // lies cyclically at-or-before the hole
        vals(i) = null
        var j = i
        var loop = true
        while (loop) {
          j = (j + 1) & mask
          if (vals(j) eq null) loop = false
          else {
            val ideal = idx(keys(j))
            val movable =
              if (i <= j) ideal <= i || ideal > j
              else ideal <= i && ideal > j
            if (movable) {
              keys(i) = keys(j)
              vals(i) = vals(j)
              vals(j) = null
              i = j
            }
          }
        }
        n -= 1
        return
      }
      i = (i + 1) & mask
    }
  }

  def foreachValue(f: V => Unit): Unit = {
    var i = 0
    while (i < cap) {
      if (vals(i) ne null) f(vals(i).asInstanceOf[V])
      i += 1
    }
  }

  private def grow(): Unit = {
    val ok = keys
    val ov = vals
    val oc = cap
    cap <<= 1
    mask = cap - 1
    keys = new Array[Long](cap)
    vals = new Array[AnyRef](cap)
    var i = 0
    while (i < oc) {
      if (ov(i) ne null) {
        var j = idx(ok(i))
        while (vals(j) ne null) j = (j + 1) & mask
        keys(j) = ok(i)
        vals(j) = ov(i)
      }
      i += 1
    }
  }
}

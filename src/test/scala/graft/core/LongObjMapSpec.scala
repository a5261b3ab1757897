package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** LongObjMap must behave exactly like java.util.HashMap under heavy
  * interleaved put/get/remove with clustered keys (the stitcher's key
  * distribution: consecutive vertex keys along ring perimeters).
  */
class LongObjMapSpec extends AnyFunSuite {

  test("randomized equivalence with java.util.HashMap") {
    val rnd = new scala.util.Random(0x5717c4e5L)
    for (trial <- 1 to 20) {
      val m = new LongObjMap[java.lang.Long]()
      val ref = new java.util.HashMap[Long, java.lang.Long]()
      // clustered key space mimics vertex keys: a few runs of adjacent longs
      val base = Array.fill(4)(rnd.nextLong() >>> 8)
      def key(): Long = base(rnd.nextInt(base.length)) + rnd.nextInt(256)
      for (op <- 1 to 3000) {
        val k = key()
        rnd.nextInt(3) match {
          case 0 =>
            val v = java.lang.Long.valueOf(rnd.nextLong())
            m.put(k, v); ref.put(k, v)
          case 1 =>
            m.remove(k); ref.remove(k)
          case 2 =>
            assert(m.get(k) == ref.get(k), s"trial $trial op $op get($k)")
        }
        if (op % 500 == 0) {
          assert(m.size == ref.size(), s"trial $trial op $op size")
          val seen = scala.collection.mutable.ArrayBuffer[java.lang.Long]()
          m.foreachValue(seen += _)
          assert(seen.sortBy(_.longValue) ==
            ref.values().toArray(Array.empty[java.lang.Long]).toSeq.sortBy(_.longValue))
        }
      }
      ref.keySet().forEach(k => assert(m.get(k) == ref.get(k)))
    }
  }

  test("grows through many inserts and stays consistent") {
    val m = new LongObjMap[java.lang.Long]()
    val n = 10000
    for (i <- 0 until n) m.put(i.toLong * 2654435761L, java.lang.Long.valueOf(i))
    assert(m.size == n)
    for (i <- 0 until n) assert(m.get(i.toLong * 2654435761L) == i.toLong)
    for (i <- 0 until n by 2) m.remove(i.toLong * 2654435761L)
    assert(m.size == n / 2)
    for (i <- 1 until n by 2) assert(m.get(i.toLong * 2654435761L) == i.toLong)
    for (i <- 0 until n by 2) assert(m.get(i.toLong * 2654435761L) == null)
  }
}

package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** gridPyramid must reproduce, bit-for-bit, a single-threaded local
  * pooling of the same grid: fixed-order 2x2 means, ragged edges dropped,
  * floor(v * 2^20) per-cell quantization.
  */
class RasterOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("gridPyramid matches a local fixed-order pooling recompute") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    var w = 100
    var h = ev.length / w
    var grid = Array.tabulate(h, w)((y, x) => ev(y * w + x)._2)
    val expected = (0 to 3).map { level =>
      if (level > 0) {
        val (pw, ph) = (w / 2, h / 2)
        grid = Array.tabulate(ph, pw)((y, x) =>
          ((grid(2 * y)(2 * x) + grid(2 * y)(2 * x + 1))
            + (grid(2 * y + 1)(2 * x) + grid(2 * y + 1)(2 * x + 1))) / 4.0)
        w = pw; h = ph
      }
      val q = grid.flatten.map(v => math.floor(v * 1048576.0).toLong)
      (level.toLong, w.toLong, h.toLong, q.length.toLong, q.sum, q.min, q.max)
    }
    val got = RasterOps.gridPyramid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
  }
}

package graft.engine

import graft.SparkTestSession
import graft.model.JobConfig
import org.scalatest.funsuite.AnyFunSuite

class SkewToolsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("rebalance spreads dense tiles and preserves results exactly") {
    import spark.implicits._
    // skewed grid: left quarter is pure noise (dense isolines), rest flat
    val w = 64; val h = 64
    val rnd = new scala.util.Random(9)
    val data = Array.tabulate(w * h) { i =>
      val x = i % w
      if (x < 16) rnd.nextDouble() else 0.0
    }
    val tiles0 = GridSynth.tilesFromArray(spark, "gs", data, w, h, 8, 8)
    // pathological input layout: all tiles in ONE partition
    val tiles = tiles0.repartition(1)
    val (maxBefore, meanBefore) = SkewTools.partitionImbalance(spark, tiles, 0.5)
    val balanced = SkewTools.rebalance(spark, tiles, 0.5, 8)
    val (maxAfter, meanAfter) = SkewTools.partitionImbalance(spark, balanced, 0.5)
    assert(maxBefore == meanBefore * 1.0 + maxBefore - meanBefore) // 1 partition
    assert(maxAfter < maxBefore, s"$maxAfter !< $maxBefore")
    assert(maxAfter <= meanAfter * 2.5, s"max=$maxAfter mean=$meanAfter")

    // identical contours either way
    val eng = new ContourEngine(spark, JobConfig(Seq(0.5), smooth = true))
    val a = eng.contours(tiles).collect().head
    val b = eng.contours(balanced).collect().head
    assert(a.polygons.length == b.polygons.length)
    a.polygons.zip(b.polygons).foreach { case (x, y) =>
      assert(x.exterior == y.exterior && x.holes == y.holes)
    }
  }

  test("slot table above the broadcast limit takes a shuffle join, same result") {
    val w = 32; val h = 32
    val rnd = new scala.util.Random(11)
    val data = Array.tabulate(w * h)(_ => rnd.nextDouble())
    val tiles = GridSynth.tilesFromArray(spark, "gj", data, w, h, 8, 8)
    // limit 0 -> every slot table is "too big to broadcast"
    val viaShuffle = SkewTools.rebalance(spark, tiles, 0.5, 4, slotBroadcastLimit = 0L)
    val plan = viaShuffle.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    val viaBroadcast = SkewTools.rebalance(spark, tiles, 0.5, 4)
    val bPlan = viaBroadcast.queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin"), bPlan)
    // TileRow holds an Array (reference equality) — compare by value
    val norm = (t: graft.model.TileRow) =>
      (t.gridId, t.tileX, t.tileY, t.sx0, t.sy0, t.tw, t.th, t.vw, t.vh,
        t.gdx, t.gdy, t.values.toSeq)
    assert(viaShuffle.collect().map(norm).sortBy(x => (x._2, x._3)).toSeq ==
      viaBroadcast.collect().map(norm).sortBy(x => (x._2, x._3)).toSeq)
  }
}

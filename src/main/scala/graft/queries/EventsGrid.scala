package graft.queries

import graft.core.Tiling
import graft.model.TileRow
import org.apache.spark.sql.{Dataset, SparkSession}

import scala.collection.mutable.ArrayBuffer

/** Deterministic grid derived from the events table — the bridge between the
  * DuckDB oracle (pure SQL over events.parquet) and the contour engine:
  * sample (x, y) = value at x = event_id % W, y = event_id / W.
  *
  * The tile build is itself a distributed raster-assembly pattern: each
  * sample point is routed to its owning tile plus any neighbor tiles whose
  * right/bottom halo contains it, then tiles densify per group.
  */
object EventsGrid {
  val W = 100
  val Thresholds: Seq[Double] = Seq(25.0, 50.0, 75.0, 100.0)

  def dims(spark: SparkSession, dir: String): (Int, Int) = {
    // the row count rides a shared one-row feed (Feeds.shared): dozens of
    // queries derive dims, and each re-count was one full-scan job
    val n = Feeds.shared(spark, dir, "events_count") {
      import org.apache.spark.sql.functions.{count, lit}
      Feeds.table(spark, dir, "events.parquet").agg(count(lit(1)).as("n"))
    }.head().getLong(0)
    require(n % W == 0, s"events count $n not divisible by W=$W")
    (W, (n / W).toInt)
  }

  def tiles(spark: SparkSession, dir: String,
            tileW: Int = 50, tileH: Int = 50): Dataset[TileRow] = {
    import spark.implicits._
    val (w, h) = dims(spark, dir)
    val wl = w
    val cells = Feeds.table(spark, dir, "events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)]
      .map { case (id, v) => ((id % wl).toInt, (id / wl).toInt, v) }
    tilesFromCells(spark, cells, "events", w, h, tileW, tileH)
  }

  /** Route arbitrary (x, y, v) cells of a w x h grid into halo-carrying
    * TileRows — the same distributed raster-assembly pattern `tiles` uses,
    * reusable for derived grids (e.g. pyramid overview levels).
    */
  def tilesFromCells(spark: SparkSession, cells: Dataset[(Int, Int, Double)],
                     gridId: String, w: Int, h: Int,
                     tileW: Int, tileH: Int): Dataset[TileRow] = {
    import spark.implicits._
    val (tw, th) = (tileW, tileH)
    val routed = cells.flatMap { case (x, y, v) =>
      val tx = x / tw
      val ty = y / th
      val out = new ArrayBuffer[(Int, Int, Int, Int, Double)](4)
      out += ((tx, ty, x, y, v))
      val haloL = x % tw == 0 && tx > 0 // right-halo sample of the left tile
      val haloT = y % th == 0 && ty > 0 // bottom-halo sample of the tile above
      if (haloL) out += ((tx - 1, ty, x, y, v))
      if (haloT) out += ((tx, ty - 1, x, y, v))
      if (haloL && haloT) out += ((tx - 1, ty - 1, x, y, v))
      out
    }
    routed.groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Int, Int, Double)]) =>
        val (tx, ty) = key
        val s = Tiling.tileSpec(w, h, tw, th, tx, ty)
        val vals = new Array[Double](s.vw * s.vh)
        it.foreach { case (_, _, x, y, v) => vals((y - s.vy0) * s.vw + (x - s.vx0)) = v }
        TileRow(gridId, tx, ty, s.sx0, s.sy0, s.tw, s.th, s.vw, s.vh, w, h, vals)
      }
  }
}

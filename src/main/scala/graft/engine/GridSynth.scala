package graft.engine

import graft.core.Tiling
import graft.model.TileRow
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic grid -> tile datasets (no external data).
  *
  * Small grids (tests, oracle queries) are tiled from an in-memory array;
  * bench-scale grids are generated tile-locally on executors from a closed
  * form, so no grid ever materializes on the driver.
  */
object GridSynth {

  /** Tile an in-memory row-major grid (driver-side; test scale). */
  def tilesFromArray(spark: SparkSession, gridId: String, values: Array[Double],
                     gdx: Int, gdy: Int, tileW: Int, tileH: Int): Dataset[TileRow] = {
    import spark.implicits._
    val rows = Tiling.tileSpecs(gdx, gdy, tileW, tileH).map { s =>
      TileRow(gridId, s.tileX, s.tileY, s.sx0, s.sy0, s.tw, s.th, s.vw, s.vh,
        gdx, gdy, Tiling.extract(values, gdx, s))
    }
    spark.createDataset(rows)
  }

  /** Volcano-style deterministic DEM: a seeded sum of smooth radial bumps
    * with a sinusoidal modulation — same shape family as the R `volcano`
    * raster that drives the reference's isoband benchmark. Pure function of
    * (seed, x, y): executors generate tiles independently.
    */
  final case class VolcanoField(seed: Long, gdx: Int, gdy: Int) extends Serializable {
    private val rnd = new scala.util.Random(seed)
    private val nBumps = 6
    private val bumps: Array[(Double, Double, Double, Double)] = Array.fill(nBumps) {
      (rnd.nextDouble() * gdx, rnd.nextDouble() * gdy,
        (0.15 + 0.25 * rnd.nextDouble()) * math.max(gdx, gdy), // sigma
        40.0 + 60.0 * rnd.nextDouble()) // amplitude
    }

    def apply(x: Int, y: Int): Double = {
      var v = 94.0
      var i = 0
      while (i < nBumps) {
        val (cx, cy, s, a) = bumps(i)
        val dx = x - cx
        val dy = y - cy
        v += a * math.exp(-(dx * dx + dy * dy) / (2.0 * s * s))
        i += 1
      }
      v * (1.0 + 0.05 * math.sin(0.21 * x) * math.cos(0.17 * y))
    }
  }

  /** Generate the tiles of a gdx x gdy grid executor-side from a field
    * function; one Spark partition per `tilesPerPartition` tiles.
    */
  def tilesFromField(spark: SparkSession, gridId: String, field: VolcanoField,
                     gdx: Int, gdy: Int, tileW: Int, tileH: Int,
                     nPartitions: Int): Dataset[TileRow] = {
    import spark.implicits._
    val nx = (gdx + tileW - 1) / tileW
    val ny = (gdy + tileH - 1) / tileH
    spark.range(0, nx.toLong * ny, 1, nPartitions).map { i =>
      val tx = (i % nx).toInt
      val ty = (i / nx).toInt
      val s = Tiling.tileSpec(gdx, gdy, tileW, tileH, tx, ty)
      val vals = new Array[Double](s.vw * s.vh)
      var r = 0
      while (r < s.vh) {
        var c = 0
        while (c < s.vw) {
          vals(r * s.vw + c) = field(s.vx0 + c, s.vy0 + r)
          c += 1
        }
        r += 1
      }
      TileRow(gridId, tx, ty, s.sx0, s.sy0, s.tw, s.th, s.vw, s.vh, gdx, gdy, vals)
    }
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** A raster tile with a 1-sample halo on EVERY side (clipped at the grid
  * edge): owned samples [ox0, ox0+ow) x [oy0, oy0+oh), buffer row-major
  * with origin (bx0, by0) and dims bw x bh — the input unit of the
  * zero-shuffle raster-window kernels (core.RasterKernel). Differs from
  * the contour engine's TileRow (right/bottom halo only) because window
  * stencils are symmetric while the marching-squares cell sweep is
  * forward-only.
  */
final case class RasterTile(tileX: Int, tileY: Int,
                            bx0: Int, by0: Int, bw: Int, bh: Int,
                            ox0: Int, oy0: Int, ow: Int, oh: Int,
                            values: Array[Double])

/** Raster overview pyramid over the events grid (GDAL-overview style):
  * level L+1 cell (x, y) is the mean of level L's complete 2x2 block at
  * (2x, 2y); ragged right/bottom edges of odd dimensions are dropped,
  * matching overview semantics. The mean PIVOTS the four quadrants into
  * one fixed-order f64 expression ((v00 + v10) + (v01 + v11)) / 4.0 — a
  * plain groupBy sum over doubles would be combine-order dependent and
  * could never hash-match an oracle. Each pooling step shrinks the data
  * 4x and is one key-local shuffle.
  */
object RasterOps {

  /** 2^20 per-cell quantization, shared with the DuckDB oracle. */
  private val Q20 = 1048576.0

  private val Levels = 3

  /** Base grid cells (x, y, v) from the events table — the single source
    * of the grid-derivation rule shared by gridPyramid and level1Cells
    * (and mirrored by the `g0` CTE in the oracles).
    */
  private[graft] def baseCells(spark: SparkSession, dir: String): DataFrame =
    Feeds.table(spark, dir, "events.parquet") // size-guarded shared decode
      .select((col("event_id") % EventsGrid.W).cast("int").as("x"),
        (col("event_id") / EventsGrid.W).cast("int").as("y"),
        col("value").as("v"))

  /** One pooling step: (x, y, v) cells at (w, h) -> half-resolution cells. */
  private def pool(cells: DataFrame, w: Int, h: Int): DataFrame = {
    def q(dx: Int, dy: Int) =
      max(when(col("x").bitwiseAND(1) === dx && col("y").bitwiseAND(1) === dy, col("v")))
        .as(s"v$dx$dy")
    cells.filter(col("x") < 2 * (w / 2) && col("y") < 2 * (h / 2))
      .groupBy(shiftright(col("x"), 1).as("x"), shiftright(col("y"), 1).as("y"))
      .agg(q(0, 0), q(1, 0), q(0, 1), q(1, 1))
      .select(col("x"), col("y"),
        (((col("v00") + col("v10")) + (col("v01") + col("v11"))) / 4.0).as("v"))
  }

  /** Per-level stats of the base grid plus a 3-level overview pyramid:
    * dimensions, cell count, and floor(v * 2^20) checksum/extrema. The
    * quantization happens per cell, so no float-order-dependent
    * accumulation crosses the engine/oracle compare (integer sums are
    * order-free). Each overview level is computed ONCE: the per-level
    * stats (single rows) run eagerly against a persisted level, whose
    * parent unpersists as soon as the child materializes — the base
    * raster is scanned twice (its own stats + the first pool) and never
    * again, instead of once per downstream level as a lazy union of the
    * stat branches would.
    */
  val gridPyramid: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    var (w, h) = EventsGrid.dims(spark, dir)
    var cells = baseCells(spark, dir)
    var prevPersisted: Option[DataFrame] = None
    val rows = (0 to Levels).map { level =>
      if (level > 0) {
        cells = pool(cells, w, h).persist(StorageLevel.MEMORY_AND_DISK)
        w /= 2; h /= 2
        require(w > 0 && h > 0, s"gridPyramid: level $level is empty at ${w}x$h")
      }
      val qv = floor(col("v") * Q20)
      val r = cells.agg(count(lit(1)).as("n_cells"),
        sum(qv).as("qsum"), min(qv).as("qmin"), max(qv).as("qmax")).head()
      if (level > 0) { // the stats action materialized this level's cache
        prevPersisted.foreach(_.unpersist(blocking = false))
        prevPersisted = Some(cells)
      }
      (level.toLong, w.toLong, h.toLong, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    prevPersisted.foreach(_.unpersist(blocking = false))
    rows.toDF("level", "w", "h", "n_cells", "qsum", "qmin", "qmax").orderBy("level")
  }

  /** Level-1 pooled cells (x, y, v) with halved dims — the composition
    * point for overview-level operators (e.g. contouring at zoom-1).
    */
  private[graft] def level1Cells(spark: SparkSession, dir: String)
      : (org.apache.spark.sql.Dataset[(Int, Int, Double)], Int, Int) = {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    // shared feed: the level-1 overview is consumed by the pyramid
    // contour/band/slope queries, the hydrology level-1 feeds and the
    // level-2 pool — one pooling pass per (session, dir)
    val cells = Feeds.shared(spark, dir, "level1_cells") {
      pool(baseCells(spark, dir), w, h)
    }.as[(Int, Int, Double)]
    (cells, w / 2, h / 2)
  }

  /** 3x3 focal (neighborhood) mean — the classic raster focal-statistics
    * operator — over the interior of the events grid (cells whose full
    * window exists; edge policies that renormalize by a data-dependent
    * count would put a float divide on the compare path). Each cell
    * replicates to the 9 windows it participates in (one narrow explode),
    * one key-local shuffle groups the window, and the mean is a PIVOTED
    * fixed-order f64 expression — same exactness idiom as `pool`. The
    * per-cell quantized mean then folds into per-raster-row integer
    * summaries, so the output is h-2 rows regardless of grid width.
    *
    * Returns (y, n_cells, qsum, qmin, qmax) over qmean = floor(mean*2^20).
    */
  /** The pivoted 3x3 interior window SHARED by focalMean and hornSlope:
    * each cell replicates BY +offset (one narrow explode), one key-local
    * shuffle groups the window, and slot o = (dy+1)*3 + dx+1 holds the
    * value at (tx - dx, ty - dy) — the mirrored labeling both operators'
    * oracles assume via the shared slotJoins. Interior-only (tx in
    * [1, w-2], ty in [1, h-2]) so every slot is present. ONE definition:
    * the slot math and interior bounds can never drift between the two
    * operators (and out of sync with the oracle joins).
    */
  /** Grid-agnostic core of the pivoted window (property-tested on random
    * dims, where the events table's fixed 100-wide grid never goes).
    * CROSS-CHECK formulation: replicates every cell to its 9 window slots
    * through the key-local shuffle — the halo-tiled kernels below are the
    * engine path (raster never shuffles), held bit-equal to this one by
    * RasterRandomSpec.
    */
  private[graft] def pivoted3x3Of(cells: DataFrame, w: Int, h: Int): DataFrame = {
    val offsets = for (dy <- -1 to 1; dx <- -1 to 1) yield (dx, dy)
    val rep = cells
      .withColumn("o", explode(lit(offsets.map { case (dx, dy) => (dy + 1) * 3 + dx + 1 }.toArray)))
      .select((col("x") + col("o") % 3 - 1).as("tx"),
        (col("y") + col("o").divide(3).cast("int") - 1).as("ty"),
        col("o"), col("v"))
      .filter(col("tx") >= 1 && col("tx") <= w - 2 && col("ty") >= 1 && col("ty") <= h - 2)
    def q(o: Int) = max(when(col("o") === o, col("v"))).as(s"v$o")
    rep.groupBy("tx", "ty").agg(q(0), q(1), q(2), q(3), q(4), q(5), q(6), q(7), q(8))
  }

  /** Per-cell quantized stat -> per-raster-row integer summaries. */
  private def rowStats(win: DataFrame, qstat: org.apache.spark.sql.Column): DataFrame =
    win.select(col("ty").cast("long").as("y"), qstat.as("qs"))
      .groupBy("y")
      .agg(count(lit(1)).as("n_cells"), sum(col("qs")).as("qsum"),
        min(col("qs")).as("qmin"), max(col("qs")).as("qmax"))
      .orderBy("y")

  private[graft] def focalMeanOf(cells: DataFrame, w: Int, h: Int): DataFrame = {
    // fixed parenthesization, mirrored verbatim by the oracle
    val mean = ((((col("v0") + col("v1")) + col("v2"))
      + ((col("v3") + col("v4")) + col("v5")))
      + ((col("v6") + col("v7")) + col("v8"))) / 9.0
    rowStats(pivoted3x3Of(cells, w, h), floor(mean * Q20))
  }

  val focalMean: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    focalMeanTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Horn slope (gradient magnitude) — the standard terrain-analysis
    * operator — over the grid interior: gx/gy are the Horn 3x3 weighted
    * differences, slope = sqrt(gx^2 + gy^2). Exactness rests on sqrt being
    * CORRECTLY ROUNDED (IEEE 754) on both the JVM and DuckDB: gx and gy are
    * fixed-order f64 expressions over the pivoted window (the same slot
    * layout as focalMean), the magnitude is the fixed expression
    * sqrt(gx*gx + gy*gy), and floor(slope * 2^20) quantizes per cell before
    * the order-free integer row summaries. (Aspect needs atan2, whose
    * libm rounding differs across platforms — deliberately out of the
    * oracle-exact surface.)
    *
    * Returns (y, n_cells, qsum, qmin, qmax) over qslope.
    */
  private[graft] def hornSlopeOf(cells: DataFrame, w: Int, h: Int): DataFrame = {
    // slot o holds the value at (tx - dx_o, ty - dy_o): slots 0/3/6 are the
    // +x column, 2/5/8 the -x column, 0/1/2 the +y row, 6/7/8 the -y row
    // (the center slot v4 rides along unused — Horn never reads it)
    val gx = (((col("v0") + col("v3") * 2.0) + col("v6"))
      - ((col("v2") + col("v5") * 2.0) + col("v8"))) / 8.0
    val gy = (((col("v0") + col("v1") * 2.0) + col("v2"))
      - ((col("v6") + col("v7") * 2.0) + col("v8"))) / 8.0
    rowStats(pivoted3x3Of(cells, w, h), floor(sqrt(gx * gx + gy * gy) * Q20))
  }

  /** Lambertian hillshade — the cartographic relief-shading operator —
    * over the grid interior: Horn gradients p = gx, q = gy (the exact
    * hornSlopeOf expressions), unnormalized surface normal (-p, -q, 1),
    * sun fixed at azimuth 315 deg / altitude 45 deg whose unit vector
    * components are all f64-deterministic (-0.5, 0.5, sqrt(2)/2 — see
    * core.RasterKernel.SunLz); shade = max(0, ((p*0.5 - q*0.5) + lz) /
    * sqrt((1 + p^2) + q^2)). Division and sqrt are correctly rounded and
    * the max compares exactly, so floor(shade * 2^20) is deterministic per
    * cell before the order-free integer row summaries. CROSS-CHECK
    * formulation (scatter/pivot); hillshadeTiledOf is the engine path.
    */
  private[graft] def hillshadeOf(cells: DataFrame, w: Int, h: Int): DataFrame = {
    val gx = (((col("v0") + col("v3") * 2.0) + col("v6"))
      - ((col("v2") + col("v5") * 2.0) + col("v8"))) / 8.0
    val gy = (((col("v0") + col("v1") * 2.0) + col("v2"))
      - ((col("v6") + col("v7") * 2.0) + col("v8"))) / 8.0
    val shade = ((gx * 0.5 - gy * 0.5) + lit(graft.core.RasterKernel.SunLz)) /
      sqrt((lit(1.0) + gx * gx) + gy * gy)
    rowStats(pivoted3x3Of(cells, w, h), floor(greatest(shade, lit(0.0)) * Q20))
  }

  val hillshade: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    hillshadeTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Riley terrain ruggedness index — tri = sqrt(sum of squared deviations
    * of the 3x3 window from its center), the standard DEM heterogeneity
    * measure. Same exactness chain as the slope family: fixed association
    * tree (the focal kernel's row-of-three shape; the center term is
    * exactly +0.0 and kept for tree-shape sharing), correctly-rounded
    * sqrt, per-cell quantization before order-free integer row summaries.
    * CROSS-CHECK formulation (scatter/pivot); triTiledOf is the engine
    * path.
    */
  private[graft] def triOf(cells: DataFrame, w: Int, h: Int): DataFrame = {
    def sq(o: Int) = (col(s"v$o") - col("v4")) * (col(s"v$o") - col("v4"))
    val tri = sqrt((((sq(0) + sq(1)) + sq(2))
      + ((sq(3) + sq(4)) + sq(5)))
      + ((sq(6) + sq(7)) + sq(8)))
    rowStats(pivoted3x3Of(cells, w, h), floor(tri * Q20))
  }

  /** Zevenbergen & Thorne curvature pair — plan (contour-line) and
    * profile (slope-line) curvature per interior cell, the second-
    * derivative terrain classifiers, folded to per-row integer summaries
    * of BOTH stats: (y, n_cells, plsum, plmin, plmax, prsum, prmin,
    * prmax). Quadratic-surface coefficients and the exact expression trees
    * are documented on [[graft.core.RasterKernel.curvatureRows]]; the
    * flat-cell guard (den = g^2 + h^2 = 0 -> 0) compares exactly. CROSS-
    * CHECK formulation (scatter/pivot); curvatureTiledOf is the engine
    * path.
    */
  private[graft] def curvatureOf(cells: DataFrame, w: Int, h: Int): DataFrame = {
    val dd = (col("v5") + col("v3")) / 2.0 - col("v4")
    val ee = (col("v7") + col("v1")) / 2.0 - col("v4")
    val ff = ((col("v0") - col("v2")) + (col("v8") - col("v6"))) / 4.0
    val gg = (col("v3") - col("v5")) / 2.0
    val hh = (col("v1") - col("v7")) / 2.0
    val den = gg * gg + hh * hh
    val pl = when(den === 0.0, lit(0.0))
      .otherwise(lit(2.0) * ((dd * (hh * hh) + ee * (gg * gg)) - (ff * gg) * hh) / den)
    val pr = when(den === 0.0, lit(0.0))
      .otherwise(lit(-2.0) * ((dd * (gg * gg) + ee * (hh * hh)) + (ff * gg) * hh) / den)
    pivoted3x3Of(cells, w, h)
      .select(col("ty").cast("long").as("y"),
        floor(pl * Q20).as("qpl"), floor(pr * Q20).as("qpr"))
      .groupBy("y")
      .agg(count(lit(1)).as("n_cells"),
        sum("qpl").as("plsum"), min("qpl").as("plmin"), max("qpl").as("plmax"),
        sum("qpr").as("prsum"), min("qpr").as("prmin"), max("qpr").as("prmax"))
      .orderBy("y")
  }

  val curvature: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    curvatureTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** 8-way aspect classification histogram — aspect without atan2: octant
    * membership of the downslope vector (-gx, -gy) by exact comparisons
    * against T = sqrt(2) - 1 (see core.RasterKernel.aspectClasses for the
    * derivation and why T is f64-deterministic). Returns (cls, n_cells)
    * for the classes present (-1 flat, 0 = E counterclockwise to 7 = SE).
    * CROSS-CHECK formulation (scatter/pivot); aspectTiledOf is the engine
    * path.
    */
  private[graft] def aspectOf(cells: DataFrame, w: Int, h: Int): DataFrame = {
    val gx = (((col("v0") + col("v3") * 2.0) + col("v6"))
      - ((col("v2") + col("v5") * 2.0) + col("v8"))) / 8.0
    val gy = (((col("v0") + col("v1") * 2.0) + col("v2"))
      - ((col("v6") + col("v7") * 2.0) + col("v8"))) / 8.0
    val t = graft.core.RasterKernel.Tan22_5
    pivoted3x3Of(cells, w, h)
      .withColumn("ax", -gx).withColumn("ay", -gy)
      .withColumn("cls",
        when(col("ax") === 0.0 && col("ay") === 0.0, -1L)
          .when(abs(col("ay")) <= lit(t) * abs(col("ax")),
            when(col("ax") > 0.0, 0L).otherwise(4L))
          .when(abs(col("ax")) <= lit(t) * abs(col("ay")),
            when(col("ay") > 0.0, 2L).otherwise(6L))
          .when(col("ax") > 0.0 && col("ay") > 0.0, 1L)
          .when(col("ax") < 0.0 && col("ay") > 0.0, 3L)
          .when(col("ax") < 0.0 && col("ay") < 0.0, 5L)
          .otherwise(7L))
      .groupBy("cls").agg(count(lit(1)).cast("long").as("n_cells"))
      .orderBy("cls")
  }

  val gridAspect: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    aspectTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  val gridTri: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    triTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  val hornSlope: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    hornSlopeTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** 3x3 focal MEDIAN — the edge-preserving smoother — over the grid
    * interior. Pure ORDER STATISTICS: the median is the 5th of the 9
    * sorted window values, picked by exact selection with no arithmetic
    * on the values at all, so no association tree needs fixing; only the
    * per-cell floor(median * 2^20) quantization computes anything.
    * (-0.0/0.0 sort ties may order differently across sorters, but tied
    * values quantize identically.) CROSS-CHECK formulation
    * (sort_array over the pivoted window); focalMedianTiledOf is the
    * engine path (insertion sort inside the tile kernel).
    */
  private[graft] def focalMedianOf(cells: DataFrame, w: Int, h: Int): DataFrame = {
    val med = element_at(sort_array(array((0 to 8).map(o => col(s"v$o")): _*)), 5)
    rowStats(pivoted3x3Of(cells, w, h), floor(med * Q20))
  }

  /** Thresholds of the binary morphology mask — the contour ladder
    * (EventsGrid.Thresholds), shared verbatim with the oracle's VALUES
    * list.
    */
  private[graft] val MorphThresholds: Array[Double] = EventsGrid.Thresholds.toArray

  /** Binary 3x3 morphology — erosion and dilation, the foundational
    * mathematical-morphology pair — of the mask v >= threshold over the
    * grid interior: erosion keeps a center iff its whole 3x3 window is in
    * the mask (window min >= t), dilation iff any sample is (window max
    * >= t). Entirely boolean/integer — min/max are exact selections and
    * the compares exact, so nothing quantizes anywhere. One row per
    * threshold: (threshold, n_mask, n_erode, n_dilate); n_erode <=
    * n_mask <= n_dilate by construction (on interior centers). CROSS-CHECK
    * formulation (least/greatest over the pivoted window); morphTiledOf
    * is the engine path.
    */
  private[graft] def morphOf(cells: DataFrame, w: Int, h: Int): DataFrame = {
    val mn = least((0 to 8).map(o => col(s"v$o")): _*)
    val mx = greatest((0 to 8).map(o => col(s"v$o")): _*)
    pivoted3x3Of(cells, w, h)
      .select(col("v4").as("c"), mn.as("mn"), mx.as("mx"))
      .withColumn("threshold", explode(lit(MorphThresholds)))
      .groupBy("threshold")
      .agg(sum(when(col("c") >= col("threshold"), 1L).otherwise(0L)).as("n_mask"),
        sum(when(col("mn") >= col("threshold"), 1L).otherwise(0L)).as("n_erode"),
        sum(when(col("mx") >= col("threshold"), 1L).otherwise(0L)).as("n_dilate"))
      .orderBy("threshold")
  }

  /** D8 successor per interior cell (id = y * w + x, succ id, -1 for
    * pits) — the cell-level CROSS-CHECK of core.RasterKernel.d8SuccCells:
    * the d8FlowDirOf packed-argmax decoded to the downstream neighbour
    * (direction slot o drains to (x - dx_o, y - dy_o)). Feed for
    * watershed basin labeling (queries.HydroOps).
    */
  private[graft] def d8SuccOf(cells: DataFrame, w: Int, h: Int): DataFrame = {
    val win = pivoted3x3Of(cells, w, h)
    val slots = Seq(0, 1, 2, 3, 5, 6, 7, 8)
    val sqrt2 = math.sqrt(2.0)
    def packed(o: Int) = {
      val dxo = o % 3 - 1; val dyo = o / 3 - 1
      val dist = if (dxo != 0 && dyo != 0) sqrt2 else 1.0
      floor((col("v4") - col(s"v$o")) / lit(dist) * Q20).cast("long") * 16L + (8L - o)
    }
    val pmax = greatest(slots.map(packed): _*)
    val dir = lit(8L) - pmax % 16L // decoded only under pmax >= 16, where it is in [0, 8]
    val succ = when(pmax >= 16L,
      (col("ty").cast("long") - (dir.divide(3).cast("long") - 1L)) * w
        + (col("tx").cast("long") - (dir % 3L - 1L))).otherwise(-1L)
    win.select((col("ty").cast("long") * w + col("tx")).as("id"), succ.as("succ"))
  }

  /** Row-prefix scan (the summed-area table's horizontal pass): prefix(x, y)
    * = sum of floor(v * 2^20) over x' <= x in row y — the distributed SCAN
    * primitive. Quantization is per cell BEFORE the fold, so every prefix
    * is an exact integer and the fold order is the x order — deterministic
    * by construction, not by float-combine luck. Two passes: (1) cells
    * group key-locally by (x-segment, y) and fold an in-order local scan
    * into three integer partials per segment (the raster's ONE ordered
    * exchange — a scan inherently needs ordered grouping); (2) a window
    * over the tiny segment table (w/segW rows per raster row) turns
    * segment totals into exclusive offsets, and the per-row stats assemble
    * WITHOUT touching cells again: sum of prefixes = local sum + offset *
    * count, max prefix = offset + local max. Returns (y, n_cells, psum,
    * pmax). Long headroom: |q| <= 2^28 here, so psum < w^2 * 2^28 —
    * overflow-free up to ~2^17-wide rasters at this value range.
    */
  private[graft] def rowPrefixOf(cells: Dataset[(Int, Int, Double)],
                                 w: Int, h: Int, segW: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    val segs = cells.groupByKey { case (x, y, _) => (x / segW, y) }
      .mapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Double)]) =>
        val (sx, y) = key
        val buf = it.toArray.sortBy(_._1)
        val expect = math.min(segW, w - sx * segW)
        require(buf.length == expect && buf.iterator.map(_._1).toSet.size == buf.length,
          s"rowPrefix: segment ($sx, $y) got ${buf.length} of $expect cells — sparse grid?")
        var run = 0L; var sp = 0L; var mp = Long.MinValue
        buf.foreach { case (_, _, v) =>
          run += math.floor(v * Q20).toLong; sp += run
          if (run > mp) mp = run
        }
        (sx, y, buf.length.toLong, sp, mp, run)
      }
      .toDF("sx", "y", "n", "sp", "mp", "tot")
    val wSpec = Window.partitionBy("y").orderBy("sx")
      .rowsBetween(Window.unboundedPreceding, -1)
    segs.withColumn("off", coalesce(sum(col("tot")).over(wSpec), lit(0L)))
      .groupBy(col("y").cast("long").as("y"))
      .agg(sum(col("n")).as("n_cells"),
        sum(col("sp") + col("off") * col("n")).as("psum"),
        max(col("off") + col("mp")).as("pmax"))
      .orderBy("y")
  }

  val rowPrefix: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    rowPrefixOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Row-wise viewshed with EXACT rational arithmetic: an observer stands
    * on cell x = 0 of each row (elevation q0 = floor(v * 2^20)); cell
    * x >= 1 is visible iff its elevation angle (q_x - q0) / x STRICTLY
    * exceeds every predecessor's (1 <= x' < x) — equal angles block.
    * Angles never divide: every comparison is the long cross-product
    * n1 * d2 > n2 * d1 (d = x > 0), so engine, oracle, and spec agree
    * bit-for-bit with no float anywhere. Distributed shape (the
    * [[rowPrefixOf]] segment idiom — a scan's ordered grouping is the one
    * exchange): cells group key-locally by (x-segment, y), with the
    * observer cell replicated to each of the row's ceil(w/segW) segments
    * (a per-ROW halo, perimeter-proportional like the tile kernels'); the
    * in-segment pass keeps only LOCALLY-visible cells (those beating the
    * in-segment running max — everything a later cell could ever need,
    * since visibility vs the incoming carry is monotone over the
    * segment's increasing angle list); the per-row pass walks the tiny
    * segment summaries in x order carrying the max-angle rational.
    * Emits (y, n_cells, n_visible, xsum, last_x) — integer row summaries
    * (x = 0 counts as visible; xsum/last_x are visible-x checksums).
    * Long headroom: |n| <= 2^29 at this value range, so products are
    * safe to w ~ 2^33. The oracle is the independent quadratic
    * formulation: NOT EXISTS a blocking predecessor, same cross-product.
    */
  private[graft] def viewshedOf(cells: Dataset[(Int, Int, Double)],
                                w: Int, h: Int, segW: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    val nSegs = (w + segW - 1) / segW
    val routed = cells.flatMap { case (x, y, v) =>
      val own = (x / segW, y, x, v, false) :: Nil
      if (x == 0) own ++ (0 until nSegs).map(s => (s, y, x, v, true)) else own
    }
    val segs = routed.groupByKey(t => (t._1, t._2))
      .mapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Int, Double, Boolean)]) =>
        val (seg, y) = key
        val items = it.toArray
        val q0 = math.floor(items.find(_._5)
          .getOrElse(throw new IllegalStateException(s"viewshed: row $y lost its observer"))
          ._4 * Q20).toLong
        val own = items.filter(!_._5).sortBy(_._3)
        val expect = math.min(segW, w - seg * segW)
        require(own.length == expect && own.iterator.map(_._3).toSet.size == own.length,
          s"viewshed: segment ($seg, $y) got ${own.length} of $expect cells — sparse grid?")
        var ln = 0L; var ld = 0L // in-segment running max angle; ld == 0 => none yet
        val ns = Array.newBuilder[Long]; val xs = Array.newBuilder[Long]
        own.foreach { case (_, _, x, v, _) =>
          if (x >= 1) {
            val n = math.floor(v * Q20).toLong - q0
            val d = x.toLong
            if (ld == 0L || n * ld > ln * d) { ns += n; xs += d; ln = n; ld = d }
          }
        }
        (y, seg, own.length.toLong, ns.result(), xs.result())
      }
    segs.groupByKey(_._1)
      .mapGroups { (y: Int, it: Iterator[(Int, Int, Long, Array[Long], Array[Long])]) =>
        val ordered = it.toArray.sortBy(_._2)
        var mn = 0L; var md = 0L // carried max angle across segments
        var nCells = 0L; var nVis = 1L; var xsum = 0L; var lastX = 0L
        ordered.foreach { case (_, _, nc, ns, xs) =>
          nCells += nc
          var i = 0
          while (i < ns.length) {
            if (md == 0L || ns(i) * md > mn * xs(i)) {
              nVis += 1L; xsum += xs(i); lastX = xs(i)
              mn = ns(i); md = xs(i)
            }
            i += 1
          }
        }
        (y.toLong, nCells, nVis, xsum, lastX)
      }
      .toDF("y", "n_cells", "n_visible", "xsum", "last_x")
      .orderBy("y")
  }

  val viewshed: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    viewshedOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** In-order prefix scan along one axis of an integer cell table,
    * emitting PER-CELL prefixes — the composable scan primitive behind
    * [[integralOf]] (vs [[rowPrefixOf]], which folds straight to row
    * stats through the segmented two-pass form). Distribution unit = one
    * grid LINE per task (the natural raster scan unit; a 10^6-cell line
    * is ~8 MB — for rasters wider than a task should hold, the segmented
    * decomposition of rowPrefixOf applies the same way). Dense-line
    * contract loudly required.
    */
  private[graft] def scanLinesOf(cells: Dataset[(Int, Int, Long)],
                                 alongX: Boolean, n: Int): Dataset[(Int, Int, Long)] = {
    import cells.sparkSession.implicits._
    cells.groupByKey(c => if (alongX) c._2 else c._1)
      .flatMapGroups { (k: Int, it: Iterator[(Int, Int, Long)]) =>
        val buf = it.toArray
        val sorted = if (alongX) buf.sortBy(_._1) else buf.sortBy(_._2)
        require(sorted.length == n,
          s"integral scan: line $k has ${sorted.length} of $n cells — sparse grid?")
        var run = 0L
        sorted.iterator.map { case (x, y, q) => run += q; (x, y, run) }
      }
  }

  /** Integral image (summed-area table): ii(x, y) = sum of floor(v * 2^20)
    * over x' <= x AND y' <= y — the 2D prefix, built by COMPOSING two
    * orthogonal scans (row prefix along x, then column prefix of the row
    * prefixes along y): the separability identity every summed-area
    * construction uses, here as two distributed scan passes. All
    * arithmetic is integer after the per-cell quantization, so both scan
    * orders are exact by construction. Folds to per-row summaries
    * (y, n_cells, qsum = sum of ii over the row, qmax = max ii over the
    * row — equal to ii(w-1, y), the whole-rectangle sum, on non-negative
    * rasters). Headroom: |q| < 2^28 here, ii < w*h*2^28,
    * row sums < w^2*h*2^28 — Long-safe through sf0.1's 100x1000 grid and
    * far beyond.
    */
  private[graft] def integralOf(cells: Dataset[(Int, Int, Double)],
                                w: Int, h: Int): DataFrame = {
    import cells.sparkSession.implicits._
    val q = cells.map { case (x, y, v) => (x, y, math.floor(v * Q20).toLong) }
    val ii = scanLinesOf(scanLinesOf(q, alongX = true, w), alongX = false, h)
    ii.toDF("x", "y", "ii")
      .groupBy(col("y").cast("long").as("y"))
      .agg(count(lit(1)).as("n_cells"), sum(col("ii")).as("qsum"),
        max(col("ii")).as("qmax"))
      .orderBy("y")
  }

  val integralImage: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    integralOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** D8 flow direction — the standard hydrology operator — over the grid
    * interior: each cell drains to the steepest-descent neighbour of its
    * 3x3 window, drop = (center - neighbour) / distance (distance sqrt(2)
    * on diagonals, correctly rounded on both sides). ENTIRELY in the
    * integer domain after per-neighbour quantization: each neighbour's
    * drop quantizes to qd = floor(drop * 2^20), packs as qd * 16 + (8 -
    * slot), and the cell's direction is the plain BIGINT `greatest` of
    * the 8 packed values — ties on equal quantized drop resolve to the
    * SMALLEST slot index by construction (larger 8-slot wins), with no
    * float compare anywhere near the argmax. Cells with no positive drop
    * (pits/flats) report direction -1. Output is the per-direction
    * histogram (n_cells + max packed value, decode-free and order-free).
    */
  private[graft] def d8FlowDirOf(cells: DataFrame, w: Int, h: Int): DataFrame = {
    val win = pivoted3x3Of(cells, w, h)
    val slots = Seq(0, 1, 2, 3, 5, 6, 7, 8)
    val sqrt2 = math.sqrt(2.0)
    def packed(o: Int) = {
      val dxo = o % 3 - 1; val dyo = o / 3 - 1
      val dist = if (dxo != 0 && dyo != 0) sqrt2 else 1.0
      floor((col("v4") - col(s"v$o")) / lit(dist) * Q20).cast("long") * 16L + (8L - o)
    }
    val pmax = greatest(slots.map(packed): _*)
    // best drop >= 1 quantum <=> pmax >= 16 (qd=0 packs into [0,8], qd<0
    // packs negative); % only ever decodes a non-negative pmax, where
    // Spark's truncating % and DuckDB's % agree
    val dircol = when(pmax >= 16L, lit(8L) - pmax % 16L).otherwise(lit(-1L))
    win.select(dircol.as("dir"), pmax.as("qpk"))
      .groupBy("dir")
      .agg(count(lit(1)).as("n_cells"), max("qpk").as("qpk_max"))
      .orderBy("dir")
  }

  val d8FlowDir: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    d8FlowDirTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Bilinear 2x UPSAMPLE (the pyramid's inverse direction — overview
    * zoom-in resampling, align_corners=false convention): output pixel
    * (X, Y) of the 2w x 2h grid samples source coordinate
    * ((X+0.5)/2 - 0.5, (Y+0.5)/2 - 0.5), i.e. corner sources
    * x0 = clamp((X-1) floorDiv 2), x1 = clamp((X+1) floorDiv 2) with
    * weights fx = 0.75 for even X, 0.25 for odd X (both EXACT in f64, as
    * are 1-fx), edges clamped. The interpolation is the fixed-order
    * expression (v00*(1-fx) + v10*fx)*(1-fy) + (v01*(1-fx) + v11*fx)*fy,
    * quantized per output cell before order-free integer row summaries.
    *
    * Scale shape: each source cell emits its (exactly 4 x 4 = 16, clamp
    * duplicates included) corner-role slots in one narrow flatMap; ONE
    * key-local shuffle groups each output pixel's 4-slot window (the same
    * replicate+pivot idiom as pivoted3x3 — never a 4-way self-join on the
    * engine side). The shuffle carries 16 small rows per source cell —
    * which is why this cell-level formulation is now the CROSS-CHECK, not
    * the engine path: gridUpsampleTiledOf below runs the same stencil
    * inside halo'd tiles and shuffles only per-row integer partials.
    * Returns (y, n_cells, qsum, qmin, qmax) per OUTPUT row.
    */
  private[graft] def gridUpsampleOf(src: org.apache.spark.sql.Dataset[(Int, Int, Double)],
                                    w: Int, h: Int): DataFrame = {
    import src.sparkSession.implicits._
    val slots = src.flatMap { case (x, y, v) =>
      // outputs that read source index c as their LOW corner (role 0) are
      // 2c+1 and 2c+2 (plus output 0, left-clamped, when c = 0); as their
      // HIGH corner (role 1), 2c and 2c-1 (plus output 2n-1, right-clamped,
      // when c is the last source index)
      def pairs(c: Int, n2: Int, last: Int): Seq[(Int, Int)] = {
        val b = Seq.newBuilder[(Int, Int)]
        b += ((2 * c + 1, 0))
        if (2 * c + 2 <= n2 - 1) b += ((2 * c + 2, 0))
        if (c == 0) b += ((0, 0))
        b += ((2 * c, 1))
        if (2 * c - 1 >= 0) b += ((2 * c - 1, 1))
        if (c == last) b += ((n2 - 1, 1))
        b.result()
      }
      for ((ox, rx) <- pairs(x, 2 * w, w - 1); (oy, ry) <- pairs(y, 2 * h, h - 1))
        yield (ox, oy, ry * 2 + rx, v)
    }.toDF("tx", "ty", "slot", "v")
    def q(s: Int) = max(when(col("slot") === s, col("v"))).as(s"v$s")
    val win = slots.groupBy("tx", "ty").agg(q(0), q(1), q(2), q(3))
    val fx = when(col("tx") % 2 === 0, lit(0.75)).otherwise(lit(0.25))
    val fy = when(col("ty") % 2 === 0, lit(0.75)).otherwise(lit(0.25))
    val top = (col("v0") * (lit(1.0) - fx)) + (col("v1") * fx)
    val bot = (col("v2") * (lit(1.0) - fx)) + (col("v3") * fx)
    val v = (top * (lit(1.0) - fy)) + (bot * fy)
    rowStats(win, floor(v * Q20))
  }

  // ---- halo-tiled (zero-shuffle) raster windows ------------------------
  //
  // The engine path for the window family: tiles with a symmetric 1-sample
  // halo run the whole stencil INSIDE a narrow flatMap (core.RasterKernel)
  // and emit per-row / per-direction integer partials — the only exchange
  // is the tiny partial-aggregate merge (O(tiles x tile-rows) rows), never
  // the raster. Building tiles from a cell-per-row table costs ONE routing
  // exchange that ships each raster byte ~(1 + 2/tileW)(1 + 2/tileH) ≈
  // 1.08x (50x50 tiles) — vs the scatter/pivot formulation above, whose
  // key-local shuffle ships every cell 9x (windows) to 16x (upsample
  // corner roles). When the raster already lives tiled (the doc table's
  // media tiles), the kernels run with NO raster exchange at all. The
  // scatter/pivot path stays as the independent bit-exact cross-check
  // (RasterRandomSpec asserts tiled == cell-level on random grids and
  // tilings; both match the same DuckDB oracles).

  /** Route (x, y, v) cells of a w x h grid into RasterTiles with a
    * symmetric `halo`-sample halo (default 1, the window-stencil case; the
    * K-round propagation kernels ask for halo = K). A sample ships to its
    * owner tile plus any edge-adjacent neighbours whose halo contains it
    * (≤ 4 targets for halo ≤ tile dims, only within `halo` cells of a
    * tile border — exchange stays perimeter-proportional). Dense-grid
    * contract: every buffer slot must be filled, loudly required.
    */
  private[graft] def haloTilesFromCells(cells: Dataset[(Int, Int, Double)],
                                        w: Int, h: Int,
                                        tileW: Int, tileH: Int,
                                        halo: Int = 1): Dataset[RasterTile] = {
    import cells.sparkSession.implicits._
    val (tw, th, k) = (tileW, tileH, halo)
    require(k >= 1 && k <= tw && k <= th,
      s"haloTiles: halo $k outside [1, min(tileW, tileH) = ${math.min(tw, th)}]")
    val nx = (w + tw - 1) / tw
    val ny = (h + th - 1) / th
    val routed = cells.flatMap { case (x, y, v) =>
      // owner c/t always; left/top neighbour iff the sample sits in its
      // k-wide right/bottom halo band (c % t < k); right/bottom neighbour
      // iff in its left/top band (c % t >= t - k)
      def targets(c: Int, t: Int, n: Int): Seq[Int] = {
        val own = c / t
        val b = Seq.newBuilder[Int]
        b += own
        if (c % t < k && own > 0) b += own - 1
        if (c % t >= t - k && own + 1 < n) b += own + 1
        b.result()
      }
      for (tx <- targets(x, tw, nx); ty <- targets(y, th, ny)) yield (tx, ty, x, y, v)
    }
    routed.groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Int, Int, Double)]) =>
        val (tx, ty) = key
        val ox0 = tx * tw; val oy0 = ty * th
        val ow = math.min(tw, w - ox0); val oh = math.min(th, h - oy0)
        val bx0 = math.max(ox0 - k, 0); val by0 = math.max(oy0 - k, 0)
        val bw = math.min(ox0 + ow + k, w) - bx0
        val bh = math.min(oy0 + oh + k, h) - by0
        val vals = new Array[Double](bw * bh)
        // per-SLOT fill tracking (not a message count): a duplicated cell
        // paired with a missing one must fail loudly, not leave a silent
        // 0.0 in the buffer
        val seen = new java.util.BitSet(bw * bh)
        it.foreach { case (_, _, x, y, v) =>
          val slot = (y - by0) * bw + (x - bx0)
          require(!seen.get(slot),
            s"haloTiles: duplicate cell ($x, $y) delivered to tile ($tx, $ty)")
          seen.set(slot)
          vals(slot) = v
        }
        require(seen.cardinality() == bw * bh,
          s"haloTiles: tile ($tx, $ty) got ${seen.cardinality()} of ${bw * bh} " +
            "buffer samples — sparse grid?")
        RasterTile(tx, ty, bx0, by0, bw, bh, ox0, oy0, ow, oh, vals)
      }
  }

  /** Merge the kernels' per-row integer partials — the only shuffle of the
    * tiled path, carrying O(tiles x tile-rows) tiny rows.
    */
  private def mergeRowStats(rows: Dataset[(Long, Long, Long, Long, Long)]): DataFrame =
    rows.toDF("y", "n", "qs", "qn", "qx")
      .groupBy("y")
      .agg(sum(col("n")).as("n_cells"), sum(col("qs")).as("qsum"),
        min(col("qn")).as("qmin"), max(col("qx")).as("qmax"))
      .orderBy("y")

  private[graft] def focalMeanTiledOf(cells: Dataset[(Int, Int, Double)],
                                      w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    mergeRowStats(haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.focalRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h)))
  }

  /** Per-cell RAW f64 focal mean through the tiled path, re-origined to
    * the (w-2) x (h-2) filtered frame — the grid-valued feed for
    * compositions that contour or re-analyze the low-pass field.
    */
  private[graft] def focalCellsTiledOf(cells: Dataset[(Int, Int, Double)],
                                       w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): Dataset[(Int, Int, Double)] = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.focalCells(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h))
  }

  /** Per-cell median-filtered field through the halo-tiled path — the
    * q_med_contours feed ([[focalCellsTiledOf]]'s genus with the order-
    * statistics kernel).
    */
  private[graft] def medianCellsTiledOf(cells: Dataset[(Int, Int, Double)],
                                        w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): Dataset[(Int, Int, Double)] = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.medianCells(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h))
  }

  private[graft] def hornSlopeTiledOf(cells: Dataset[(Int, Int, Double)],
                                      w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    mergeRowStats(haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.slopeRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h)))
  }

  /** Per-cell quantized Horn slope through the tiled path — (point_id =
    * y * w + x, qv), the values feed for zonal-of-slope compositions.
    */
  private[graft] def slopeCellsTiledOf(cells: Dataset[(Int, Int, Double)],
                                       w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.slopeCells(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h))
      .toDF("point_id", "qv")
  }

  private[graft] def aspectTiledOf(cells: Dataset[(Int, Int, Double)],
                                   w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.aspectClasses(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h))
      .toDF("cls", "n")
      .groupBy("cls").agg(sum(col("n")).as("n_cells"))
      .orderBy("cls")
  }

  private[graft] def triTiledOf(cells: Dataset[(Int, Int, Double)],
                                w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    mergeRowStats(haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.triRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h)))
  }

  private[graft] def hillshadeTiledOf(cells: Dataset[(Int, Int, Double)],
                                      w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    mergeRowStats(haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.hillshadeRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h)))
  }

  /** Merge the curvature kernel's two-stat per-row partials — same tiny
    * merge shuffle as [[mergeRowStats]], eight integer columns.
    */
  private def mergeCurvRows(
      rows: Dataset[(Long, Long, Long, Long, Long, Long, Long, Long)]): DataFrame =
    rows.toDF("y", "n", "pls", "pln", "plx", "prs", "prn", "prx")
      .groupBy("y")
      .agg(sum(col("n")).as("n_cells"),
        sum(col("pls")).as("plsum"), min(col("pln")).as("plmin"),
        max(col("plx")).as("plmax"),
        sum(col("prs")).as("prsum"), min(col("prn")).as("prmin"),
        max(col("prx")).as("prmax"))
      .orderBy("y")

  private[graft] def curvatureTiledOf(cells: Dataset[(Int, Int, Double)],
                                      w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    mergeCurvRows(haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.curvatureRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h)))
  }

  private[graft] def focalMedianTiledOf(cells: Dataset[(Int, Int, Double)],
                                        w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    mergeRowStats(haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.medianRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h)))
  }

  private[graft] def morphTiledOf(cells: Dataset[(Int, Int, Double)],
                                  w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
        graft.core.RasterKernel.morphCounts(t.values, t.bx0, t.by0, t.bw,
          t.ox0, t.oy0, t.ow, t.oh, w, h, MorphThresholds))
      .toDF("threshold", "nm", "ne", "nd")
      .groupBy("threshold")
      .agg(sum(col("nm")).as("n_mask"), sum(col("ne")).as("n_erode"),
        sum(col("nd")).as("n_dilate"))
      .orderBy("threshold")
  }

  /** Per-cell D8 successors through the tiled path — (id, succ), the
    * watershed feed (queries.HydroOps.watershed).
    */
  private[graft] def d8SuccCellsTiledOf(cells: Dataset[(Int, Int, Double)],
                                        w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
        graft.core.RasterKernel.d8SuccCells(t.values, t.bx0, t.by0, t.bw,
          t.ox0, t.oy0, t.ow, t.oh, w, h))
      .toDF("id", "succ")
  }

  val focalMedian: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    focalMedianTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  private[graft] def focalMajorityTiledOf(cells: Dataset[(Int, Int, Double)],
                                          w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    mergeRowStats(haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.majorityRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h)))
  }

  val focalMajority: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    focalMajorityTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Discrete Laplacian (edge/ridge detector) — per-row partials of
    * lap = qN + qS + qE + qW - 4*qC over interior cells, through the same
    * zero-shuffle halo-tiled kernel family; oracle gathers the four rook
    * neighbours by +-1 self-joins.
    */
  private[graft] def laplacianTiledOf(cells: Dataset[(Int, Int, Double)],
                                      w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    mergeRowStats(haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.laplacianRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h)))
  }

  val laplacian: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    laplacianTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Sobel L1 gradient magnitude — per-row partials of |gx| + |gy| over
    * interior cells through the tiled kernel; oracle gathers the eight
    * window slots via the fixed slot joins.
    */
  private[graft] def sobelTiledOf(cells: Dataset[(Int, Int, Double)],
                                  w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    mergeRowStats(haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.sobelRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h)))
  }

  val sobel: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    sobelTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  val morphology: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    morphTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Local-binary-pattern TEXTURE HISTOGRAM: each interior cell's eight
    * quantized neighbours compare (>) against its quantized center under
    * the shared mirrored slot labeling, packing a code in [0, 255]
    * (bit o for o < 4, bit o-1 for o > 4 — the center contributes no
    * bit); the grid summarizes to one row per OCCURRING code carrying its
    * cell count and summed center q. The tiled kernel pre-aggregates the
    * whole 256-bucket histogram per tile, so the only exchange after the
    * perimeter-proportional halo routing is <= 256 tiny partial rows per
    * tile — at any raster scale the shuffled bytes are O(tiles), not
    * O(cells). Integer-exact end to end (quantize-then-compare, Long
    * sums), so it equals the oracle's eight-way self-join gather
    * bit-for-bit.
    */
  private[graft] def lbpHistTiledOf(cells: Dataset[(Int, Int, Double)],
                                    w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
        graft.core.RasterKernel.lbpCodes(t.values, t.bx0, t.by0, t.bw,
          t.ox0, t.oy0, t.ow, t.oh, w, h))
      .toDF("code", "n", "qc")
      .groupBy("code")
      .agg(sum(col("n")).as("n_cells"), sum(col("qc")).as("qc_sum"))
      .orderBy("code")
  }

  val lbpHist: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    lbpHistTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** CRITICAL-POINT census — strict local maxima / minima of the surface
    * (the morphometric peak/pit count): a cell is a strict max when all
    * eight quantized neighbours compare <, a strict min when all compare
    * > (plateau ties disqualify, a stated contract both sides share).
    * Per grid row: interior cell count, n_maxima, n_minima, and the
    * extremal centers' q sum as the checksum. Same tiled posture as the
    * window family: kernels emit per-row integer partials, the only
    * exchange is the tiny per-row merge.
    */
  private[graft] def criticalPointsTiledOf(cells: Dataset[(Int, Int, Double)],
                                           w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
        graft.core.RasterKernel.criticalRows(t.values, t.bx0, t.by0, t.bw,
          t.ox0, t.oy0, t.ow, t.oh, w, h))
      .toDF("y", "n", "nmax", "nmin", "qx")
      .groupBy("y")
      .agg(sum(col("n")).as("n_cells"), sum(col("nmax")).as("n_maxima"),
        sum(col("nmin")).as("n_minima"), sum(col("qx")).as("qx_sum"))
      .orderBy("y")
  }

  val criticalPoints: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    criticalPointsTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Binomial 5x5 blur through the K-HALO tile router (halo = 2, the
    * window-stencil use of the generalized halo beside costHorizon's
    * propagation use): zero raster shuffle, per-row integer partials
    * only. The kernel evaluates the 25-term integer sum directly; the
    * DuckDB oracle composes the two separable 1-D passes, so the
    * separability identity is itself on the oracle surface.
    */
  private[graft] def binomialTiledOf(cells: Dataset[(Int, Int, Double)],
                                     w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    mergeRowStats(haloTilesFromCells(cells, w, h, tileW, tileH, halo = 2).flatMap(t =>
      graft.core.RasterKernel.binomialRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h)))
  }

  val blur5: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    binomialTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Saddle-point census (the Morse completion of criticalPoints) through
    * the 1-halo tiled kernels — cyclic sign changes of the 8-neighbour
    * ring, >= 4 changes = saddle.
    */
  private[graft] def saddleTiledOf(cells: Dataset[(Int, Int, Double)],
                                   w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
        graft.core.RasterKernel.saddleRows(t.values, t.bx0, t.by0, t.bw,
          t.ox0, t.oy0, t.ow, t.oh, w, h))
      .toDF("y", "n", "nsad", "qs")
      .groupBy("y")
      .agg(sum(col("n")).as("n_cells"), sum(col("nsad")).as("n_saddles"),
        sum(col("qs")).as("qs_sum"))
      .orderBy("y")
  }

  val saddlePoints: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    saddleTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  private[graft] def d8FlowDirTiledOf(cells: Dataset[(Int, Int, Double)],
                                      w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
        graft.core.RasterKernel.d8Dirs(t.values, t.bx0, t.by0, t.bw,
          t.ox0, t.oy0, t.ow, t.oh, w, h))
      .toDF("dir", "n", "qpk")
      .groupBy("dir")
      .agg(sum(col("n")).as("n_cells"), max(col("qpk")).as("qpk_max"))
      .orderBy("dir")
  }

  private[graft] def gridUpsampleTiledOf(cells: Dataset[(Int, Int, Double)],
                                         w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    mergeRowStats(haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.upsampleRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h)))
  }

  val gridUpsample: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    gridUpsampleTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Horn slope of the PYRAMID's level-1 overview — overview-resolution
    * terrain analysis, the raster analogue of q_pyramid_contours: the
    * pooled grid (exact fixed-order 2x2 means) feeds the halo-tiled slope
    * kernel on a DERIVED grid, proving the tiled path composes with the
    * pyramid the same way the contour engine does. Same exactness chain:
    * pooling and slope both quantize per cell into order-free integers.
    */
  val pyramidSlope: (SparkSession, String) => DataFrame = (spark, dir) => {
    val (cells, w1, h1) = level1Cells(spark, dir)
    hornSlopeTiledOf(cells, w1, h1, 25, 25)
  }

  /** Connected-components labeling of the `v >= threshold` mask
    * (4-connectivity), one labeling per threshold of the standard ladder,
    * over the LEVEL-2 overview grid (composes the pyramid like
    * q_pyramid_contours/q_pyramid_slope; level 2 also keeps the oracle's
    * reachability closure quadratic-safe). The distributed shape is the
    * CONTOUR-STITCH philosophy applied to region labeling:
    * (1) mask cells route to fixed tiles, with each tile-border cell
    *     replicated as a one-cell halo to its left/up neighbor tile
    *     (perimeter-proportional duplication, like the kernels');
    * (2) one mapGroups pass per (threshold, tile) runs plain union-find
    *     over IN-TILE adjacency — interior cells are fully resolved
    *     locally and never touch a shuffle again — and emits per-cell
    *     local labels (component min cell id) plus a CONTRACTED boundary
    *     graph: cross-tile adjacency edges between border cell ids and
    *     identity edges border-cell -> local label;
    * (3) [[TrainingOps.connectedComponents]] (hash-min, one shuffle per
    *     round, monotone-fingerprint convergence) runs on that contracted
    *     graph only — nodes ~ perimeter cells, never the raster — with
    *     all thresholds packed into one node space (threshold index in
    *     the high bits; no cross-threshold edges exist);
    * (4) local labels re-join the fixpoint; components that never touched
    *     a border keep their local label (left-join coalesce).
    * Emits per threshold: mask size, component count, largest component,
    * and the sum of component labels (min cell ids) — all exact integers.
    */
  private[graft] def gridCcOf(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                              tile: Int, thresholds: Seq[Double]): DataFrame =
    gridCcOfLabels(ccCellLabels(cells, w, h, tile, thresholds), thresholds)

  private[graft] def gridCcOfLabels(fin: DataFrame, thresholds: Seq[Double]): DataFrame = {
    val thr = thresholds.toArray
    val thrCol = thr.indices.foldRight(lit(Double.NaN)) { (ti, acc) =>
      when(shiftright(col("flbl"), 40) === ti, lit(thr(ti))).otherwise(acc)
    }
    fin.groupBy("flbl").agg(count(lit(1)).as("csize"))
      .groupBy(thrCol.as("threshold"))
      .agg(sum("csize").as("n_cells"), count(lit(1)).as("n_components"),
        max("csize").as("max_size"),
        sum(col("flbl").bitwiseAND(lit((1L << 40) - 1))).as("lbl_sum"))
      .orderBy("threshold")
  }

  /** The per-cell final component labels behind [[gridCcOf]] — (cell,
    * flbl), both packed (threshold index in bits 40+, min-cell-id label
    * in the low 40) — extracted so label-level compositions
    * ([[ccNestingOf]]) share the exact tile-contracted hash-min pipeline
    * with the census query (one definition, no drift).
    */
  private[graft] def ccCellLabels(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                                  tile: Int, thresholds: Seq[Double]): DataFrame = {
    import cells.sparkSession.implicits._
    require(w.toLong * h < (1L << 40), s"gridCc: cell ids need ${w}x$h < 2^40")
    require(thresholds.size < (1 << 20), "gridCc: threshold index packs into 20 bits")
    val wl = w; val t = tile
    val thr = thresholds.toArray
    val routed = cells.flatMap { case (x, y, v) =>
      val base = for (ti <- thr.indices if v >= thr(ti)) yield (ti, x, y)
      base.flatMap { case (ti, cx, cy) =>
        val tx = cx / t; val ty = cy / t
        var out = List(((ti, tx, ty), (cx, cy)))
        if (cx % t == 0 && tx > 0) out ::= ((ti, tx - 1, ty), (cx, cy))
        if (cy % t == 0 && ty > 0) out ::= ((ti, tx, ty - 1), (cx, cy))
        out
      }
    }
    // kind 0 = per-cell label (b = packed cell, c = packed local label);
    // kind 1 = contracted-graph edge (b, c)
    val tagged = routed.groupByKey(_._1)
      .flatMapGroups { (key: (Int, Int, Int), it: Iterator[((Int, Int, Int), (Int, Int))]) =>
        val (ti, tx, ty) = key
        val cellsIn = it.map(_._2).toArray
        val own = cellsIn.filter { case (x, y) => x / t == tx && y / t == ty }.distinct
        val halo = cellsIn.filter { case (x, y) => !(x / t == tx && y / t == ty) }.toSet
        val idx = own.zipWithIndex.toMap
        val parent = Array.tabulate(own.length)(identity)
        def find(a: Int): Int = { var r = a; while (parent(r) != r) r = parent(r); var c = a
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }; r }
        def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b)
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
        own.zipWithIndex.foreach { case ((x, y), i) =>
          idx.get((x + 1, y)).foreach(union(i, _))
          idx.get((x, y + 1)).foreach(union(i, _))
        }
        def cid(x: Int, y: Int): Long = y.toLong * wl + x
        def pack(id: Long): Long = (ti.toLong << 40) | id
        // local label per root = min cell id in the root's class
        val rootMin = new java.util.HashMap[Int, Long]()
        own.zipWithIndex.foreach { case ((x, y), i) =>
          val r = find(i); val id = cid(x, y)
          val cur = rootMin.getOrDefault(r, Long.MaxValue)
          if (id < cur) rootMin.put(r, id)
        }
        val out = Array.newBuilder[(Int, Long, Long)]
        own.zipWithIndex.foreach { case ((x, y), i) =>
          val lbl = pack(rootMin.get(find(i)))
          out += ((0, pack(cid(x, y)), lbl))
          val border = x % t == 0 || x % t == t - 1 || y % t == 0 || y % t == t - 1
          if (border) out += ((1, pack(cid(x, y)), lbl))
          if (halo.contains((x + 1, y))) out += ((1, pack(cid(x, y)), pack(cid(x + 1, y))))
          if (halo.contains((x, y + 1))) out += ((1, pack(cid(x, y)), pack(cid(x, y + 1))))
        }
        out.result().iterator
      }
      .toDF("kind", "a", "b").localCheckpoint(true)
    val labels = tagged.filter(col("kind") === 0).select(col("a").as("cell"), col("b").as("lbl"))
    val edges = tagged.filter(col("kind") === 1).select(col("a").as("doc_a"), col("b").as("doc_b"))
    val cc = TrainingOps.connectedComponents(edges)
    labels.join(cc, labels("lbl") === cc("doc_id"), "left")
      .select(col("cell"), coalesce(col("cluster_id"), col("lbl")).as("flbl"))
  }

  /** PERCOLATION census across the threshold ladder — does the mask
    * still SPAN the grid? Per threshold, every component's bounding box
    * (min/max of cid%w and cid div w — pure id arithmetic inside the
    * same per-label fold that sizes it) classifies it spanning-horizontal
    * (touches column 0 AND column w-1) and/or spanning-vertical; the
    * census emits per threshold the component count, the spanning counts
    * both ways, the largest spanning component's size (0 when none — the
    * percolation transition reads directly off where this column dies),
    * and the spanning label checksum. Built on [[ccCellLabels]] (the
    * tile-contracted hash-min labeling shared with q_grid_cc and
    * q_cc_nesting — one definition); the census adds one per-label fold
    * and one per-threshold rollup, nothing rawer than labels moves.
    */
  private[graft] def percolationOf(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                                   tile: Int, thresholds: Seq[Double]): DataFrame =
    percolationOfLabels(ccCellLabels(cells, w, h, tile, thresholds), w, h, thresholds)

  private[graft] def percolationOfLabels(labels: DataFrame, w: Int, h: Int,
                                         thresholds: Seq[Double]): DataFrame = {
    val thr = thresholds.toArray
    val low40 = lit((1L << 40) - 1)
    val per = labels
      .select(shiftright(col("cell"), 40).as("ti"),
        col("cell").bitwiseAND(low40).as("cid"), col("flbl"))
      .groupBy("ti", "flbl")
      .agg(count(lit(1)).as("sz"),
        min(col("cid") % w).as("mnx"), max(col("cid") % w).as("mxx"),
        min(expr(s"cid div $w")).as("mny"), max(expr(s"cid div $w")).as("mxy"))
      .select(col("ti"), col("flbl"), col("sz"),
        (col("mnx") === 0 && col("mxx") === w - 1).as("sh"),
        (col("mny") === 0 && col("mxy") === h - 1).as("sv"))
    val thrCol = thr.indices.foldRight(lit(Double.NaN)) { (ti, acc) =>
      when(col("ti") === ti, lit(thr(ti))).otherwise(acc)
    }
    per.groupBy(thrCol.as("threshold"))
      .agg(count(lit(1)).as("n_components"),
        sum(when(col("sh"), 1L).otherwise(0L)).as("n_span_h"),
        sum(when(col("sv"), 1L).otherwise(0L)).as("n_span_v"),
        max(when(col("sh") || col("sv"), col("sz")).otherwise(0L)).as("span_max_size"),
        sum(when(col("sh") || col("sv"),
          col("flbl").bitwiseAND(low40)).otherwise(0L)).as("span_lbl_sum"))
      .orderBy("threshold")
  }

  /** Level-2 tile-contracted hash-min component labels — the shared feed
    * behind q_grid_cc / q_percolation / q_cc_nesting (identical arguments
    * in all three; one hash-min CC pass per session instead of three).
    */
  private def ccLabels2(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "cc_labels2") {
      val (c2, w2, h2) = level2Cells(spark, dir)
      ccCellLabels(c2, w2, h2, 16, EventsGrid.Thresholds)
    }

  val percolation: (SparkSession, String) => DataFrame = (spark, dir) => {
    val (_, w2, h2) = level2Cells(spark, dir)
    percolationOfLabels(ccLabels2(spark, dir), w2, h2, EventsGrid.Thresholds)
  }

  /** COMPONENT NESTING census across the threshold ladder — the merge-
    * tree / persistence view of the mask pyramid: the `v >= t` masks are
    * monotone (raising t only removes cells), so every component at the
    * HIGHER threshold sits inside exactly ONE component at the lower —
    * this operator measures that containment forest per consecutive
    * pair: how many lower components survive (contain >= 1 child), how
    * many split into several children (max_children > 1 = a saddle
    * between the pair), and the label checksums of the distinct
    * parent-child links. n_links = n_hi_comps is a THEOREM of mask
    * monotonicity (each child has one parent) — emitted anyway and
    * spec-asserted, a would-be labeling bug trips it before any oracle.
    * Built ENTIRELY on [[ccCellLabels]] (the tile-contracted hash-min
    * labeling, shared verbatim with q_grid_cc): one cell-keyed
    * self-join pairs each cell's adjacent-level labels, distinct
    * collapses to component links, and two tiny rollups finish — nothing
    * heavier than the labeling itself, no quadratic pass. Pairs whose
    * LOWER level has no components drop (monotonicity makes the upper
    * empty too — the stated contract).
    */
  private[graft] def ccNestingOf(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                                 tile: Int, thresholds: Seq[Double]): DataFrame =
    ccNestingOfLabels(ccCellLabels(cells, w, h, tile, thresholds), thresholds)

  private[graft] def ccNestingOfLabels(labels: DataFrame,
                                       thresholds: Seq[Double]): DataFrame = {
    val thr = thresholds.toArray
    val low40 = lit((1L << 40) - 1)
    val lbl = labels
      .select(shiftright(col("cell"), 40).as("ti"),
        col("cell").bitwiseAND(low40).as("cid"),
        col("flbl").bitwiseAND(low40).as("lbl"))
      .localCheckpoint(true) // labels feed three consumers below
    val perLevel = lbl.select("ti", "lbl").distinct()
      .groupBy("ti").agg(count(lit(1)).as("n_comps"))
    val links = lbl.select(col("ti"), col("cid"), col("lbl").as("plbl"))
      .join(lbl.select((col("ti") - 1).as("ti"), col("cid"), col("lbl").as("clbl")),
        Seq("ti", "cid"))
      .select("ti", "plbl", "clbl").distinct()
    val perParent = links.groupBy("ti", "plbl").agg(count(lit(1)).as("nch"))
    val linkStats = perParent.groupBy("ti")
      .agg(count(lit(1)).as("n_surviving"), sum("nch").as("n_links"),
        max("nch").as("max_children"))
    val linkSums = links.groupBy("ti")
      .agg(sum("plbl").as("plbl_sum"), sum("clbl").as("clbl_sum"))
    // native when-chain (the gridCcOf thrCol idiom — no UDF)
    def thrOf(c: org.apache.spark.sql.Column) =
      thr.indices.foldRight(lit(Double.NaN)) { (ti, acc) =>
        when(c === ti, lit(thr(ti))).otherwise(acc)
      }
    perLevel.filter(col("ti") < thr.length - 1)
      .join(perLevel.select((col("ti") - 1).as("ti"), col("n_comps").as("n_hi")),
        Seq("ti"), "left")
      .join(linkStats, Seq("ti"), "left")
      .join(linkSums, Seq("ti"), "left")
      .select(thrOf(col("ti")).as("t_lo"), thrOf(col("ti") + 1).as("t_hi"),
        col("n_comps").as("n_lo_comps"),
        coalesce(col("n_hi"), lit(0L)).as("n_hi_comps"),
        coalesce(col("n_surviving"), lit(0L)).as("n_surviving"),
        coalesce(col("n_links"), lit(0L)).as("n_links"),
        coalesce(col("max_children"), lit(0L)).as("max_children"),
        coalesce(col("plbl_sum"), lit(0L)).as("plbl_sum"),
        coalesce(col("clbl_sum"), lit(0L)).as("clbl_sum"))
      .orderBy("t_lo")
  }

  val ccNesting: (SparkSession, String) => DataFrame = (spark, dir) =>
    ccNestingOfLabels(ccLabels2(spark, dir), EventsGrid.Thresholds)

  /** Level-2 pooled cells — the composition point shared by gridCc and
    * distTransform (level 2 keeps their quadratic ORACLES bounded).
    */
  private[graft] def level2Cells(spark: SparkSession, dir: String)
      : (Dataset[(Int, Int, Double)], Int, Int) = {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    val cells = Feeds.shared(spark, dir, "level2_cells") {
      val (c1, w1, h1) = level1Cells(spark, dir)
      pool(c1.toDF("x", "y", "v"), w1, h1)
    }.as[(Int, Int, Double)]
    (cells, w / 4, h / 4)
  }

  /** BAND-ADJACENCY transition matrix — which contour BANDS abut, and
    * how much: each cell's band index = |{t : v >= t}| over the ladder
    * (0 = below all, |T| = above all), and every rook-adjacent cell pair
    * votes its unordered (band_lo, band_hi) into the census with the
    * left/top cell's id checksummed. Equal-band mass sits on the
    * diagonal; |hi - lo| >= 2 rows are CLIFFS — adjacencies marching
    * squares renders as stacked contour lines through one cell edge.
    * Adjacency is id arithmetic (right = id+1 guarded by x < w-1 so the
    * row end never wraps to the next row's start — the FULL grid is in
    * play here, unlike the interior-band hydro censuses; down = id+w,
    * which cannot wrap) — no raster stencil, two equi-joins, one rollup.
    */
  private[graft] def bandAdjacencyOf(cells: Dataset[(Int, Int, Double)], w: Int,
                                     thresholds: Seq[Double]): DataFrame = {
    val band = thresholds.foldLeft(lit(0)) { (acc, t) =>
      acc + when(col("v") >= t, 1).otherwise(0)
    }
    val a = cells.toDF("x", "y", "v")
      .select(col("x"), (col("y").cast("long") * w + col("x")).as("id"),
        band.cast("long").as("b"))
      .localCheckpoint(true) // feeds both shift joins
    val right = a.filter(col("x") < w - 1).select(col("id"), col("b").as("ba"))
      .join(a.select((col("id") - 1L).as("id"), col("b").as("bb")), Seq("id"))
    val down = a.select(col("id"), col("b").as("ba"))
      .join(a.select((col("id") - w.toLong).as("id"), col("b").as("bb")), Seq("id"))
    right.unionByName(down)
      .select(least(col("ba"), col("bb")).as("band_lo"),
        greatest(col("ba"), col("bb")).as("band_hi"), col("id"))
      .groupBy("band_lo", "band_hi")
      .agg(count(lit(1)).as("n_pairs"), sum("id").as("id_sum"))
      .orderBy("band_lo", "band_hi")
  }

  val bandAdjacency: (SparkSession, String) => DataFrame = (spark, dir) => {
    val (c2, w2, _) = level2Cells(spark, dir)
    bandAdjacencyOf(c2, w2, EventsGrid.Thresholds)
  }

  /** GLCM — the Haralick GRAY-LEVEL CO-OCCURRENCE matrix at offsets
    * (1,0) and (0,1), unordered (the symmetric GLCM), over 16 gray
    * levels: the classic texture operator read before any segmentation.
    * Gray level = ((qv - minq) * 16) div (maxq - minq + 1) in 0..15 over
    * the floor(v*2^20) quantized values — the global (minq, maxq) is one
    * scalar aggregate broadcast back (exact integers; div truncation
    * keeps level 15 closed at v = max). Every rook-adjacent pair votes
    * its (g_lo, g_hi) into the census with the left/top id checksummed,
    * plus the per-cell-pair CONTRAST contribution (g_hi - g_lo)^2 *
    * n_pairs — sum over rows = the Haralick contrast numerator, exact.
    * Adjacency is id arithmetic exactly like [[bandAdjacencyOf]] (right
    * = id+1 guarded at the row end, down = id+w which cannot wrap); two
    * equi-joins + one <= 136-key rollup, no raster stencil, nothing
    * collected.
    */
  private[graft] def glcmOf(cells: Dataset[(Int, Int, Double)], w: Int): DataFrame = {
    val q = cells.toDF("x", "y", "v")
      .select(col("x"), (col("y").cast("long") * w + col("x")).as("id"),
        floor(col("v") * Q20).cast("long").as("qv"))
    val mm = q.agg(min("qv").as("mn"), max("qv").as("mx"))
    val a = q.crossJoin(broadcast(mm))
      .select(col("x"), col("id"),
        expr("((qv - mn) * 16) div (mx - mn + 1)").as("gl"))
      .localCheckpoint(true) // feeds both shift joins
    val right = a.filter(col("x") < w - 1).select(col("id"), col("gl").as("ga"))
      .join(a.select((col("id") - 1L).as("id"), col("gl").as("gb")), Seq("id"))
    val down = a.select(col("id"), col("gl").as("ga"))
      .join(a.select((col("id") - w.toLong).as("id"), col("gl").as("gb")), Seq("id"))
    right.unionByName(down)
      .select(least(col("ga"), col("gb")).as("g_lo"),
        greatest(col("ga"), col("gb")).as("g_hi"), col("id"))
      .groupBy("g_lo", "g_hi")
      .agg(count(lit(1)).as("n_pairs"), sum("id").as("id_sum"))
      .select(col("g_lo"), col("g_hi"), col("n_pairs"), col("id_sum"),
        ((col("g_hi") - col("g_lo")) * (col("g_hi") - col("g_lo"))
          * col("n_pairs")).as("contrast"))
      .orderBy("g_lo", "g_hi")
  }

  val glcm: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, _) = EventsGrid.dims(spark, dir)
    glcmOf(baseCells(spark, dir).as[(Int, Int, Double)], w)
  }

  /** GLCM scalar-statistic rollup — the Haralick summary read off the
    * [[glcmOf]] co-occurrence table (256-bounded, so this is a second
    * fold over an already-tiny frame, not a new raster pass): total
    * pairs, occupied level-pair count, energy numerator sum c² (energy
    * = that over T² — kept as the exact integer numerator), homogeneity
    * in milli-units as sum over occupied pairs of (c*1000) div (1+d)
    * with d = g_hi - g_lo (truncating div applied per PAIR CELL on both
    * sides — stated convention), and the exact contrast sum d²c. One
    * row out; everything BIGINT.
    */
  private[graft] def glcmStatsOf(cells: Dataset[(Int, Int, Double)], w: Int): DataFrame =
    glcmOf(cells, w)
      .select(col("n_pairs"), (col("g_hi") - col("g_lo")).as("d"))
      .agg(sum("n_pairs").as("t_pairs"), count(lit(1)).as("n_levels"),
        sum(expr("n_pairs * n_pairs")).as("energy_num"),
        sum(expr("(n_pairs * 1000) div (1 + d)")).as("hom_milli"),
        sum(expr("d * d * n_pairs")).as("contrast_sum"))

  val glcmStats: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, _) = EventsGrid.dims(spark, dir)
    glcmStatsOf(baseCells(spark, dir).as[(Int, Int, Double)], w)
  }

  /** White TOP-HAT texture census — the residual v - opening(v) that
    * extracts bright detail smaller than the 3x3 structuring element
    * (the morphological sibling of [[morphTiledOf]]'s erode/dilate
    * counts, COMPOSED: opening = dilate(erode(v))). The composition
    * needs a 5x5 support per cell, so it runs as ONE K = 2 halo tiled
    * kernel pass ([[graft.core.RasterKernel.tophatRows]] — the blur5
    * footprint, zero raster shuffle) on quantized longs
    * (quantize-then-morph, so the tiled pass equals the oracle's
    * two-stage least/greatest gather bit-for-bit), folded by binary
    * digit count of th + 1 with count / th-sum / global-id checksums.
    */
  private[graft] def tophatTiledOf(cells: Dataset[(Int, Int, Double)],
                                   w: Int, h: Int, tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH, halo = 2).flatMap(t =>
        graft.core.RasterKernel.tophatRows(t.values, t.bx0, t.by0, t.bw,
          t.ox0, t.oy0, t.ow, t.oh, w, h))
      .toDF("th_bucket", "n", "ths", "ids")
      .groupBy("th_bucket")
      .agg(sum(col("n")).as("n_cells"), sum(col("ths")).as("th_sum"),
        sum(col("ids")).as("id_sum"))
      .orderBy("th_bucket")
  }

  val tophat: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    tophatTiledOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** q_grid_cc: CC labeling over the level-2 overview grid at the
    * standard threshold ladder.
    */
  val gridCc: (SparkSession, String) => DataFrame = (spark, dir) =>
    gridCcOfLabels(ccLabels2(spark, dir), EventsGrid.Thresholds)

  /** Sentinel "no mask seen" distance — far above any reachable w + h,
    * far below overflow; shared semantics with the final < INF/2 filter.
    */
  private val DtInf = 1000000000L

  /** L1 (city-block) distance transform of the `v >= threshold` mask —
    * the GDAL proximity operator — on the level-2 overview. The L1 metric
    * is SEPARABLE: d(x,y) = min over y' of (|y - y'| + rowDist(x, y')),
    * so the whole transform is SIX plain window scans, each key-local to
    * a row or column (never a neighborhood join, never a quadratic pass):
    * rowDist = min(x - last mask at-or-left, first mask at-or-right - x),
    * and the column pass uses the RUNNING-MIN-OF-TRANSFORMED-VALUE trick:
    * min_{y'<=y}(rowDist - y') + y descending and min_{y'>=y}(rowDist +
    * y') - y ascending — exact integer arithmetic throughout (the
    * sentinel INF rides the transforms safely: INF +- y never wraps and
    * never beats a real distance). Thresholds whose mask is EMPTY drop
    * entirely (both sides). Emits per (threshold, y): n_cells, dsum,
    * dmax. The oracle is the independent brute-force min over all mask
    * cells.
    */
  private[graft] def distTransformOf(cells: DataFrame, thresholds: Seq[Double]): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val inf = DtInf
    val base = cells.select(col("x"), col("y"), col("v"))
      .crossJoin(broadcast(thresholds.toDF("threshold")))
      .withColumn("mask", col("v") >= col("threshold"))
    val rowF = Window.partitionBy("threshold", "y").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rowB = Window.partitionBy("threshold", "y").orderBy("x")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val colF = Window.partitionBy("threshold", "x").orderBy("y")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val colB = Window.partitionBy("threshold", "x").orderBy("y")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    base
      .withColumn("lastL", max(when(col("mask"), col("x"))).over(rowF))
      .withColumn("firstR", min(when(col("mask"), col("x"))).over(rowB))
      .withColumn("rd", least(
        coalesce(col("x") - col("lastL"), lit(inf)),
        coalesce(col("firstR") - col("x"), lit(inf))))
      .withColumn("d", least(
        col("y") + min(col("rd") - col("y")).over(colF),
        min(col("rd") + col("y")).over(colB) - col("y")))
      .filter(col("d") < inf / 2)
      .groupBy(col("threshold"), col("y").cast("long").as("y"))
      .agg(count(lit(1)).as("n_cells"), sum("d").as("dsum"), max("d").as("dmax"))
      .orderBy("threshold", "y")
  }

  val distTransform: (SparkSession, String) => DataFrame = (spark, dir) => {
    val (c2, _, _) = level2Cells(spark, dir)
    distTransformOf(c2.toDF("x", "y", "v"), EventsGrid.Thresholds)
  }

  /** POLE OF INACCESSIBILITY (grid-resolution polylabel) of the
    * `v >= threshold` mask — the deepest-interior cell per threshold: the
    * mask cell maximizing the L1 distance to the nearest COMPLEMENT
    * (`v < threshold`) cell, ties broken by smallest (y, x) (a stated
    * total tie-break, so engine/oracle/spec agree on THE pole, not just
    * its depth). Built by ROLE INVERSION of [[distTransformOf]]'s
    * separable transform — the same six key-local window scans with the
    * complement as the proximity target — then one argmax per threshold
    * via a single lexicographic struct max (max d, then max -y, then
    * max -x): no join, no collect, no quadratic pass anywhere in the
    * engine (the ORACLE is the independent quadratic brute force over
    * mask x complement). Thresholds whose complement is empty (all-mask:
    * the pole is undefined — nothing bounds the depth) and thresholds
    * whose mask is empty both DROP, exactly the sentinel-INF filter
    * semantics. Emits per threshold: n_mask, pole_d, pole_y, pole_x.
    * Interior-disk invariant (specced): every cell within L1 distance
    * < pole_d of the pole is a mask cell.
    */
  private[graft] def poleOf(cells: DataFrame, thresholds: Seq[Double]): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val inf = DtInf
    val base = cells.select(col("x"), col("y"), col("v"))
      .crossJoin(broadcast(thresholds.toDF("threshold")))
      .withColumn("mask", col("v") < col("threshold")) // the COMPLEMENT
    val rowF = Window.partitionBy("threshold", "y").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rowB = Window.partitionBy("threshold", "y").orderBy("x")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val colF = Window.partitionBy("threshold", "x").orderBy("y")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val colB = Window.partitionBy("threshold", "x").orderBy("y")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    base
      .withColumn("lastL", max(when(col("mask"), col("x"))).over(rowF))
      .withColumn("firstR", min(when(col("mask"), col("x"))).over(rowB))
      .withColumn("rd", least(
        coalesce(col("x") - col("lastL"), lit(inf)),
        coalesce(col("firstR") - col("x"), lit(inf))))
      .withColumn("d", least(
        col("y") + min(col("rd") - col("y")).over(colF),
        min(col("rd") + col("y")).over(colB) - col("y")))
      .filter(!col("mask") && col("d") < inf / 2)
      .groupBy("threshold")
      .agg(count(lit(1)).as("n_mask"),
        max(struct(col("d").as("d"), (-col("y")).as("ny"), (-col("x")).as("nx"))).as("p"))
      .select(col("threshold"), col("n_mask"),
        col("p.d").cast("long").as("pole_d"),
        (-col("p.ny")).cast("long").as("pole_y"),
        (-col("p.nx")).cast("long").as("pole_x"))
      .orderBy("threshold")
  }

  val gridPole: (SparkSession, String) => DataFrame = (spark, dir) => {
    val (c2, _, _) = level2Cells(spark, dir)
    poleOf(c2.toDF("x", "y", "v"), EventsGrid.Thresholds)
  }

  /** MASK TOPOLOGY census per threshold — Euler characteristics + exact
    * boundary perimeter of the `v >= threshold` mask via Gray's bit-quad
    * counts through the ZERO-SHUFFLE tiled kernel
    * ([[graft.core.RasterKernel.topoCounts]] — exact-once quad
    * attribution with the 1-cell halo): chi4 = (Q1 - Q3 + 2*QD) / 4 =
    * #(4-connected components) - #(8-connected holes), chi8 = the
    * -2*QD twin, perimeter = 4*n - 2*(horizontal + vertical adjacent
    * pairs). The divisibility of the quad numerators by 4 is a theorem;
    * it is still guarded by a LOUD raise_error (a broken attribution
    * would trip it long before an oracle mismatch). The spec pins chi
    * against independent BFS component/hole counts on random grids — a
    * cross-FORMULATION check, not a recompute. Only per-threshold
    * integer count rows cross the wire (|thresholds| x |tiles| rows);
    * the raster never shuffles.
    */
  private[graft] def topoTiledOf(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                                 thresholds: Seq[Double],
                                 tileW: Int = 16, tileH: Int = 16): DataFrame = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
        graft.core.RasterKernel.topoCounts(t.values, t.bx0, t.by0, t.bw,
          t.ox0, t.oy0, t.ow, t.oh, w, h, thresholds.toArray))
      .toDF("threshold", "n", "nh", "nv", "q1", "q3", "qd")
      .groupBy("threshold")
      .agg(sum("n").as("n_cells"), sum("nh").as("nhs"), sum("nv").as("nvs"),
        sum("q1").as("q1s"), sum("q3").as("q3s"), sum("qd").as("qds"))
      .filter(when((col("q1s") - col("q3s") + lit(2L) * col("qds")) % 4 =!= 0L
          || (col("q1s") - col("q3s") - lit(2L) * col("qds")) % 4 =!= 0L,
        raise_error(concat(lit("topo: threshold "), col("threshold"),
          lit(" breaks the bit-quad divisibility invariant"))))
        .otherwise(lit(true)))
      .select(col("threshold"), col("n_cells"),
        (lit(4L) * col("n_cells") - lit(2L) * (col("nhs") + col("nvs"))).as("perimeter"),
        expr("(q1s - q3s + 2 * qds) div 4").as("euler4"),
        expr("(q1s - q3s - 2 * qds) div 4").as("euler8"))
      .orderBy("threshold")
  }

  val gridTopology: (SparkSession, String) => DataFrame = (spark, dir) => {
    val (c2, w2, h2) = level2Cells(spark, dir)
    topoTiledOf(c2, w2, h2, EventsGrid.Thresholds)
  }

  /** Global Moran's I — the classic spatial-autocorrelation statistic —
    * over the events grid with rook adjacency, EXACT end to end: cells
    * quantize to q = floor(v * 2^20), deviations are against the
    * TRUNCATED quantized mean qbar = sum(q) div n (a stated contract —
    * the exact-rational mean would push every product past 2^63; qbar is
    * deterministic on both compare sides, and truncation semantics match
    * DuckDB's `//`), per-cell products stay in Long (|q| < 2^30 enforced
    * loudly in the kernel), and the sums run in DECIMAL(38,0) — the
    * q_evt_outliers decimal-vs-HUGEINT idiom — so nothing wraps at any
    * cell count up to ~10^17. The pair sums ride the HALO-TILED kernel
    * (each undirected rook edge attributed to its unique west/north cell;
    * zero raster shuffle — only per-cell integer triples feed one
    * map-side-combinable aggregate). Output is one row: n, |W| (edge
    * count), qbar, both decimal sums div 2^20 (the raw sums outgrow
    * BIGINT already at small scale; the scaled truncations are exact on
    * both compare sides and loud if a web-scale run outgrows even them),
    * and the fixed-point index
    * moran_x1e6 = (n * cross_ss * 10^6) div (|W| * dev_ss) — Moran's I
    * with the standard row-normalized-free weights, scaled 10^6, no float
    * anywhere. The oracle GATHERS the same edges via +1 self-joins — the
    * independent formulation of the kernel's scatter.
    */
  /** Grid-agnostic core (property-tested on random dims/tilings against a
    * brute-force recompute). Degenerate inputs — no rook edges, or a
    * constant raster (dev_ss = 0) — fail LOUDLY in the ANSI zero-divide,
    * the stated contract (Moran's I is undefined there).
    */
  /** The truncated quantized mean shared by the global and local Moran
    * operators: (qbar = sum(floor(v * 2^20)) div n, n) — one tiny
    * two-column aggregate collected to the driver (bounded at one row).
    */
  private def truncatedQbar(cells: Dataset[(Int, Int, Double)]): (Long, Long) = {
    val mr = cells.toDF("x", "y", "v").agg(
      sum(floor(col("v") * Q20).cast("decimal(38,0)")).as("s"),
      count(lit(1)).as("n")).head()
    val n = mr.getLong(1)
    require(n > 0, "moran: empty grid")
    // BigInt / truncates toward zero — same semantics as DuckDB's `//`
    ((BigInt(mr.getDecimal(0).toBigInteger) / n).toLong, n)
  }

  private[graft] def moranOf(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                             tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    val (qbar, n) = truncatedQbar(cells)
    haloTilesFromCells(cells, w, h, tileW, tileH)
      .flatMap(t => graft.core.RasterKernel.moranCells(t.values, t.bx0, t.by0,
        t.bw, t.ox0, t.oy0, t.ow, t.oh, w, h, qbar))
      .toDF("dev2", "cross", "ne")
      .agg(sum(col("dev2").cast("decimal(38,0)")).as("dss"),
        sum(col("cross").cast("decimal(38,0)")).as("css"),
        sum(col("ne")).as("wsum"))
      .select(lit(n).as("n_cells"), col("wsum").as("n_edges"),
        lit(qbar).as("qbar"),
        // the raw decimal sums exceed BIGINT already at small scale
        // (dev^2 ~ 2^58 per cell); emit them div 2^20 — truncating
        // division, identical on both compare sides
        expr("dss div 1048576").as("dev_ss_q"),
        expr("css div 1048576").as("cross_ss_q"),
        expr(s"(${n}L * css * 1000000) div (wsum * dss)").as("moran_x1e6"))
  }

  /** Geary's C — the difference-based global autocorrelation companion of
    * [[moranOf]]: C = (n-1) * sum_ij w_ij (x_i-x_j)^2 / (2 W sum dev^2)
    * with rook weights. Same zero-shuffle halo-tiled shape: per-cell
    * integer partials (dev^2, east/south squared differences, edge count)
    * merge through one order-free decimal(38,0) aggregate; the shared
    * truncated-quantized-mean contract feeds dev^2 (the difference term is
    * translation-invariant and never sees the mean). With each unordered
    * edge counted once (ess, ne) and the ordered weight sum W = 2 ne, the
    * fixed-point index collapses to geary_x1e6 = ((n-1) * ess * 10^6) div
    * (2 * ne * dss) — no float anywhere. Degenerate inputs (no edges, or a
    * constant raster) fail LOUDLY in the ANSI zero-divide, the stated
    * contract (C is undefined there). The oracle gathers the same
    * east/south pairs via +1 self-joins — the independent formulation of
    * the kernel's scatter.
    */
  private[graft] def gearyOf(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                             tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    val (qbar, n) = truncatedQbar(cells)
    haloTilesFromCells(cells, w, h, tileW, tileH)
      .flatMap(t => graft.core.RasterKernel.gearyCells(t.values, t.bx0, t.by0,
        t.bw, t.ox0, t.oy0, t.ow, t.oh, w, h, qbar))
      .toDF("dev2", "diff2", "ne")
      .agg(sum(col("dev2").cast("decimal(38,0)")).as("dss"),
        sum(col("diff2").cast("decimal(38,0)")).as("ess"),
        sum(col("ne")).as("wsum"))
      .select(lit(n).as("n_cells"), col("wsum").as("n_edges"),
        lit(qbar).as("qbar"),
        expr("dss div 1048576").as("dev_ss_q"),
        expr("ess div 1048576").as("diff_ss_q"),
        expr(s"((${n}L - 1L) * ess * 1000000) div (2 * wsum * dss)").as("geary_x1e6"))
  }

  val geary: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    gearyOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Morton (Z-order) block index — the locality-preserving key a 100 TB
    * spatial table is bucketed/sorted by so that 2-D-near cells land in
    * the same file/partition: interleave the 16-bit x and y via the
    * parallel-prefix magic-shift spread (x bits at even positions, y at
    * odd), then aggregate per 16x16 LOCALITY BLOCK (morton div 256 — bit
    * interleaving makes that exactly a 16x16 spatial block). Narrow
    * per-row integer bit arithmetic + ONE map-side-combinable groupBy on
    * the block key — the cheapest distributed shape, and the emitted
    * m_min/m_max per block exhibit the range-query property (a block's
    * codes are a contiguous [block*256, block*256+255] span). The oracle
    * builds the code by the independent BIT-GATHER formulation: sum over
    * bit positions of ((x >> i) & 1) * 4^i + 2 * ((y >> i) & 1) * 4^i.
    */
  val morton: (SparkSession, String) => DataFrame = (spark, dir) => {
    // spread 16-bit v to even bit positions (Morton parallel-prefix)
    def spread(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val s1 = shiftleft(c, 8).bitwiseOR(c).bitwiseAND(lit(0x00FF00FFL))
      val s2 = shiftleft(s1, 4).bitwiseOR(s1).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = shiftleft(s2, 2).bitwiseOR(s2).bitwiseAND(lit(0x33333333L))
      shiftleft(s3, 1).bitwiseOR(s3).bitwiseAND(lit(0x55555555L))
    }
    baseCells(spark, dir)
      .select(col("x").cast("long").as("x"), col("y").cast("long").as("y"),
        floor(col("v") * Q20).cast("long").as("q"))
      .withColumn("morton", spread(col("x")).bitwiseOR(shiftleft(spread(col("y")), 1)))
      .groupBy(expr("morton div 256").as("zblock"))
      .agg(count(lit(1)).as("n_cells"), sum("q").as("q_sum"),
        min("morton").as("m_min"), max("morton").as("m_max"))
      .orderBy("zblock")
  }

  val moran: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    moranOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Local Moran's I (LISA hotspot analysis) — the per-cell companion of
    * [[moranOf]], the statistic a hotspot map is drawn from: for every
    * INTERIOR cell, liq = (dev_c * (dev_N + dev_S + dev_E + dev_W)) div
    * 2^20 against the SAME truncated quantized mean as the global index
    * (one shared driver-side two-column aggregate). Interior-only is a
    * stated contract: every scored cell has exactly four rook neighbours,
    * so no per-cell weight-count normalization forks engine vs oracle at
    * the grid rim. Per-row integer summaries (n_cells, sum, min, max of
    * liq) ride the halo-tiled kernel — zero raster shuffle; the only
    * exchange is the O(tiles x tile-rows) row-partial merge. The oracle
    * GATHERS the four neighbours via +-1 self-joins (vs the kernel's
    * in-tile halo reads) and runs the identical truncating divisions.
    */
  private[graft] def localMoranOf(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                                  tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    val (qbar, _) = truncatedQbar(cells)
    mergeRowStats(haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.localMoranRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h, qbar)))
  }

  val localMoran: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    localMoranOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Getis–Ord Gi* hotspot census — the per-cell neighbourhood-share
    * companion of [[localMoranOf]] (LISA scores deviation clustering, Gi*
    * scores each 5-cell rook-plus-self window's share of the global mass —
    * the statistic a hot/cold-spot map thresholds). Exact fixed-point
    * contract: giq = (win * 10^8) div qtot with qtot the truncated global
    * quantized sum (one tiny driver-side aggregate, the same shape as the
    * Moran mean); the z-score's sqrt is deliberately left out (identical
    * ranking, integer-exact surface). Zero raster shuffle: per-row RowStat
    * partials ride the halo-tiled kernel; the only exchange is the
    * O(tiles x tile-rows) merge. Oracle: +-1 self-join gathers vs the
    * kernel's halo reads.
    */
  private[graft] def getisOf(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                             tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    val tr = cells.toDF("x", "y", "v")
      .agg(sum(floor(col("v") * Q20).cast("decimal(38,0)")).as("s")).head()
    val qtotB = BigInt(tr.getDecimal(0).toBigInteger)
    require(qtotB.isValidLong, s"getis: quantized total $qtotB exceeds Long")
    val qtot = qtotB.toLong
    mergeRowStats(haloTilesFromCells(cells, w, h, tileW, tileH).flatMap(t =>
      graft.core.RasterKernel.getisRows(t.values, t.bx0, t.by0, t.bw,
        t.ox0, t.oy0, t.ow, t.oh, w, h, qtot)))
  }

  val getis: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    getisOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** K-hop horizon for [[costHorizonOf]]; the tile router ships a K-cell
    * halo, so the whole K-round relaxation is ZERO raster shuffle.
    */
  private[graft] val CostRounds = 8
  private[graft] val CostSrcThreshold = 100.0

  /** Cost-distance ISOCHRONE census — the weighted generalization of the
    * L1 distance transform (q_dist_transform): min cost to reach each cell
    * from any source (v >= 100) within K = 8 rook hops, where entering a
    * cell costs its quantized value (floor(v * 2^10) + 2^10 > 0). The
    * bounded horizon is the stated contract (the reach of a K-step
    * traversal — a drive-time ring), and it is what makes the op
    * shuffle-free: [[graft.core.RasterKernel.costHorizonRows]] runs all K
    * synchronous min-plus rounds inside a K-cell-halo tile, so the raster
    * never crosses an exchange — only per-row partials of reached cells
    * do. The oracle unrolls the same K rounds as chained CTEs of
    * 4-direction equi-join gathers (the independent formulation of the
    * kernel's in-buffer sweeps).
    */
  private[graft] def costHorizonOf(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                                   tileW: Int = 50, tileH: Int = 50,
                                   rounds: Int = CostRounds): DataFrame = {
    import cells.sparkSession.implicits._
    require(rounds <= math.min(tileW, tileH),
      s"costHorizon: rounds $rounds exceeds the tile halo capacity")
    haloTilesFromCells(cells, w, h, tileW, tileH, halo = rounds)
      .flatMap(t => graft.core.RasterKernel.costHorizonRows(t.values, t.bx0, t.by0,
        t.bw, t.ox0, t.oy0, t.ow, t.oh, w, h, rounds, CostSrcThreshold))
      .toDF("y", "n", "cs", "cn", "cx")
      .groupBy("y")
      .agg(sum(col("n")).as("n_reached"), sum(col("cs")).as("cost_sum"),
        min(col("cn")).as("cost_min"), max(col("cx")).as("cost_max"))
      .orderBy("y")
  }

  val costHorizon: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    costHorizonOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** The K-round cost FIELD as dense (x, y, cost) cells — the isochrone
    * composition's grid feed (unreached = the CostInf sentinel value).
    * Same K-halo zero-shuffle shape as [[costHorizonOf]].
    */
  private[graft] def costCellsOf(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                                 tileW: Int = 50, tileH: Int = 50,
                                 rounds: Int = CostRounds): Dataset[(Int, Int, Double)] = {
    import cells.sparkSession.implicits._
    require(rounds <= math.min(tileW, tileH),
      s"costCells: rounds $rounds exceeds the tile halo capacity")
    haloTilesFromCells(cells, w, h, tileW, tileH, halo = rounds)
      .flatMap(t => graft.core.RasterKernel.costCellsK(t.values, t.bx0, t.by0,
        t.bw, t.ox0, t.oy0, t.ow, t.oh, w, h, rounds, CostSrcThreshold))
  }

  /** Directional empirical SEMIVARIOGRAM at lags 1/2/4/8, east + south —
    * the geostatistics curve (spatial continuity vs distance) a kriging
    * or tile-size decision reads: gamma(dir, lag) = sum of squared
    * quantized pair differences div (2 * n_pairs), every quantity exact
    * integer. Zero raster shuffle: pairs resolve inside max-lag-halo
    * tiles ([[graft.core.RasterKernel.variogramCells]]); only (idx, d2)
    * contributions feed a map-side-combinable decimal sum on the
    * 8-element key. Oracle: +lag self-join gathers per (dir, lag).
    */
  private[graft] val VarioLags = Seq(1, 2, 4, 8)

  private[graft] def variogramOf(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                                 tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH, halo = VarioLags.max)
      .flatMap(t => graft.core.RasterKernel.variogramCells(t.values, t.bx0, t.by0,
        t.bw, t.ox0, t.oy0, t.ow, t.oh, w, h))
      .toDF("idx", "d2")
      .groupBy("idx")
      .agg(count(lit(1)).as("n_pairs"), sum(col("d2").cast("decimal(38,0)")).as("ss"))
      .select(expr("idx div 4").cast("long").as("dir"),
        expr("shiftleft(1L, idx % 4)").as("lag"),
        col("n_pairs"),
        expr("ss div 1048576").as("d2q"),
        expr("ss div (2 * n_pairs)").as("gamma_q"))
      .orderBy("dir", "lag")
  }

  val variogram: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    variogramOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** Multi-scale Topographic Position Index landform census (Weiss TPI) —
    * the terrain classifier a landform map runs: at window radii r = 1 and
    * r = 2 (scales 1/2), tpi_num = q*K - S over the K = (2r+1)^2 window
    * (center included, q = floor(v * 2^20) PER CELL — the operator is
    * all-integer after the quantize, so no float mean ever crosses the
    * compare), ridge when tpi_num > K * 2^20, valley below -K * 2^20.
    * Zero raster shuffle: both scales ride ONE r = 2 halo tiling
    * ([[graft.core.RasterKernel.tpiRows]] twice per tile); only
    * per-(scale, row) integer partials (census counts + tpi sum) cross the
    * exchange. Oracle: the (scale, r, K) VALUES frame range-join gather.
    */
  private[graft] val TpiRadii = Seq(1, 2)

  private[graft] def tpiOf(cells: Dataset[(Int, Int, Double)], w: Int, h: Int,
                           tileW: Int = 50, tileH: Int = 50): DataFrame = {
    import cells.sparkSession.implicits._
    haloTilesFromCells(cells, w, h, tileW, tileH, halo = TpiRadii.max)
      .flatMap(t => TpiRadii.flatMap(r =>
        graft.core.RasterKernel.tpiRows(t.values, t.bx0, t.by0, t.bw,
          t.ox0, t.oy0, t.ow, t.oh, w, h, r)))
      .toDF("scale", "y", "n", "nr", "nv", "ts")
      .groupBy("scale", "y")
      .agg(sum(col("n")).as("n_cells"), sum(col("nr")).as("n_ridge"),
        sum(col("nv")).as("n_valley"), sum(col("ts")).as("tpi_sum"))
      .orderBy("scale", "y")
  }

  val tpi: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, h) = EventsGrid.dims(spark, dir)
    tpiOf(baseCells(spark, dir).as[(Int, Int, Double)], w, h)
  }

  /** The K unrolled min-plus relaxation CTE rounds over a base CTE `$g`
    * (columns x, y, qc) into `$c0..$cK` — shared by the q_cost_horizon
    * oracle and the isochrone composition's oracle (which renames to
    * avoid colliding with the contour reconstruction's own CTEs).
    * MATERIALIZED throughout: DuckDB otherwise inlines each round's five
    * references exponentially.
    */
  private[graft] def costRoundCtes(g: String, c: String): String =
    (1 to CostRounds).map { r =>
      val p = s"$c${r - 1}"
      s"""$c$r AS MATERIALIZED (SELECT x, y, min(cost) AS cost FROM (
         |  SELECT x, y, cost FROM $p
         |  UNION ALL SELECT $g.x, $g.y, p.cost + $g.qc FROM $p p JOIN $g ON $g.x = p.x + 1 AND $g.y = p.y
         |  UNION ALL SELECT $g.x, $g.y, p.cost + $g.qc FROM $p p JOIN $g ON $g.x = p.x - 1 AND $g.y = p.y
         |  UNION ALL SELECT $g.x, $g.y, p.cost + $g.qc FROM $p p JOIN $g ON $g.x = p.x AND $g.y = p.y + 1
         |  UNION ALL SELECT $g.x, $g.y, p.cost + $g.qc FROM $p p JOIN $g ON $g.x = p.x AND $g.y = p.y - 1
         |) GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")

  /** Hilbert block index — the curve-order upgrade of [[morton]]: the same
    * 100 TB bucketing/sort-key role, but consecutive codes are ALWAYS
    * rook-adjacent cells (Z-order's quadrant jumps are what make Hilbert
    * the better range-scan key, the documented reason Spark itself offers
    * hilbert clustering for OPTIMIZE ZORDER-style layouts). Codes come
    * from the exact integer mask-and-rotate descent
    * ([[graft.core.RasterKernel.hilbertIndex]], bits = 16) in a typed map
    * — the per-row sequential rotate state is the genuinely
    * non-Catalyst-expressible part; everything after is one
    * map-side-combinable groupBy on the 256-code block key. Each block
    * also emits its cell bbox area — the locality evidence (a contiguous
    * curve run stays in a compact spatial window). The oracle is the
    * independent RECURSIVE-CTE formulation: rows iterate the 17 (s, x, y,
    * d) states in SQL and the s = 0 fixpoint carries the code.
    */
  private[graft] val HilbertBits = 16

  val hilbert: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    baseCells(spark, dir)
      .select(col("x"), col("y"), floor(col("v") * Q20).cast("long").as("q"))
      .as[(Int, Int, Long)]
      .map { case (x, y, q) =>
        (graft.core.RasterKernel.hilbertIndex(HilbertBits, x, y), q, x.toLong, y.toLong)
      }
      .toDF("hkey", "q", "x", "y")
      .groupBy(expr("hkey div 256").as("hblock"))
      .agg(count(lit(1)).as("n_cells"), sum("q").as("q_sum"),
        min("hkey").as("h_min"), max("hkey").as("h_max"),
        ((max("x") - min("x") + lit(1L)) * (max("y") - min("y") + lit(1L)))
          .as("bbox_area"))
      .orderBy("hblock")
  }

  /** TILE-SKEW AUDIT — the partition-balance question every 100 TB run
    * asks of its shuffle key, answered exactly over the engine's own
    * 50x50 stitch tiling: per-tile quantized value mass, folded to ONE
    * audit row — tile count, total/max mass, the max/mean imbalance
    * ratio (x1000), and the Gini coefficient of the mass distribution
    * (x1e6) via the q_evt_gini class-telescoped rank-sum (no ranking
    * pass; the cumulative window rides the O(distinct masses) class
    * table — bounded by the TILE REGISTRY, the same cardinality as any
    * per-tile summary, never by rows). Products ride decimal(38,0) and
    * land as loud BIGINT casts. The oracle is the independent textbook
    * row_number rank-sum over the same per-tile masses.
    */
  val tileSkew: (SparkSession, String) => DataFrame = (spark, dir) => {
    val classes = baseCells(spark, dir)
      .groupBy(expr("x div 50").as("tx"), expr("y div 50").as("ty"))
      .agg(sum(floor(col("v") * Q20).cast("long")).as("q"))
      .groupBy("q").agg(count(lit(1)).as("m"))
    val one = pmod(col("q"), lit(1L)) // constant, non-foldable: class table is tile-registry-sized
    val wPre = Window.partitionBy(one).orderBy("q")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(one)
    classes
      .withColumn("o", coalesce(sum(col("m")).over(wPre), lit(0L)))
      .withColumn("nt", sum(col("m")).over(wAll))
      .select(col("m").cast("decimal(38,0)").as("m"),
        col("q").cast("decimal(38,0)").as("q"),
        col("o").cast("decimal(38,0)").as("o"),
        col("nt").cast("decimal(38,0)").as("nt"))
      .agg(max(col("nt")).as("ntd"), sum(col("m") * col("q")).as("tot"),
        max(col("q")).as("mq"),
        sum(col("q") * col("m") * (col("o") * 2 + col("m") - col("nt"))).as("gnum"))
      .select(col("ntd").cast("long").as("n_tiles"),
        col("tot").cast("long").as("q_total"),
        col("mq").cast("long").as("q_max"),
        expr("(mq * ntd * 1000) div tot").cast("long").as("imb_x1000"),
        expr("(gnum * 1000000) div (ntd * tot)").cast("long").as("gini_x1e6"))
  }

  /** Histogram equalization — the classic raster contrast remap: each cell
    * maps to level = (cells-in-strictly-lower-bins * L) div n, the exact
    * integer CDF transform at L = 16 output levels. Input bins are the
    * INTEGER value buckets floor(v) — the StatsOps histogram contract:
    * bounded by the VALUE RANGE, never the row count (the O(range) frame
    * a quantized-class histogram would not give; the events domain is
    * finite by the q_auto_thresholds bucket contract). Plan: one
    * map-side-combinable bin histogram; the CDF runs as a window over the
    * O(range) bin table (single-partition by construction — the same
    * bounded-frame trick as topEvents' rank, via a non-foldable constant
    * partition key); the remap joins cells back to the O(range) level
    * table — explicitly broadcast, correct at any DATA scale because the
    * build side is range-bounded. Output folds to per-raster-row integer
    * summaries: no float anywhere in the operator at all.
    */
  private[graft] val HistEqLevels = 16

  val histEqualize: (SparkSession, String) => DataFrame = (spark, dir) => {
    val cells = baseCells(spark, dir)
      .select(col("x"), col("y"), floor(col("v")).cast("long").as("bin"))
    val hist = cells.groupBy("bin").agg(count(lit(1)).as("cnt"))
    val one = pmod(col("bin"), lit(1L)) // constant, non-foldable: bounded single-partition window
    val wCum = Window.partitionBy(one).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(one)
    val lvl = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wAll))
      .select(col("bin"), expr(s"((cum - cnt) * ${HistEqLevels}L) div total").as("level"))
    cells.join(broadcast(lvl), "bin")
      .groupBy(col("y").cast("long").as("y"))
      .agg(count(lit(1)).as("n_cells"), sum("level").as("lvl_sum"),
        min("level").as("lvl_min"), max("level").as("lvl_max"))
      .orderBy("y")
  }

  // w halves from the constant base W=100 (floor division composes:
  // 100 -> 50 -> 25 -> 12); h halves from the data-dependent base in `d`.
  private[graft] def poolCte(l: Int, prevW: Int): String =
    s"""g$l AS (SELECT x // 2 AS x, y // 2 AS y,
       |  ((max(CASE WHEN x % 2 = 0 AND y % 2 = 0 THEN v END)
       |    + max(CASE WHEN x % 2 = 1 AND y % 2 = 0 THEN v END))
       |   + (max(CASE WHEN x % 2 = 0 AND y % 2 = 1 THEN v END)
       |      + max(CASE WHEN x % 2 = 1 AND y % 2 = 1 THEN v END))) / 4.0 AS v
       |  FROM g${l - 1}, d
       |  WHERE x < 2 * ($prevW // 2) AND y < 2 * ((h // ${1 << (l - 1)}) // 2)
       |  GROUP BY 1, 2)""".stripMargin

  private def statCte(l: Int, w: Int): String =
    s"""s$l AS (SELECT $l::BIGINT AS level, $w::BIGINT AS w,
       |  ((SELECT h FROM d) // ${1 << l})::BIGINT AS h, count(*)::BIGINT AS n_cells,
       |  sum(floor(v * 1048576.0)::BIGINT)::BIGINT AS qsum,
       |  min(floor(v * 1048576.0)::BIGINT) AS qmin,
       |  max(floor(v * 1048576.0)::BIGINT) AS qmax FROM g$l)""".stripMargin

  val oracleSql: Map[String, String] = {
    val ws = Iterator.iterate(100)(_ / 2).take(Levels + 1).toSeq // 100, 50, 25, 12
    val pools = (1 to Levels).map(l => poolCte(l, ws(l - 1)))
    val stats = (0 to Levels).map(l => statCte(l, ws(l)))
    // slot o of the engine's pivot holds the value at (x - dx_o, y - dy_o),
    // dx = o%3 - 1, dy = o/3 - 1 (cells replicate BY +offset, so the slot
    // labeling is the mirrored window — same 3x3 set, fixed order)
    val slotJoins = (0 to 8).filter(_ != 4).map { o =>
      val dx = o % 3 - 1; val dy = o / 3 - 1
      s"JOIN g b$o ON b$o.x = t.x - ($dx) AND b$o.y = t.y - ($dy)"
    }.mkString("\n  ")
    val slotJoins1 = (0 to 8).filter(_ != 4).map { o =>
      val dx = o % 3 - 1; val dy = o / 3 - 1
      s"JOIN g1 b$o ON b$o.x = t.x - ($dx) AND b$o.y = t.y - ($dy)"
    }.mkString("\n  ")
    // one synchronous min-plus round per CTE: keep-or-improve via the four
    // gathered rook neighbours (the unrolled counterpart of the kernel's
    // in-buffer sweep; c_r's support is exactly the <= r-hop reach)
    val costCtes = costRoundCtes("g", "c")
    Map(
      // histogram equalization: the CDF runs as plain window SQL over the
      // integer-bin histogram; the remap is the same equi-join gathered the
      // other way — every quantity a BIGINT (HUGEINT sums cast at the end)
      "q_hist_equalize" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y,
           |             floor(value)::BIGINT AS bin FROM events),
           |h AS (SELECT bin, count(*)::BIGINT AS cnt FROM g GROUP BY 1),
           |l AS (SELECT bin,
           |        (((sum(cnt) OVER (ORDER BY bin) - cnt) * $HistEqLevels)
           |          // (sum(cnt) OVER ()))::BIGINT AS level FROM h)
           |SELECT g.y::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(l.level)::BIGINT AS lvl_sum, min(l.level)::BIGINT AS lvl_min,
           |  max(l.level)::BIGINT AS lvl_max
           |FROM g JOIN l USING (bin) GROUP BY 1 ORDER BY 1""".stripMargin,

      // Moran's I: the oracle gathers east/south rook pairs via +1
      // self-joins (vs the kernel's scatter), sums in HUGEINT, and runs
      // the same truncated-mean / truncated-div fixed-point arithmetic
      "q_moran" ->
        """WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |m AS (SELECT (sum(q) // count(*))::BIGINT AS qbar, count(*)::BIGINT AS n FROM g),
          |dv AS (SELECT x, y, q - (SELECT qbar FROM m) AS dev FROM g),
          |e AS (SELECT a.dev * b.dev AS p FROM dv a JOIN dv b ON b.x = a.x + 1 AND b.y = a.y
          |      UNION ALL
          |      SELECT a.dev * b.dev FROM dv a JOIN dv b ON b.x = a.x AND b.y = a.y + 1),
          |agg AS (SELECT count(*)::BIGINT AS w, sum(p) AS css FROM e),
          |d2 AS (SELECT sum(dev * dev) AS dss FROM dv)
          |SELECT m.n AS n_cells, agg.w AS n_edges, m.qbar AS qbar,
          |  (d2.dss // 1048576)::BIGINT AS dev_ss_q, (agg.css // 1048576)::BIGINT AS cross_ss_q,
          |  ((m.n * agg.css * 1000000) // (agg.w * d2.dss))::BIGINT AS moran_x1e6
          |FROM m, agg, d2""".stripMargin,

      // Geary's C: east/south squared neighbour differences gathered via
      // +1 self-joins (vs the kernel's scatter), HUGEINT sums, the same
      // truncated-mean / truncating-division fixed point
      "q_geary" ->
        """WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |m AS (SELECT (sum(q) // count(*))::BIGINT AS qbar, count(*)::BIGINT AS n FROM g),
          |e AS (SELECT (a.q - b.q) * (a.q - b.q) AS d2
          |      FROM g a JOIN g b ON b.x = a.x + 1 AND b.y = a.y
          |      UNION ALL
          |      SELECT (a.q - b.q) * (a.q - b.q)
          |      FROM g a JOIN g b ON b.x = a.x AND b.y = a.y + 1),
          |agg AS (SELECT count(*)::BIGINT AS ne, sum(d2) AS ess FROM e),
          |ds AS (SELECT sum((q - (SELECT qbar FROM m)) * (q - (SELECT qbar FROM m))) AS dss FROM g)
          |SELECT m.n AS n_cells, agg.ne AS n_edges, m.qbar AS qbar,
          |  (ds.dss // 1048576)::BIGINT AS dev_ss_q,
          |  (agg.ess // 1048576)::BIGINT AS diff_ss_q,
          |  (((m.n - 1) * agg.ess * 1000000) // (2 * agg.ne * ds.dss))::BIGINT AS geary_x1e6
          |FROM m, agg, ds""".stripMargin,

      // Morton block index: the oracle builds each code by the BIT-GATHER
      // formulation (per-bit cross join against a 16-row power table) —
      // the independent counterpart of the engine's magic-shift spread
      "q_morton" ->
        """WITH g AS (SELECT (event_id % 100)::BIGINT AS x, (event_id // 100)::BIGINT AS y,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |b AS (SELECT i, (1::BIGINT << (2 * i)::INT) AS p4
          |      FROM (SELECT unnest(range(0, 16)) AS i)),
          |mc AS (SELECT g.x, g.y, min(g.q) AS q,
          |         sum(((g.x >> b.i::INT) & 1) * b.p4
          |             + ((g.y >> b.i::INT) & 1) * 2 * b.p4)::BIGINT AS morton
          |       FROM g CROSS JOIN b GROUP BY g.x, g.y)
          |SELECT (morton // 256)::BIGINT AS zblock, count(*)::BIGINT AS n_cells,
          |  sum(q)::BIGINT AS q_sum, min(morton)::BIGINT AS m_min,
          |  max(morton)::BIGINT AS m_max
          |FROM mc GROUP BY 1 ORDER BY 1""".stripMargin,

      // Laplacian: the four rook neighbours gathered per interior cell by
      // +-1 self-joins — the gather formulation of the kernel's halo reads
      "q_laplacian" ->
        """WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
          |li AS (SELECT c.x, c.y,
          |         (nn.q + ss.q + ee.q + ww.q - 4 * c.q)::BIGINT AS lap
          |       FROM g c
          |       JOIN g nn ON nn.x = c.x AND nn.y = c.y - 1
          |       JOIN g ss ON ss.x = c.x AND ss.y = c.y + 1
          |       JOIN g ee ON ee.x = c.x + 1 AND ee.y = c.y
          |       JOIN g ww ON ww.x = c.x - 1 AND ww.y = c.y
          |       WHERE c.x BETWEEN 1 AND 98
          |         AND c.y BETWEEN 1 AND (SELECT h FROM d) - 2)
          |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells, sum(lap)::BIGINT AS qsum,
          |  min(lap)::BIGINT AS qmin, max(lap)::BIGINT AS qmax
          |FROM li GROUP BY 1 ORDER BY 1""".stripMargin,

      // binomial 5x5 blur: the oracle runs the SEPARABLE formulation —
      // a 1-4-6-4-1 row pass, then the same pass down columns of the row
      // results — vs the kernel's direct 25-term sum; quantize-first
      // makes both exact integers, so the separability identity is the
      // thing under test
      "q_blur5" ->
        """WITH g AS MATERIALIZED (SELECT (event_id % 100)::INT AS x,
          |             (event_id // 100)::INT AS y,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
          |r AS MATERIALIZED (SELECT m.x, m.y,
          |         (l2.q + 4 * l1.q + 6 * m.q + 4 * r1.q + r2.q)::BIGINT AS rq
          |       FROM g m
          |       JOIN g l2 ON l2.y = m.y AND l2.x = m.x - 2
          |       JOIN g l1 ON l1.y = m.y AND l1.x = m.x - 1
          |       JOIN g r1 ON r1.y = m.y AND r1.x = m.x + 1
          |       JOIN g r2 ON r2.y = m.y AND r2.x = m.x + 2
          |       WHERE m.x BETWEEN 2 AND 97),
          |li AS (SELECT m.y,
          |         (u2.rq + 4 * u1.rq + 6 * m.rq + 4 * d1.rq + d2.rq)::BIGINT AS blur
          |       FROM r m
          |       JOIN r u2 ON u2.x = m.x AND u2.y = m.y - 2
          |       JOIN r u1 ON u1.x = m.x AND u1.y = m.y - 1
          |       JOIN r d1 ON d1.x = m.x AND d1.y = m.y + 1
          |       JOIN r d2 ON d2.x = m.x AND d2.y = m.y + 2
          |       WHERE m.y BETWEEN 2 AND (SELECT h FROM d) - 3)
          |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells, sum(blur)::BIGINT AS qsum,
          |  min(blur)::BIGINT AS qmin, max(blur)::BIGINT AS qmax
          |FROM li GROUP BY 1 ORDER BY 1""".stripMargin,

      // saddle census: the eight ring neighbours gathered by the fixed
      // +-1 self-joins; cyclic sign changes of (neighbour > center) as
      // eight XOR-pair CASE terms in the SAME N, NE, E, SE, S, SW, W, NW
      // ring order as the kernel
      "q_saddle_points" ->
        """WITH g AS MATERIALIZED (SELECT (event_id % 100)::INT AS x,
          |             (event_id // 100)::INT AS y,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
          |li AS (SELECT c.y, c.q,
          |         ((CASE WHEN (n0.q > c.q) <> (n1.q > c.q) THEN 1 ELSE 0 END)
          |        + (CASE WHEN (n1.q > c.q) <> (n2.q > c.q) THEN 1 ELSE 0 END)
          |        + (CASE WHEN (n2.q > c.q) <> (n3.q > c.q) THEN 1 ELSE 0 END)
          |        + (CASE WHEN (n3.q > c.q) <> (n4.q > c.q) THEN 1 ELSE 0 END)
          |        + (CASE WHEN (n4.q > c.q) <> (n5.q > c.q) THEN 1 ELSE 0 END)
          |        + (CASE WHEN (n5.q > c.q) <> (n6.q > c.q) THEN 1 ELSE 0 END)
          |        + (CASE WHEN (n6.q > c.q) <> (n7.q > c.q) THEN 1 ELSE 0 END)
          |        + (CASE WHEN (n7.q > c.q) <> (n0.q > c.q) THEN 1 ELSE 0 END)) AS changes
          |       FROM g c
          |       JOIN g n0 ON n0.x = c.x     AND n0.y = c.y - 1
          |       JOIN g n1 ON n1.x = c.x + 1 AND n1.y = c.y - 1
          |       JOIN g n2 ON n2.x = c.x + 1 AND n2.y = c.y
          |       JOIN g n3 ON n3.x = c.x + 1 AND n3.y = c.y + 1
          |       JOIN g n4 ON n4.x = c.x     AND n4.y = c.y + 1
          |       JOIN g n5 ON n5.x = c.x - 1 AND n5.y = c.y + 1
          |       JOIN g n6 ON n6.x = c.x - 1 AND n6.y = c.y
          |       JOIN g n7 ON n7.x = c.x - 1 AND n7.y = c.y - 1
          |       WHERE c.x BETWEEN 1 AND 98
          |         AND c.y BETWEEN 1 AND (SELECT h FROM d) - 2)
          |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells,
          |  sum(CASE WHEN changes >= 4 THEN 1 ELSE 0 END)::BIGINT AS n_saddles,
          |  sum(CASE WHEN changes >= 4 THEN q ELSE 0 END)::BIGINT AS qs_sum
          |FROM li GROUP BY 1 ORDER BY 1""".stripMargin,

      // LBP texture histogram: the eight window slots gathered per
      // interior cell by the fixed +-1 self-joins, bits summed as CASE
      // terms — the gather formulation of the kernel's halo-read pack
      "q_lbp_hist" ->
        """WITH g AS MATERIALIZED (SELECT (event_id % 100)::INT AS x,
          |             (event_id // 100)::INT AS y,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
          |li AS (SELECT c.q,
          |         ((CASE WHEN s0.q > c.q THEN 1 ELSE 0 END)
          |        + (CASE WHEN s1.q > c.q THEN 2 ELSE 0 END)
          |        + (CASE WHEN s2.q > c.q THEN 4 ELSE 0 END)
          |        + (CASE WHEN s3.q > c.q THEN 8 ELSE 0 END)
          |        + (CASE WHEN s5.q > c.q THEN 16 ELSE 0 END)
          |        + (CASE WHEN s6.q > c.q THEN 32 ELSE 0 END)
          |        + (CASE WHEN s7.q > c.q THEN 64 ELSE 0 END)
          |        + (CASE WHEN s8.q > c.q THEN 128 ELSE 0 END))::BIGINT AS code
          |       FROM g c
          |       JOIN g s0 ON s0.x = c.x + 1 AND s0.y = c.y + 1
          |       JOIN g s1 ON s1.x = c.x     AND s1.y = c.y + 1
          |       JOIN g s2 ON s2.x = c.x - 1 AND s2.y = c.y + 1
          |       JOIN g s3 ON s3.x = c.x + 1 AND s3.y = c.y
          |       JOIN g s5 ON s5.x = c.x - 1 AND s5.y = c.y
          |       JOIN g s6 ON s6.x = c.x + 1 AND s6.y = c.y - 1
          |       JOIN g s7 ON s7.x = c.x     AND s7.y = c.y - 1
          |       JOIN g s8 ON s8.x = c.x - 1 AND s8.y = c.y - 1
          |       WHERE c.x BETWEEN 1 AND 98
          |         AND c.y BETWEEN 1 AND (SELECT h FROM d) - 2)
          |SELECT code, count(*)::BIGINT AS n_cells, sum(q)::BIGINT AS qc_sum
          |FROM li GROUP BY 1 ORDER BY 1""".stripMargin,

      // critical points: the eight window slots gathered per interior
      // cell by the fixed +-1 self-joins; strictness as conjunctive
      // compares over the same quantized values
      "q_critical_points" ->
        """WITH g AS MATERIALIZED (SELECT (event_id % 100)::INT AS x,
          |             (event_id // 100)::INT AS y,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
          |li AS (SELECT c.y, c.q,
          |         (s0.q < c.q AND s1.q < c.q AND s2.q < c.q AND s3.q < c.q
          |          AND s5.q < c.q AND s6.q < c.q AND s7.q < c.q AND s8.q < c.q) AS ismax,
          |         (s0.q > c.q AND s1.q > c.q AND s2.q > c.q AND s3.q > c.q
          |          AND s5.q > c.q AND s6.q > c.q AND s7.q > c.q AND s8.q > c.q) AS ismin
          |       FROM g c
          |       JOIN g s0 ON s0.x = c.x + 1 AND s0.y = c.y + 1
          |       JOIN g s1 ON s1.x = c.x     AND s1.y = c.y + 1
          |       JOIN g s2 ON s2.x = c.x - 1 AND s2.y = c.y + 1
          |       JOIN g s3 ON s3.x = c.x + 1 AND s3.y = c.y
          |       JOIN g s5 ON s5.x = c.x - 1 AND s5.y = c.y
          |       JOIN g s6 ON s6.x = c.x + 1 AND s6.y = c.y - 1
          |       JOIN g s7 ON s7.x = c.x     AND s7.y = c.y - 1
          |       JOIN g s8 ON s8.x = c.x - 1 AND s8.y = c.y - 1
          |       WHERE c.x BETWEEN 1 AND 98
          |         AND c.y BETWEEN 1 AND (SELECT h FROM d) - 2)
          |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells,
          |  sum(CASE WHEN ismax THEN 1 ELSE 0 END)::BIGINT AS n_maxima,
          |  sum(CASE WHEN ismin THEN 1 ELSE 0 END)::BIGINT AS n_minima,
          |  sum(CASE WHEN ismax OR ismin THEN q ELSE 0 END)::BIGINT AS qx_sum
          |FROM li GROUP BY 1 ORDER BY 1""".stripMargin,

      // local Moran (LISA): the four rook neighbours gathered per interior
      // cell via +-1 self-joins, the same truncated qbar and truncating
      // per-cell division, summarized per grid row
      "q_local_moran" ->
        """WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
          |m AS (SELECT (sum(q) // count(*))::BIGINT AS qbar FROM g),
          |dv AS (SELECT x, y, q - (SELECT qbar FROM m) AS dev FROM g),
          |li AS (SELECT c.x, c.y,
          |         ((c.dev * (nn.dev + ss.dev + ee.dev + ww.dev)) // 1048576)::BIGINT AS liq
          |       FROM dv c
          |       JOIN dv nn ON nn.x = c.x AND nn.y = c.y - 1
          |       JOIN dv ss ON ss.x = c.x AND ss.y = c.y + 1
          |       JOIN dv ee ON ee.x = c.x + 1 AND ee.y = c.y
          |       JOIN dv ww ON ww.x = c.x - 1 AND ww.y = c.y
          |       WHERE c.x BETWEEN 1 AND 98
          |         AND c.y BETWEEN 1 AND (SELECT h FROM d) - 2)
          |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells, sum(liq)::BIGINT AS qsum,
          |  min(liq)::BIGINT AS qmin, max(liq)::BIGINT AS qmax
          |FROM li GROUP BY 1 ORDER BY 1""".stripMargin,

      // Getis-Ord Gi*: the 5-cell rook-plus-self window gathered per
      // interior cell via +-1 self-joins, divided (truncating) into the
      // global quantized total — the independent formulation of the
      // kernel's halo-read scatter
      "q_getis" ->
        """WITH g AS MATERIALIZED (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
          |t AS MATERIALIZED (SELECT sum(q)::BIGINT AS qtot FROM g),
          |gi AS (SELECT c.x, c.y,
          |         (((c.q + nn.q + ss.q + ee.q + ww.q) * 100000000)
          |           // t.qtot)::BIGINT AS giq
          |       FROM g c
          |       JOIN g nn ON nn.x = c.x AND nn.y = c.y - 1
          |       JOIN g ss ON ss.x = c.x AND ss.y = c.y + 1
          |       JOIN g ee ON ee.x = c.x + 1 AND ee.y = c.y
          |       JOIN g ww ON ww.x = c.x - 1 AND ww.y = c.y
          |       CROSS JOIN t
          |       WHERE c.x BETWEEN 1 AND 98
          |         AND c.y BETWEEN 1 AND (SELECT h FROM d) - 2)
          |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells, sum(giq)::BIGINT AS qsum,
          |  min(giq)::BIGINT AS qmin, max(giq)::BIGINT AS qmax
          |FROM gi GROUP BY 1 ORDER BY 1""".stripMargin,

      // Hilbert block index: the oracle walks the 17 mask-and-rotate
      // states per cell through a RECURSIVE CTE (vs the engine's in-row
      // loop) — the s = 0 fixpoint row carries the finished code
      "q_hilbert" ->
        """WITH RECURSIVE g AS (SELECT (event_id % 100)::INT AS cx, (event_id // 100)::INT AS cy,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |hil(cx, cy, q, x, y, d, s) AS (
          |  SELECT cx, cy, q, cx::BIGINT, cy::BIGINT, 0::BIGINT, 32768::BIGINT FROM g
          |  UNION ALL
          |  SELECT cx, cy, q,
          |    CASE WHEN (y & s) = 0
          |         THEN (CASE WHEN (x & s) > 0 THEN 65535 - y ELSE y END)
          |         ELSE x END,
          |    CASE WHEN (y & s) = 0
          |         THEN (CASE WHEN (x & s) > 0 THEN 65535 - x ELSE x END)
          |         ELSE y END,
          |    d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END)::BIGINT,
          |                    (CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END)::BIGINT),
          |    s // 2
          |  FROM hil WHERE s > 0),
          |hc AS (SELECT cx, cy, q, d AS hkey FROM hil WHERE s = 0)
          |SELECT (hkey // 256)::BIGINT AS hblock, count(*)::BIGINT AS n_cells,
          |  sum(q)::BIGINT AS q_sum, min(hkey)::BIGINT AS h_min, max(hkey)::BIGINT AS h_max,
          |  ((max(cx) - min(cx) + 1) * (max(cy) - min(cy) + 1))::BIGINT AS bbox_area
          |FROM hc GROUP BY 1 ORDER BY 1""".stripMargin,

      // tile skew: the textbook row_number rank-sum Gini over the same
      // per-tile masses (ties broken by (q, tx, ty) — rank-assignment
      // invariant, so it matches the engine's class-telescoped form)
      "q_tile_skew" ->
        """WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |tl AS (SELECT x // 50 AS tx, y // 50 AS ty, sum(q)::BIGINT AS q
          |       FROM g GROUP BY 1, 2),
          |r AS (SELECT q, row_number() OVER (ORDER BY q, tx, ty) AS rn FROM tl),
          |n AS (SELECT count(*)::BIGINT AS nt, sum(q)::BIGINT AS tot,
          |             max(q)::BIGINT AS mq FROM tl)
          |SELECT n.nt AS n_tiles, n.tot AS q_total, n.mq AS q_max,
          |  ((n.mq * n.nt * 1000) // n.tot)::BIGINT AS imb_x1000,
          |  ((sum((2 * rn - n.nt - 1) * q) * 1000000) // (n.nt * n.tot))::BIGINT AS gini_x1e6
          |FROM r CROSS JOIN n GROUP BY n.nt, n.tot, n.mq""".stripMargin,

      // TPI: range-join window gathers per (scale, r, K) VALUES row — the
      // gather formulation of the kernel's in-halo window sums; center
      // included both sides (tpi = q*K - sum(window)), pure integer
      "q_tpi" ->
        """WITH g AS MATERIALIZED (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y,
          |             floor(value * 1048576.0)::BIGINT AS q FROM events),
          |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
          |s(scale, r, k) AS (VALUES (1, 1, 9), (2, 2, 25)),
          |t AS (SELECT s.scale, s.k, c.y, c.q * s.k - sum(n.q) AS tpi
          |      FROM g c CROSS JOIN s
          |      JOIN g n ON n.x >= c.x - s.r AND n.x <= c.x + s.r
          |              AND n.y >= c.y - s.r AND n.y <= c.y + s.r
          |      WHERE c.x >= s.r AND c.x <= 99 - s.r
          |        AND c.y >= s.r AND c.y <= (SELECT h FROM d) - 1 - s.r
          |      GROUP BY s.scale, s.k, c.x, c.y, c.q)
          |SELECT scale::BIGINT AS scale, y::BIGINT AS y, count(*)::BIGINT AS n_cells,
          |  sum(CASE WHEN tpi > k * 1048576 THEN 1 ELSE 0 END)::BIGINT AS n_ridge,
          |  sum(CASE WHEN tpi < -(k * 1048576) THEN 1 ELSE 0 END)::BIGINT AS n_valley,
          |  sum(tpi)::BIGINT AS tpi_sum
          |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // variogram: +lag self-join gathers per (dir, lag) — the gather
      // formulation of the kernel's in-halo reads; HUGEINT sums, the
      // same truncating divisions
      "q_variogram" -> {
        val pairs = VarioLags.flatMap(l => Seq(
          s"""SELECT 0::BIGINT AS dir, ${l}::BIGINT AS lag, (a.q - b.q) * (a.q - b.q) AS d2
             |      FROM g a JOIN g b ON b.x = a.x + $l AND b.y = a.y""".stripMargin,
          s"""SELECT 1::BIGINT AS dir, ${l}::BIGINT AS lag, (a.q - b.q) * (a.q - b.q) AS d2
             |      FROM g a JOIN g b ON b.x = a.x AND b.y = a.y + $l""".stripMargin))
          .mkString("\n      UNION ALL ")
        s"""WITH g AS MATERIALIZED (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y,
           |             floor(value * 1048576.0)::BIGINT AS q FROM events),
           |p AS ($pairs)
           |SELECT dir, lag, count(*)::BIGINT AS n_pairs,
           |  (sum(d2) // 1048576)::BIGINT AS d2q,
           |  (sum(d2) // (2 * count(*)))::BIGINT AS gamma_q
           |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      },

      // cost horizon: sources at cost 0, K unrolled min-plus rounds, the
      // per-row census over the round-K reach
      "q_cost_horizon" ->
        s"""WITH g AS MATERIALIZED (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y,
           |             value AS v, (floor(value * 1024.0)::BIGINT + 1024) AS qc FROM events),
           |c0 AS MATERIALIZED (SELECT x, y, 0::BIGINT AS cost FROM g WHERE v >= $CostSrcThreshold),
           |$costCtes
           |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_reached,
           |  sum(cost)::BIGINT AS cost_sum, min(cost)::BIGINT AS cost_min,
           |  max(cost)::BIGINT AS cost_max
           |FROM c$CostRounds GROUP BY 1 ORDER BY 1""".stripMargin,

      // CC labeling on the level-2 overview: the oracle derives g2 via the
      // same pool CTEs as q_grid_pyramid, builds the 4-adjacency edge list
      // per threshold, and takes min reachable cell id per node by a
      // recursive reachability closure (quadratic in component size —
      // level 2 keeps that bounded; the engine's tile-contracted hash-min
      // is the independent scalable formulation)
      "q_grid_cc" ->
        s"""WITH RECURSIVE g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |${poolCte(1, 100)},
           |${poolCte(2, 50)},
           |m AS (SELECT t.ti, t.threshold, (y * 25 + x)::BIGINT AS id, x, y
           |      FROM g2 CROSS JOIN (VALUES (0, 25.0::DOUBLE), (1, 50.0::DOUBLE),
           |        (2, 75.0::DOUBLE), (3, 100.0::DOUBLE)) t(ti, threshold)
           |      WHERE v >= t.threshold),
           |e0 AS (SELECT a.ti, a.id AS src, b.id AS dst FROM m a JOIN m b
           |       ON b.ti = a.ti AND ((b.x = a.x + 1 AND b.y = a.y)
           |                        OR (b.x = a.x AND b.y = a.y + 1))),
           |e AS (SELECT ti, src, dst FROM e0 UNION ALL SELECT ti, dst, src FROM e0),
           |reach(ti, node, lbl) AS (
           |  SELECT ti, id, id FROM m
           |  UNION
           |  SELECT e.ti, e.dst, r.lbl FROM reach r
           |  JOIN e ON e.ti = r.ti AND e.src = r.node),
           |cc AS (SELECT ti, node, min(lbl) AS flbl FROM reach GROUP BY 1, 2),
           |sz AS (SELECT ti, flbl, count(*)::BIGINT AS csize FROM cc GROUP BY 1, 2)
           |SELECT any_value(m.threshold) AS threshold,
           |  sum(sz.csize)::BIGINT AS n_cells, count(*)::BIGINT AS n_components,
           |  max(sz.csize)::BIGINT AS max_size, sum(sz.flbl)::BIGINT AS lbl_sum
           |FROM sz JOIN (SELECT DISTINCT ti, threshold FROM m) m ON m.ti = sz.ti
           |GROUP BY sz.ti ORDER BY threshold""".stripMargin,

      // band adjacency: the level-2 pooling, band = indicator sum over
      // the ladder, rook pairs by coordinate joins (the x/y formulation
      // of the engine's guarded id arithmetic)
      // GLCM: quantized values, global min/max scalar, 16 integer gray
      // levels, the two shift joins (right guarded at the row end, down
      // wrap-free), unordered pair fold + the exact contrast column
      "q_glcm" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |q AS (SELECT x, (y * 100 + x)::BIGINT AS id,
           |        floor(v * 1048576.0)::BIGINT AS qv FROM g),
           |mm AS (SELECT min(qv) AS mn, max(qv) AS mx FROM q),
           |a AS (SELECT x, id, ((qv - mn) * 16) // (mx - mn + 1) AS gl
           |      FROM q CROSS JOIN mm),
           |pairs AS (
           |  SELECT least(l.gl, r.gl) AS g_lo, greatest(l.gl, r.gl) AS g_hi, l.id
           |  FROM a l JOIN a r ON r.id = l.id + 1 WHERE l.x < 99
           |  UNION ALL
           |  SELECT least(l.gl, d.gl), greatest(l.gl, d.gl), l.id
           |  FROM a l JOIN a d ON d.id = l.id + 100)
           |SELECT g_lo::BIGINT AS g_lo, g_hi::BIGINT AS g_hi,
           |  count(*)::BIGINT AS n_pairs, sum(id)::BIGINT AS id_sum,
           |  ((g_hi - g_lo) * (g_hi - g_lo) * count(*))::BIGINT AS contrast
           |FROM pairs GROUP BY g_lo, g_hi ORDER BY 1, 2""".stripMargin,

      // GLCM scalar rollup: the q_glcm CTE chain folded once more —
      // energy numerator, per-pair-cell truncated homogeneity, contrast
      "q_glcm_stats" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |q AS (SELECT x, (y * 100 + x)::BIGINT AS id,
           |        floor(v * 1048576.0)::BIGINT AS qv FROM g),
           |mm AS (SELECT min(qv) AS mn, max(qv) AS mx FROM q),
           |a AS (SELECT x, id, ((qv - mn) * 16) // (mx - mn + 1) AS gl
           |      FROM q CROSS JOIN mm),
           |pairs AS (
           |  SELECT least(l.gl, r.gl) AS g_lo, greatest(l.gl, r.gl) AS g_hi
           |  FROM a l JOIN a r ON r.id = l.id + 1 WHERE l.x < 99
           |  UNION ALL
           |  SELECT least(l.gl, d.gl), greatest(l.gl, d.gl)
           |  FROM a l JOIN a d ON d.id = l.id + 100),
           |c AS (SELECT g_lo, g_hi, count(*)::BIGINT AS n_pairs,
           |        (g_hi - g_lo)::BIGINT AS d
           |      FROM pairs GROUP BY 1, 2)
           |SELECT sum(n_pairs)::BIGINT AS t_pairs, count(*)::BIGINT AS n_levels,
           |  sum(n_pairs * n_pairs)::BIGINT AS energy_num,
           |  sum((n_pairs * 1000) // (1 + d))::BIGINT AS hom_milli,
           |  sum(d * d * n_pairs)::BIGINT AS contrast_sum
           |FROM c""".stripMargin,

      // white top-hat: quantize, two-stage least/greatest gather (erode
      // then dilate of the eroded field), digit-count fold on q - opening
      "q_tophat" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |q AS (SELECT x, y, floor(v * 1048576.0)::BIGINT AS q FROM g),
           |e AS (SELECT t.x, t.y,
           |  least(b0.q, b1.q, b2.q, b3.q, t.q, b5.q, b6.q, b7.q, b8.q) AS e
           |  FROM q t
           |  ${(0 to 8).filter(_ != 4).map { o =>
                val dx = o % 3 - 1; val dy = o / 3 - 1
                s"JOIN q b$o ON b$o.x = t.x - ($dx) AND b$o.y = t.y - ($dy)"
              }.mkString("\n  ")}
           |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
           |f AS (SELECT t.x, t.y, t.q,
           |  greatest(c0.e, c1.e, c2.e, c3.e, c4.e, c5.e, c6.e, c7.e, c8.e) AS o
           |  FROM q t
           |  ${(0 to 8).map { o =>
                val dx = o % 3 - 1; val dy = o / 3 - 1
                s"JOIN e c$o ON c$o.x = t.x - ($dx) AND c$o.y = t.y - ($dy)"
              }.mkString("\n  ")}
           |  WHERE t.x BETWEEN 2 AND 97 AND t.y BETWEEN 2 AND (SELECT h FROM d) - 3),
           |k AS (SELECT (y * 100 + x)::BIGINT AS id, q - o AS th FROM f)
           |SELECT (length(bin(th + 1)) - 1)::BIGINT AS th_bucket,
           |  count(*)::BIGINT AS n_cells, sum(th)::BIGINT AS th_sum,
           |  sum(id)::BIGINT AS id_sum
           |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_band_adjacency" ->
        s"""WITH g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |${poolCte(1, 100)},
           |${poolCte(2, 50)},
           |b AS (SELECT x, y, (y * 25 + x)::BIGINT AS id,
           |        ((v >= 25.0)::INT + (v >= 50.0)::INT + (v >= 75.0)::INT
           |          + (v >= 100.0)::INT)::BIGINT AS bd
           |      FROM g2),
           |pr AS (SELECT a.id, least(a.bd, c.bd) AS band_lo,
           |         greatest(a.bd, c.bd) AS band_hi
           |       FROM b a JOIN b c ON c.x = a.x + 1 AND c.y = a.y
           |       UNION ALL
           |       SELECT a.id, least(a.bd, c.bd), greatest(a.bd, c.bd)
           |       FROM b a JOIN b c ON c.x = a.x AND c.y = a.y + 1)
           |SELECT band_lo, band_hi, count(*)::BIGINT AS n_pairs,
           |  sum(id)::BIGINT AS id_sum
           |FROM pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // percolation: the same recursive reachability closure as
      // q_grid_cc, per-label bounding boxes by id arithmetic, spanning
      // classification against the level-2 extents
      "q_percolation" ->
        s"""WITH RECURSIVE g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |${poolCte(1, 100)},
           |${poolCte(2, 50)},
           |hm AS (SELECT max(y) AS my FROM g2),
           |m AS (SELECT t.ti, t.threshold, (y * 25 + x)::BIGINT AS id, x, y
           |      FROM g2 CROSS JOIN (VALUES (0, 25.0::DOUBLE), (1, 50.0::DOUBLE),
           |        (2, 75.0::DOUBLE), (3, 100.0::DOUBLE)) t(ti, threshold)
           |      WHERE v >= t.threshold),
           |e0 AS (SELECT a.ti, a.id AS src, b.id AS dst FROM m a JOIN m b
           |       ON b.ti = a.ti AND ((b.x = a.x + 1 AND b.y = a.y)
           |                        OR (b.x = a.x AND b.y = a.y + 1))),
           |e AS (SELECT ti, src, dst FROM e0 UNION ALL SELECT ti, dst, src FROM e0),
           |reach(ti, node, lbl) AS (
           |  SELECT ti, id, id FROM m
           |  UNION
           |  SELECT e.ti, e.dst, r.lbl FROM reach r
           |  JOIN e ON e.ti = r.ti AND e.src = r.node),
           |cc AS (SELECT ti, node, min(lbl) AS flbl FROM reach GROUP BY 1, 2),
           |per AS (SELECT ti, flbl, count(*)::BIGINT AS sz,
           |          min(node % 25) = 0 AND max(node % 25) = 24 AS sh,
           |          min(node // 25) = 0
           |            AND max(node // 25) = (SELECT my FROM hm) AS sv
           |        FROM cc GROUP BY 1, 2),
           |t(ti, threshold) AS (VALUES (0, 25.0::DOUBLE), (1, 50.0::DOUBLE),
           |  (2, 75.0::DOUBLE), (3, 100.0::DOUBLE))
           |SELECT t.threshold, count(*)::BIGINT AS n_components,
           |  sum(sh::INT)::BIGINT AS n_span_h,
           |  sum(sv::INT)::BIGINT AS n_span_v,
           |  max(CASE WHEN sh OR sv THEN sz ELSE 0 END)::BIGINT AS span_max_size,
           |  sum(CASE WHEN sh OR sv THEN flbl ELSE 0 END)::BIGINT AS span_lbl_sum
           |FROM per JOIN t USING (ti) GROUP BY 1 ORDER BY 1""".stripMargin,

      // component nesting: the same recursive reachability closure as
      // q_grid_cc, then adjacent-level labels paired per CELL, distinct
      // -> component links, and the containment census per pair
      "q_cc_nesting" ->
        s"""WITH RECURSIVE g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |${poolCte(1, 100)},
           |${poolCte(2, 50)},
           |m AS (SELECT t.ti, t.threshold, (y * 25 + x)::BIGINT AS id, x, y
           |      FROM g2 CROSS JOIN (VALUES (0, 25.0::DOUBLE), (1, 50.0::DOUBLE),
           |        (2, 75.0::DOUBLE), (3, 100.0::DOUBLE)) t(ti, threshold)
           |      WHERE v >= t.threshold),
           |e0 AS (SELECT a.ti, a.id AS src, b.id AS dst FROM m a JOIN m b
           |       ON b.ti = a.ti AND ((b.x = a.x + 1 AND b.y = a.y)
           |                        OR (b.x = a.x AND b.y = a.y + 1))),
           |e AS (SELECT ti, src, dst FROM e0 UNION ALL SELECT ti, dst, src FROM e0),
           |reach(ti, node, lbl) AS (
           |  SELECT ti, id, id FROM m
           |  UNION
           |  SELECT e.ti, e.dst, r.lbl FROM reach r
           |  JOIN e ON e.ti = r.ti AND e.src = r.node),
           |cc AS (SELECT ti, node, min(lbl) AS flbl FROM reach GROUP BY 1, 2),
           |lv AS (SELECT ti, count(DISTINCT flbl)::BIGINT AS n_comps FROM cc GROUP BY 1),
           |lk AS (SELECT DISTINCT p.ti, p.flbl AS plbl, c.flbl AS clbl
           |       FROM cc p JOIN cc c ON c.node = p.node AND c.ti = p.ti + 1),
           |pp AS (SELECT ti, plbl, count(*)::BIGINT AS nch FROM lk GROUP BY 1, 2),
           |ls AS (SELECT ti, count(*)::BIGINT AS n_surviving,
           |         sum(nch)::BIGINT AS n_links, max(nch)::BIGINT AS max_children
           |       FROM pp GROUP BY 1),
           |lsum AS (SELECT ti, sum(plbl)::BIGINT AS plbl_sum,
           |           sum(clbl)::BIGINT AS clbl_sum FROM lk GROUP BY 1),
           |t(ti, threshold) AS (VALUES (0, 25.0::DOUBLE), (1, 50.0::DOUBLE),
           |  (2, 75.0::DOUBLE), (3, 100.0::DOUBLE))
           |SELECT tlo.threshold AS t_lo, thi.threshold AS t_hi,
           |  lv.n_comps AS n_lo_comps,
           |  coalesce(hv.n_comps, 0)::BIGINT AS n_hi_comps,
           |  coalesce(ls.n_surviving, 0)::BIGINT AS n_surviving,
           |  coalesce(ls.n_links, 0)::BIGINT AS n_links,
           |  coalesce(ls.max_children, 0)::BIGINT AS max_children,
           |  coalesce(lsum.plbl_sum, 0)::BIGINT AS plbl_sum,
           |  coalesce(lsum.clbl_sum, 0)::BIGINT AS clbl_sum
           |FROM lv
           |JOIN t tlo ON tlo.ti = lv.ti
           |JOIN t thi ON thi.ti = lv.ti + 1
           |LEFT JOIN lv hv ON hv.ti = lv.ti + 1
           |LEFT JOIN ls ON ls.ti = lv.ti
           |LEFT JOIN lsum ON lsum.ti = lv.ti
           |WHERE lv.ti < 3
           |ORDER BY 1""".stripMargin,

      // distance transform: brute-force min over every mask cell — the
      // independent quadratic formulation of the engine's six-scan
      // separable transform; thresholds with empty masks drop on both
      // sides (inner join here, the INF filter there)
      "q_dist_transform" ->
        s"""WITH g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |${poolCte(1, 100)},
           |${poolCte(2, 50)},
           |t(threshold) AS (VALUES (25.0::DOUBLE), (50.0::DOUBLE), (75.0::DOUBLE), (100.0::DOUBLE)),
           |mk AS (SELECT t.threshold, x, y FROM g2 CROSS JOIN t WHERE v >= t.threshold),
           |c AS (SELECT t.threshold, x, y FROM g2 CROSS JOIN t),
           |dd AS (SELECT c.threshold, c.x, c.y,
           |         min(abs(c.x - m.x) + abs(c.y - m.y)) AS dist
           |       FROM c JOIN mk m ON m.threshold = c.threshold
           |       GROUP BY 1, 2, 3)
           |SELECT threshold, y::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(dist)::BIGINT AS dsum, max(dist)::BIGINT AS dmax
           |FROM dd GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // pole of inaccessibility: the independent quadratic brute force —
      // per mask cell, min L1 over ALL complement cells (vs the engine's
      // six-scan separable transform), then the stated (dist DESC, y, x)
      // tie-broken argmax via row_number; all-mask and all-complement
      // thresholds drop via the inner join
      "q_grid_pole" ->
        s"""WITH g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |${poolCte(1, 100)},
           |${poolCte(2, 50)},
           |t(threshold) AS (VALUES (25.0::DOUBLE), (50.0::DOUBLE), (75.0::DOUBLE), (100.0::DOUBLE)),
           |mk AS (SELECT t.threshold, x, y FROM g2 CROSS JOIN t WHERE v >= t.threshold),
           |cp AS (SELECT t.threshold, x, y FROM g2 CROSS JOIN t WHERE v < t.threshold),
           |dd AS (SELECT m.threshold, m.x, m.y,
           |         min(abs(m.x - c.x) + abs(m.y - c.y)) AS dist
           |       FROM mk m JOIN cp c ON c.threshold = m.threshold
           |       GROUP BY 1, 2, 3),
           |r AS (SELECT threshold, x, y, dist,
           |        row_number() OVER (PARTITION BY threshold
           |                           ORDER BY dist DESC, y, x) AS rn,
           |        count(*) OVER (PARTITION BY threshold) AS nm
           |      FROM dd)
           |SELECT threshold, nm::BIGINT AS n_mask, dist::BIGINT AS pole_d,
           |  y::BIGINT AS pole_y, x::BIGINT AS pole_x
           |FROM r WHERE rn = 1 ORDER BY threshold""".stripMargin,

      // mask topology: the independent GATHER formulation — the full
      // anchor lattice (range(-1, ..) x range(-1, ..)) with four LEFT
      // JOIN cell lookups classifying every quad, adjacency from +1
      // self-joins, Euler/perimeter from the same published formulas
      "q_grid_topology" ->
        s"""WITH g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |${poolCte(1, 100)},
           |${poolCte(2, 50)},
           |t(threshold) AS (VALUES (25.0::DOUBLE), (50.0::DOUBLE), (75.0::DOUBLE), (100.0::DOUBLE)),
           |ax AS (SELECT unnest(range(-1, 25)) AS qx),
           |ay AS (SELECT unnest(range(-1, (SELECT ((h // 2) // 2) FROM d))) AS qy),
           |q AS (SELECT t.threshold,
           |        coalesce((m00.v >= t.threshold)::INT, 0) AS b00,
           |        coalesce((m10.v >= t.threshold)::INT, 0) AS b10,
           |        coalesce((m01.v >= t.threshold)::INT, 0) AS b01,
           |        coalesce((m11.v >= t.threshold)::INT, 0) AS b11
           |      FROM ax CROSS JOIN ay CROSS JOIN t
           |      LEFT JOIN g2 m00 ON m00.x = ax.qx AND m00.y = ay.qy
           |      LEFT JOIN g2 m10 ON m10.x = ax.qx + 1 AND m10.y = ay.qy
           |      LEFT JOIN g2 m01 ON m01.x = ax.qx AND m01.y = ay.qy + 1
           |      LEFT JOIN g2 m11 ON m11.x = ax.qx + 1 AND m11.y = ay.qy + 1),
           |qc AS (SELECT threshold,
           |         sum(CASE WHEN b00 + b10 + b01 + b11 = 1 THEN 1 ELSE 0 END) AS q1,
           |         sum(CASE WHEN b00 + b10 + b01 + b11 = 3 THEN 1 ELSE 0 END) AS q3,
           |         sum(CASE WHEN b00 + b10 + b01 + b11 = 2
           |                   AND b00 = b11 AND b00 <> b10 THEN 1 ELSE 0 END) AS qd
           |       FROM q GROUP BY 1),
           |nc AS (SELECT t.threshold, count(*) FILTER (g2.v >= t.threshold) AS n
           |       FROM g2 CROSS JOIN t GROUP BY 1),
           |hp AS (SELECT t.threshold, count(*) AS np FROM g2 a
           |       JOIN g2 b ON b.x = a.x + 1 AND b.y = a.y
           |       CROSS JOIN t
           |       WHERE a.v >= t.threshold AND b.v >= t.threshold GROUP BY 1),
           |vp AS (SELECT t.threshold, count(*) AS np FROM g2 a
           |       JOIN g2 b ON b.x = a.x AND b.y = a.y + 1
           |       CROSS JOIN t
           |       WHERE a.v >= t.threshold AND b.v >= t.threshold GROUP BY 1)
           |SELECT qc.threshold, nc.n::BIGINT AS n_cells,
           |  (4 * nc.n - 2 * (coalesce(hp.np, 0) + coalesce(vp.np, 0)))::BIGINT AS perimeter,
           |  ((qc.q1 - qc.q3 + 2 * qc.qd) // 4)::BIGINT AS euler4,
           |  ((qc.q1 - qc.q3 - 2 * qc.qd) // 4)::BIGINT AS euler8
           |FROM qc JOIN nc ON nc.threshold = qc.threshold
           |LEFT JOIN hp ON hp.threshold = qc.threshold
           |LEFT JOIN vp ON vp.threshold = qc.threshold
           |ORDER BY 1""".stripMargin,

      "q_grid_pyramid" ->
      s"""WITH g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |${(pools ++ stats).mkString(",\n")}
         |${(0 to Levels).map(l => s"SELECT * FROM s$l").mkString(" UNION ALL ")}
         |ORDER BY level""".stripMargin,

      "q_focal_mean" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |f AS (SELECT t.y,
           |  ((((b0.v + b1.v) + b2.v) + ((b3.v + t.v) + b5.v))
           |    + ((b6.v + b7.v) + b8.v)) / 9.0 AS mean
           |  FROM g t
           |  $slotJoins
           |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2)
           |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(floor(mean * 1048576.0)::BIGINT)::BIGINT AS qsum,
           |  min(floor(mean * 1048576.0)::BIGINT) AS qmin,
           |  max(floor(mean * 1048576.0)::BIGINT) AS qmax
           |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

      // Horn slope: gx/gy mirror the engine's fixed expressions slot for
      // slot; sqrt is correctly rounded on both sides, so floor(slope*2^20)
      // is deterministic per cell
      "q_grid_slope" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |f1 AS (SELECT t.y,
           |  (((b0.v + b3.v * 2.0) + b6.v) - ((b2.v + b5.v * 2.0) + b8.v)) / 8.0 AS gx,
           |  (((b0.v + b1.v * 2.0) + b2.v) - ((b6.v + b7.v * 2.0) + b8.v)) / 8.0 AS gy
           |  FROM g t
           |  $slotJoins
           |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
           |f AS (SELECT y, sqrt(gx * gx + gy * gy) AS slope FROM f1)
           |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(floor(slope * 1048576.0)::BIGINT)::BIGINT AS qsum,
           |  min(floor(slope * 1048576.0)::BIGINT) AS qmin,
           |  max(floor(slope * 1048576.0)::BIGINT) AS qmax
           |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

      // zonal-of-slope: per-cell qslope via the same Horn slot joins, zone
      // membership via the pixel-center identity (interior center inside
      // the threshold-t polygon iff its own value >= t) — the whole
      // contour + PIP + tiled-slope chain checked relationally
      "q_zonal_slope" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |f1 AS (SELECT t.y, t.v,
           |  (((b0.v + b3.v * 2.0) + b6.v) - ((b2.v + b5.v * 2.0) + b8.v)) / 8.0 AS gx,
           |  (((b0.v + b1.v * 2.0) + b2.v) - ((b6.v + b7.v * 2.0) + b8.v)) / 8.0 AS gy
           |  FROM g t
           |  $slotJoins
           |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
           |f AS (SELECT v, floor(sqrt(gx * gx + gy * gy) * 1048576.0)::BIGINT AS q FROM f1)
           |SELECT threshold,
           |  sum(CASE WHEN v >= threshold THEN 1 ELSE 0 END)::BIGINT AS n_inside,
           |  sum(CASE WHEN v >= threshold THEN q END)::BIGINT AS qsum,
           |  min(CASE WHEN v >= threshold THEN q END) AS qmin,
           |  max(CASE WHEN v >= threshold THEN q END) AS qmax
           |FROM f CROSS JOIN (VALUES (25.0),(50.0),(75.0),(100.0)) t(threshold)
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      // aspect: octant classification of the downslope vector (-gx, -gy)
      // — pure comparisons against the f64-deterministic T = sqrt(2)-1
      // (correctly-rounded sqrt, Sterbenz-exact subtraction), CASE
      // cascade mirrored token for token; no atan2 anywhere
      "q_grid_aspect" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |f1 AS (SELECT
           |  -((((b0.v + b3.v * 2.0) + b6.v) - ((b2.v + b5.v * 2.0) + b8.v)) / 8.0) AS ax,
           |  -((((b0.v + b1.v * 2.0) + b2.v) - ((b6.v + b7.v * 2.0) + b8.v)) / 8.0) AS ay
           |  FROM g t
           |  $slotJoins
           |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
           |c AS (SELECT CASE
           |  WHEN ax = 0.0 AND ay = 0.0 THEN -1
           |  WHEN abs(ay) <= (sqrt(2.0) - 1.0) * abs(ax)
           |    THEN (CASE WHEN ax > 0.0 THEN 0 ELSE 4 END)
           |  WHEN abs(ax) <= (sqrt(2.0) - 1.0) * abs(ay)
           |    THEN (CASE WHEN ay > 0.0 THEN 2 ELSE 6 END)
           |  WHEN ax > 0.0 AND ay > 0.0 THEN 1
           |  WHEN ax < 0.0 AND ay > 0.0 THEN 3
           |  WHEN ax < 0.0 AND ay < 0.0 THEN 5
           |  ELSE 7 END AS cls FROM f1)
           |SELECT cls::BIGINT AS cls, count(*)::BIGINT AS n_cells
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

      // TRI: squared deviations from the center over the same slot joins,
      // the focal kernel's association tree (the center term is exactly
      // +0.0 on both sides); sqrt correctly rounded
      "q_grid_tri" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |f AS (SELECT t.y, sqrt(
           |  ((((b0.v - t.v) * (b0.v - t.v) + (b1.v - t.v) * (b1.v - t.v))
           |      + (b2.v - t.v) * (b2.v - t.v))
           |    + (((b3.v - t.v) * (b3.v - t.v) + (t.v - t.v) * (t.v - t.v))
           |        + (b5.v - t.v) * (b5.v - t.v)))
           |  + (((b6.v - t.v) * (b6.v - t.v) + (b7.v - t.v) * (b7.v - t.v))
           |      + (b8.v - t.v) * (b8.v - t.v))) AS tri
           |  FROM g t
           |  $slotJoins
           |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2)
           |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(floor(tri * 1048576.0)::BIGINT)::BIGINT AS qsum,
           |  min(floor(tri * 1048576.0)::BIGINT) AS qmin,
           |  max(floor(tri * 1048576.0)::BIGINT) AS qmax
           |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

      // Zevenbergen-Thorne curvature: coefficients d/e/f/g/h mirror the
      // kernel token for token (center = t.v), flat-cell CASE compares
      // exactly against 0.0 (den = g^2 + h^2 >= 0 always), both curvature
      // expressions share the kernel's association tree; every op is a
      // correctly-rounded f64 +,-,*,/ — no libm anywhere
      "q_curvature" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |f1 AS (SELECT t.y,
           |  (b5.v + b3.v) / 2.0 - t.v AS dd,
           |  (b7.v + b1.v) / 2.0 - t.v AS ee,
           |  ((b0.v - b2.v) + (b8.v - b6.v)) / 4.0 AS ff,
           |  (b3.v - b5.v) / 2.0 AS gg,
           |  (b1.v - b7.v) / 2.0 AS hh
           |  FROM g t
           |  $slotJoins
           |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
           |f2 AS (SELECT y, dd, ee, ff, gg, hh, gg * gg + hh * hh AS den FROM f1),
           |f AS (SELECT y,
           |  CASE WHEN den = 0.0 THEN 0.0
           |       ELSE 2.0 * ((dd * (hh * hh) + ee * (gg * gg)) - (ff * gg) * hh) / den
           |  END AS pl,
           |  CASE WHEN den = 0.0 THEN 0.0
           |       ELSE -2.0 * ((dd * (gg * gg) + ee * (hh * hh)) + (ff * gg) * hh) / den
           |  END AS pr
           |  FROM f2)
           |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(floor(pl * 1048576.0)::BIGINT)::BIGINT AS plsum,
           |  min(floor(pl * 1048576.0)::BIGINT) AS plmin,
           |  max(floor(pl * 1048576.0)::BIGINT) AS plmax,
           |  sum(floor(pr * 1048576.0)::BIGINT)::BIGINT AS prsum,
           |  min(floor(pr * 1048576.0)::BIGINT) AS prmin,
           |  max(floor(pr * 1048576.0)::BIGINT) AS prmax
           |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

      // hillshade: gx/gy mirror the Horn joins; the sun components are the
      // f64-deterministic constants 0.5 / sqrt(2.0)/2.0 (azimuth 315,
      // altitude 45), division and sqrt are correctly rounded, and
      // greatest(_, 0.0) compares exactly
      "q_hillshade" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |f1 AS (SELECT t.y,
           |  (((b0.v + b3.v * 2.0) + b6.v) - ((b2.v + b5.v * 2.0) + b8.v)) / 8.0 AS gx,
           |  (((b0.v + b1.v * 2.0) + b2.v) - ((b6.v + b7.v * 2.0) + b8.v)) / 8.0 AS gy
           |  FROM g t
           |  $slotJoins
           |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
           |f AS (SELECT y, greatest(
           |    ((gx * 0.5 - gy * 0.5) + (sqrt(2.0) / 2.0))
           |      / sqrt((1.0 + gx * gx) + gy * gy), 0.0) AS shade FROM f1)
           |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(floor(shade * 1048576.0)::BIGINT)::BIGINT AS qsum,
           |  min(floor(shade * 1048576.0)::BIGINT) AS qmin,
           |  max(floor(shade * 1048576.0)::BIGINT) AS qmax
           |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

      // pyramid slope: poolCte's exact fixed-order 2x2 means feed the same
      // Horn joins on the LEVEL-1 grid (w1 = 50, h1 = h // 2)
      "q_pyramid_slope" ->
        s"""WITH g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |${poolCte(1, 100)},
           |f1 AS (SELECT t.y,
           |  (((b0.v + b3.v * 2.0) + b6.v) - ((b2.v + b5.v * 2.0) + b8.v)) / 8.0 AS gx,
           |  (((b0.v + b1.v * 2.0) + b2.v) - ((b6.v + b7.v * 2.0) + b8.v)) / 8.0 AS gy
           |  FROM g1 t
           |  $slotJoins1
           |  WHERE t.x BETWEEN 1 AND 48 AND t.y BETWEEN 1 AND (SELECT h FROM d) // 2 - 2),
           |f AS (SELECT y, sqrt(gx * gx + gy * gy) AS slope FROM f1)
           |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(floor(slope * 1048576.0)::BIGINT)::BIGINT AS qsum,
           |  min(floor(slope * 1048576.0)::BIGINT) AS qmin,
           |  max(floor(slope * 1048576.0)::BIGINT) AS qmax
           |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

      // D8: the packed-argmax trick mirrored term for term; sqrt(2.0) is
      // correctly rounded on both sides, % decodes only non-negative pmax
      "q_flow_dir" -> {
        val terms = Seq(0, 1, 2, 3, 5, 6, 7, 8).map { o =>
          val dxo = o % 3 - 1; val dyo = o / 3 - 1
          val distSql = if (dxo != 0 && dyo != 0) "sqrt(2.0)" else "1.0"
          s"(floor((t.v - b$o.v) / $distSql * 1048576.0)::BIGINT * 16 + ${8 - o})"
        }.mkString(",\n    ")
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |p AS (SELECT greatest(
           |    $terms) AS pmax
           |  FROM g t
           |  $slotJoins
           |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
           |f AS (SELECT CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir, pmax FROM p)
           |SELECT dir::BIGINT AS dir, count(*)::BIGINT AS n_cells, max(pmax) AS qpk_max
           |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
      },

      // bilinear 2x upsample: the oracle GATHERS (4 equi-joins per output
      // pixel) what the engine SCATTERS (replicate+pivot) — independent
      // formulations of the same stencil; corner indices, clamp, weights
      // and the interpolation expression tree mirror gridUpsample exactly
      "q_grid_upsample" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |og AS (SELECT ox.ox, oy.oy
           |  FROM (SELECT unnest(range(0, 200))::INT AS ox) ox
           |  CROSS JOIN (SELECT unnest(range(0, 2 * (SELECT h FROM d)))::INT AS oy) oy),
           |c AS (SELECT ox, oy,
           |  greatest(least((ox - 1) // 2, 99), 0) AS x0, least((ox + 1) // 2, 99) AS x1,
           |  greatest(least((oy - 1) // 2, (SELECT h FROM d) - 1), 0) AS y0,
           |  least((oy + 1) // 2, (SELECT h FROM d) - 1) AS y1,
           |  CASE WHEN ox % 2 = 0 THEN 0.75 ELSE 0.25 END AS fx,
           |  CASE WHEN oy % 2 = 0 THEN 0.75 ELSE 0.25 END AS fy
           |  FROM og),
           |f AS (SELECT c.oy,
           |  (b00.v * (1.0 - fx) + b10.v * fx) * (1.0 - fy)
           |    + (b01.v * (1.0 - fx) + b11.v * fx) * fy AS v
           |  FROM c
           |  JOIN g b00 ON b00.x = c.x0 AND b00.y = c.y0
           |  JOIN g b10 ON b10.x = c.x1 AND b10.y = c.y0
           |  JOIN g b01 ON b01.x = c.x0 AND b01.y = c.y1
           |  JOIN g b11 ON b11.x = c.x1 AND b11.y = c.y1)
           |SELECT oy::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(floor(v * 1048576.0)::BIGINT)::BIGINT AS qsum,
           |  min(floor(v * 1048576.0)::BIGINT) AS qmin,
           |  max(floor(v * 1048576.0)::BIGINT) AS qmax
           |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

      // focal median: pure order statistics — list_sort picks the 5th of
      // the 9 window values (vs the engine's insertion sort / Spark's
      // sort_array in the cross-check); only the quantization computes
      "q_focal_median" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |f AS (SELECT t.y,
           |  list_sort([b0.v, b1.v, b2.v, b3.v, t.v, b5.v, b6.v, b7.v, b8.v])[5] AS med
           |  FROM g t
           |  $slotJoins
           |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2)
           |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(floor(med * 1048576.0)::BIGINT)::BIGINT AS qsum,
           |  min(floor(med * 1048576.0)::BIGINT) AS qmin,
           |  max(floor(med * 1048576.0)::BIGINT) AS qmax
           |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

      // Sobel L1 magnitude: the eight window slots gathered by the shared
      // slot joins (slot o = value at (x - dx_o, y - dy_o), so NW=b8,
      // N=b7, NE=b6, W=b5, E=b3, SW=b2, S=b1, SE=b0), same |gx| + |gy|
      "q_sobel" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y,
           |             floor(value * 1048576.0)::BIGINT AS q FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |f AS (SELECT t.x, t.y,
           |        abs((b6.q + 2 * b3.q + b0.q) - (b8.q + 2 * b5.q + b2.q))
           |        + abs((b2.q + 2 * b1.q + b0.q) - (b8.q + 2 * b7.q + b6.q)) AS g1
           |      FROM g t
           |  $slotJoins
           |      WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2)
           |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells, sum(g1)::BIGINT AS qsum,
           |  min(g1)::BIGINT AS qmin, max(g1)::BIGINT AS qmax
           |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

      // focal majority: the window's integer bins unnested and counted per
      // cell, mode picked by (count DESC, bin) rank — the gather/group
      // formulation of the kernel's in-place counting loops
      "q_focal_majority" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |f AS (SELECT t.x, t.y,
           |  [floor(b0.v), floor(b1.v), floor(b2.v), floor(b3.v), floor(t.v),
           |   floor(b5.v), floor(b6.v), floor(b7.v), floor(b8.v)] AS ls
           |  FROM g t
           |  $slotJoins
           |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
           |u AS (SELECT x, y, unnest(ls)::BIGINT AS bin FROM f),
           |c AS (SELECT x, y, bin, count(*) AS cnt FROM u GROUP BY 1, 2, 3),
           |m AS (SELECT x, y, bin,
           |        row_number() OVER (PARTITION BY x, y ORDER BY cnt DESC, bin) AS rn
           |      FROM c)
           |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells, sum(bin)::BIGINT AS qsum,
           |  min(bin)::BIGINT AS qmin, max(bin)::BIGINT AS qmax
           |FROM m WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

      // binary 3x3 morphology: mask/erode/dilate counts are exact selections
      // (least/greatest) + exact compares — nothing quantizes anywhere
      "q_morphology" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |f AS (SELECT t.v AS c,
           |  least(b0.v, b1.v, b2.v, b3.v, t.v, b5.v, b6.v, b7.v, b8.v) AS mn,
           |  greatest(b0.v, b1.v, b2.v, b3.v, t.v, b5.v, b6.v, b7.v, b8.v) AS mx
           |  FROM g t
           |  $slotJoins
           |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2)
           |SELECT threshold,
           |  sum(CASE WHEN c >= threshold THEN 1 ELSE 0 END)::BIGINT AS n_mask,
           |  sum(CASE WHEN mn >= threshold THEN 1 ELSE 0 END)::BIGINT AS n_erode,
           |  sum(CASE WHEN mx >= threshold THEN 1 ELSE 0 END)::BIGINT AS n_dilate
           |FROM f CROSS JOIN (VALUES (25.0),(50.0),(75.0),(100.0)) t(threshold)
           |GROUP BY 1 ORDER BY 1""".stripMargin,

      // integral image: two nested window scans (x then y) — the same
      // separability the engine composes from two distributed scan passes
      "q_integral" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |q AS (SELECT x, y, floor(v * 1048576.0)::BIGINT AS q FROM g),
           |p AS (SELECT x, y, sum(q) OVER (PARTITION BY y ORDER BY x ROWS UNBOUNDED PRECEDING) AS rp FROM q),
           |i AS (SELECT x, y, sum(rp) OVER (PARTITION BY x ORDER BY y ROWS UNBOUNDED PRECEDING) AS ii FROM p)
           |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(ii)::BIGINT AS qsum, max(ii)::BIGINT AS qmax
           |FROM i GROUP BY 1 ORDER BY 1""".stripMargin,

      // row-wise viewshed: the oracle is the quadratic NOT-EXISTS
      // formulation (a blocking predecessor by integer cross-product) —
      // independent of the engine's segmented running-max-rational scan;
      // sum(x) is HUGEINT in DuckDB, hence the ::BIGINT on xsum
      "q_viewshed" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |q AS (SELECT x, y, floor(v * 1048576.0)::BIGINT AS q FROM g),
           |o AS (SELECT y, q AS q0 FROM q WHERE x = 0),
           |c AS (SELECT q.y, q.x, q.q - o.q0 AS n FROM q JOIN o USING (y) WHERE q.x >= 1),
           |vis AS (SELECT c.y, c.x FROM c WHERE NOT EXISTS (
           |  SELECT 1 FROM c p WHERE p.y = c.y AND p.x < c.x AND p.n * c.x >= c.n * p.x)),
           |r AS (SELECT y, count(*) AS nc FROM q GROUP BY 1)
           |SELECT r.y::BIGINT AS y, r.nc::BIGINT AS n_cells,
           |  (1 + coalesce(vv.nv, 0))::BIGINT AS n_visible,
           |  coalesce(vv.xs, 0)::BIGINT AS xsum,
           |  coalesce(vv.mx, 0)::BIGINT AS last_x
           |FROM r LEFT JOIN (SELECT y, count(*) AS nv, sum(x) AS xs, max(x) AS mx
           |                  FROM vis GROUP BY 1) vv USING (y)
           |ORDER BY 1""".stripMargin,

      // row-prefix scan: the oracle runs the textbook window scan the
      // engine decomposes into segment partials + offsets — independent
      // formulations of the same per-cell integer prefixes
      "q_row_prefix" ->
        s"""WITH g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |q AS (SELECT x, y, floor(v * 1048576.0)::BIGINT AS q FROM g),
           |p AS (SELECT y, sum(q) OVER (PARTITION BY y ORDER BY x ROWS UNBOUNDED PRECEDING) AS pref FROM q)
           |SELECT y::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(pref)::BIGINT AS psum, max(pref)::BIGINT AS pmax
           |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)
  }
}

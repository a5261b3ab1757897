package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Convex hull of the per-threshold mask footprint — the ST_ConvexHull
  * analog over the events grid, computed on the 10x10 SUPERPIXEL lattice
  * (the q_point_density binning): for each threshold of the standard
  * ladder, the hull of every superpixel containing at least one sample
  * with v >= t. All coordinates are small integers, so every cross
  * product and the doubled shoelace area are EXACT Long arithmetic —
  * nothing quantizes, nothing rounds.
  *
  * Distributed shape — the classic two-level hull reduction,
  * hull(S) = hull(hull(S_1) u ... u hull(S_k)) (hulls compose under
  * union): stage 1 runs Andrew's monotone chain per (threshold,
  * partition) inside one mapPartitions (no shuffle; duplicates across
  * partitions are harmless — the hull of a multiset is the hull of its
  * support), so only per-partition hull CORNERS enter the one
  * threshold-keyed exchange; stage 2 chains the collected candidates per
  * threshold. The stage-2 group is bounded by the sum of per-partition
  * hull sizes (corners of a lattice-point hull are O(n^(1/3)) in
  * expectation, and never more than the partition's distinct points) —
  * loudly required below a hard cap rather than silently assumed.
  *
  * The oracle is the independent GIFT-WRAPPING march (Jarvis): a
  * recursive CTE steps from the lexicographic min point, each step
  * choosing the unique point with no other point strictly left of the
  * candidate edge (farthest wins among edge-collinear ties), so both
  * sides emit CORNERS ONLY and the set-level checksums compare exactly.
  */
object HullOps {

  /** Stage-2 candidate cap: per-threshold final groups beyond this are a
    * contract violation (a lattice hull's corner count can't get here),
    * never a silent truncation.
    */
  private val MaxCandidates = 1 << 22

  private def cross(ox: Long, oy: Long, ax: Long, ay: Long,
                    bx: Long, by: Long): Long =
    (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

  /** Andrew's monotone chain over integer points: CCW, corners only
    * (collinear edge-interior points are popped by the <= 0 turn test).
    * Returns 1 point for a single-point set and the 2 extreme endpoints
    * for a collinear set.
    */
  private[graft] def chainHull(pts: Array[(Long, Long)]): Array[(Long, Long)] = {
    val p = pts.distinct.sorted
    if (p.length <= 2) return p
    val h = new Array[(Long, Long)](2 * p.length)
    var k = 0
    var i = 0
    while (i < p.length) { // lower hull
      while (k >= 2 && cross(h(k - 2)._1, h(k - 2)._2, h(k - 1)._1, h(k - 1)._2,
        p(i)._1, p(i)._2) <= 0) k -= 1
      h(k) = p(i); k += 1; i += 1
    }
    val t = k + 1
    i = p.length - 2
    while (i >= 0) { // upper hull
      while (k >= t && cross(h(k - 2)._1, h(k - 2)._2, h(k - 1)._1, h(k - 1)._2,
        p(i)._1, p(i)._2) <= 0) k -= 1
      h(k) = p(i); k += 1; i -= 1
    }
    h.take(k - 1) // the last point repeats the first
  }

  /** Doubled signed shoelace area of an ordered integer ring — exact Long
    * (coordinates here are superpixel indices, so products are tiny).
    */
  private[graft] def area2(hull: Array[(Long, Long)]): Long = {
    var s = 0L
    var i = 0
    while (i < hull.length) {
      val (ax, ay) = hull(i)
      val (bx, by) = hull((i + 1) % hull.length)
      s += ax * by - bx * ay
      i += 1
    }
    s
  }

  /** Two-level distributed hull of (threshold-index, x, y) points.
    * Emits (ti, n_hull, x_sum, y_sum, area2) per threshold index.
    */
  private[graft] def hullOf(pts: Dataset[(Int, Long, Long)]): Dataset[(Int, Long, Long, Long, Long)] = {
    import pts.sparkSession.implicits._
    val cand = pts.mapPartitions { it =>
      val byT = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Long)]]
      it.foreach { case (ti, x, y) =>
        byT.getOrElseUpdate(ti, scala.collection.mutable.ArrayBuffer.empty) += ((x, y))
      }
      byT.iterator.flatMap { case (ti, buf) =>
        chainHull(buf.toArray).iterator.map(p => (ti, p._1, p._2))
      }
    }
    cand.groupByKey(_._1).mapGroups { (ti: Int, it: Iterator[(Int, Long, Long)]) =>
      val arr = it.map(t => (t._2, t._3)).toArray
      require(arr.length <= MaxCandidates,
        s"hullOf: threshold $ti collected ${arr.length} stage-1 corners (> $MaxCandidates)")
      val hull = chainHull(arr)
      (ti, hull.length.toLong, hull.iterator.map(_._1).sum,
        hull.iterator.map(_._2).sum, area2(hull))
    }
  }

  /** The per-threshold occupied-superpixel point sets — the shared feed of
    * convexHull and hullCalipers (ONE definition of the 10x10 binning and
    * the >= threshold mask).
    */
  private def thresholdPoints(spark: SparkSession, dir: String): Dataset[(Int, Long, Long)] = {
    import spark.implicits._
    val thr = EventsGrid.Thresholds.toArray
    RasterOps.baseCells(spark, dir).as[(Int, Int, Double)]
      .flatMap { case (x, y, v) =>
        thr.indices.iterator.filter(ti => v >= thr(ti))
          .map(ti => (ti, (x / 10).toLong, (y / 10).toLong))
      }
  }

  private def thrCol = {
    val thr = EventsGrid.Thresholds.toArray
    thr.indices.foldRight(lit(Double.NaN)) { (ti, acc) =>
      when(col("ti") === ti, lit(thr(ti))).otherwise(acc)
    }
  }

  /** q_convex_hull: per contour threshold, the hull of the occupied
    * superpixels — (threshold, n_hull, x_sum, y_sum, area2), every column
    * an exact integer (area2 is the CCW-positive doubled shoelace).
    */
  val convexHull: (SparkSession, String) => DataFrame = (spark, dir) => {
    hullOf(thresholdPoints(spark, dir)).toDF("ti", "n_hull", "x_sum", "y_sum", "area2")
      .select(thrCol.as("threshold"), col("n_hull"), col("x_sum"),
        col("y_sum"), col("area2"))
      .orderBy("threshold")
  }

  private def dist2(a: (Long, Long), b: (Long, Long)): Long = {
    val dx = b._1 - a._1; val dy = b._2 - a._2
    dx * dx + dy * dy
  }

  /** Caliper metrics of a CCW corners-only hull (as [[chainHull]] emits):
    * diam2 = the exact max squared corner-pair distance (the rotating-
    * calipers DIAMETER, squared), and width2_q = the quantized squared
    * caliper WIDTH, min over hull edges e of
    * floor(maxcross_e^2 * 2^20 / |e|^2) — maxcross_e is the largest
    * |cross| of any corner against e, so maxcross_e/|e| is that edge's
    * supporting-slab height and floor commutes with the min because it is
    * monotone. cross and dist2 stay exact Longs; the one product that can
    * overflow (maxcross^2 * 2^20 once the superpixel span passes ~2^10)
    * goes through BigInt.
    *
    * The scan is the direct O(h^2) definition over CORNERS ONLY — h is
    * lattice-hull-bounded (O(span^(2/3)) corners, ~100 at span 10^3, ~10^4
    * at span 10^6), so the per-threshold cost is bounded by the same
    * contract that bounds hullOf's stage-2 group; the O(h) calipers walk
    * is a drop-in upgrade if h ever grows teeth. Degenerate hulls follow
    * the definition: a point is (0, 0); a 2-corner segment is (dist2, 0)
    * (its slab has zero height).
    */
  private[graft] def hullMetrics(h: Array[(Long, Long)]): (Long, Long) = {
    val n = h.length
    if (n == 1) return (0L, 0L)
    if (n == 2) return (dist2(h(0), h(1)), 0L)
    var diam = 0L
    var width = Long.MaxValue
    var i = 0
    while (i < n) {
      val a = h(i); val b = h((i + 1) % n)
      var maxcross = 0L
      var j = 0
      while (j < n) {
        if (j > i) { val d = dist2(a, h(j)); if (d > diam) diam = d }
        val c = (b._1 - a._1) * (h(j)._2 - a._2) - (b._2 - a._2) * (h(j)._1 - a._1)
        val ca = math.abs(c)
        if (ca > maxcross) maxcross = ca
        j += 1
      }
      val wq = (BigInt(maxcross) * BigInt(maxcross) * BigInt(1048576) / BigInt(dist2(a, b))).toLong
      if (wq < width) width = wq
      i += 1
    }
    (diam, width)
  }

  /** q_hull_calipers: per contour threshold, the caliper metrics of the
    * occupied-superpixel hull — (threshold, n_hull, diam2, width2_q). The
    * distributed shape is [[hullOf]]'s two-level reduction verbatim (only
    * per-partition hull corners enter the one threshold-keyed exchange);
    * the metrics are computed on the final hull inside the same stage-2
    * group. The oracle rebuilds the hull by GIFT WRAPPING (the
    * q_convex_hull recursive march) and evaluates both metrics as SQL
    * pairwise aggregates over its corners — independent hull construction
    * AND independent scan order, same exact integers.
    */
  val hullCalipers: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val m = thresholdPoints(spark, dir)
      .mapPartitions { it =>
        val byT = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[(Long, Long)]]
        it.foreach { case (ti, x, y) =>
          byT.getOrElseUpdate(ti, scala.collection.mutable.ArrayBuffer.empty) += ((x, y))
        }
        byT.iterator.flatMap { case (ti, buf) =>
          chainHull(buf.toArray).iterator.map(p => (ti, p._1, p._2))
        }
      }
      .groupByKey(_._1).mapGroups { (ti: Int, it: Iterator[(Int, Long, Long)]) =>
        val arr = it.map(t => (t._2, t._3)).toArray
        require(arr.length <= MaxCandidates,
          s"hullCalipers: threshold $ti collected ${arr.length} stage-1 corners (> $MaxCandidates)")
        val hull = chainHull(arr)
        val (diam2, width2q) = hullMetrics(hull)
        (ti, hull.length.toLong, diam2, width2q)
      }
    m.toDF("ti", "n_hull", "diam2", "width2_q")
      .select(thrCol.as("threshold"), col("n_hull"), col("diam2"), col("width2_q"))
      .orderBy("threshold")
  }

  // gift wrapping: from the lexicographic min, each march step picks the
  // point q with nothing strictly left of edge p->q (farthest wins among
  // edge-collinear candidates — corners only), stopping when the next
  // corner would be the start; `e` closes the ring via
  // lead-with-wraparound. Cross products / distances are exact integers.
  // Shared verbatim by q_convex_hull and q_hull_calipers.
  private val hullWalkCte =
    """WITH RECURSIVE
      |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
      |t(ti, threshold) AS (VALUES (0, 25.0::DOUBLE), (1, 50.0::DOUBLE),
      |                            (2, 75.0::DOUBLE), (3, 100.0::DOUBLE)),
      |p AS (SELECT DISTINCT t.ti, (x // 10)::BIGINT AS px, (y // 10)::BIGINT AS py
      |      FROM g CROSS JOIN t WHERE v >= t.threshold),
      |s AS (SELECT ti, px, py FROM (
      |        SELECT ti, px, py,
      |               row_number() OVER (PARTITION BY ti ORDER BY px, py) AS rn
      |        FROM p) WHERE rn = 1),
      |hull(ti, step, hx, hy) AS (
      |  SELECT ti, 0, px, py FROM s
      |  UNION ALL
      |  SELECT h.ti, h.step + 1, q.px, q.py
      |  FROM hull h
      |  JOIN p q ON q.ti = h.ti AND NOT (q.px = h.hx AND q.py = h.hy)
      |  JOIN s ON s.ti = h.ti
      |  WHERE h.step < 500
      |    AND NOT (q.px = s.px AND q.py = s.py)
      |    AND NOT EXISTS (SELECT 1 FROM p r WHERE r.ti = h.ti
      |      AND ((q.px - h.hx) * (r.py - h.hy) - (q.py - h.hy) * (r.px - h.hx) < 0
      |        OR ((q.px - h.hx) * (r.py - h.hy) - (q.py - h.hy) * (r.px - h.hx) = 0
      |            AND (r.px - h.hx) * (r.px - h.hx) + (r.py - h.hy) * (r.py - h.hy)
      |              > (q.px - h.hx) * (q.px - h.hx) + (q.py - h.hy) * (q.py - h.hy))))),
      |e AS (SELECT ti, step, hx, hy,
      |        coalesce(lead(hx) OVER w, first_value(hx) OVER w) AS nx,
      |        coalesce(lead(hy) OVER w, first_value(hy) OVER w) AS ny
      |      FROM hull WINDOW w AS (PARTITION BY ti ORDER BY step))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_convex_hull" ->
      s"""$hullWalkCte
         |SELECT any_value(t.threshold) AS threshold, count(*)::BIGINT AS n_hull,
         |  sum(hx)::BIGINT AS x_sum, sum(hy)::BIGINT AS y_sum,
         |  sum(hx * ny - nx * hy)::BIGINT AS area2
         |FROM e JOIN t ON t.ti = e.ti
         |GROUP BY e.ti ORDER BY threshold""".stripMargin,

    // caliper metrics over the gift-wrapped corners: diam2 as the pairwise
    // max over UNORDERED corner pairs (step < step — no hull walk needed),
    // width2_q per edge as max |cross| against every corner, then the
    // HUGEINT floor division (maxcross^2 * 2^20 // edge2) minimized across
    // edges. Degenerate-by-construction guards mirror the engine: a
    // 1-corner hull has no pair (coalesce 0) and its single self-edge has
    // edge2 = 0 (NULLed out, coalesce 0); a 2-corner hull's slab height is
    // 0 on both wrap edges.
    "q_hull_calipers" ->
      s"""$hullWalkCte,
         |diam AS (SELECT a.ti,
         |    max((a.hx - b.hx) * (a.hx - b.hx) + (a.hy - b.hy) * (a.hy - b.hy)) AS diam2
         |  FROM e a JOIN e b ON b.ti = a.ti AND a.step < b.step GROUP BY a.ti),
         |wedge AS (SELECT ed.ti, ed.step,
         |    max(abs((ed.nx - ed.hx) * (c.hy - ed.hy)
         |          - (ed.ny - ed.hy) * (c.hx - ed.hx))) AS maxcross,
         |    (ed.nx - ed.hx) * (ed.nx - ed.hx) + (ed.ny - ed.hy) * (ed.ny - ed.hy) AS edge2
         |  FROM e ed JOIN e c ON c.ti = ed.ti
         |  GROUP BY ed.ti, ed.step, edge2),
         |wid AS (SELECT ti, min(CASE WHEN edge2 = 0 THEN NULL
         |    ELSE ((maxcross::HUGEINT * maxcross * 1048576) // edge2)::BIGINT END) AS width2_q
         |  FROM wedge GROUP BY ti),
         |nh AS (SELECT ti, count(*)::BIGINT AS n_hull FROM e GROUP BY ti)
         |SELECT any_value(t.threshold) AS threshold, any_value(nh.n_hull) AS n_hull,
         |  coalesce(any_value(diam.diam2), 0)::BIGINT AS diam2,
         |  coalesce(any_value(wid.width2_q), 0)::BIGINT AS width2_q
         |FROM nh JOIN t ON t.ti = nh.ti
         |LEFT JOIN diam ON diam.ti = nh.ti
         |LEFT JOIN wid ON wid.ti = nh.ti
         |GROUP BY nh.ti ORDER BY threshold""".stripMargin)
}

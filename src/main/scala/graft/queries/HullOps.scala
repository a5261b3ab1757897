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

  /** q_convex_hull: per contour threshold, the hull of the occupied
    * superpixels — (threshold, n_hull, x_sum, y_sum, area2), every column
    * an exact integer (area2 is the CCW-positive doubled shoelace).
    */
  val convexHull: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val thr = EventsGrid.Thresholds.toArray
    val pts = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)]
      .flatMap { case (x, y, v) =>
        thr.indices.iterator.filter(ti => v >= thr(ti))
          .map(ti => (ti, (x / 10).toLong, (y / 10).toLong))
      }
    val thrCol = thr.indices.foldRight(lit(Double.NaN)) { (ti, acc) =>
      when(col("ti") === ti, lit(thr(ti))).otherwise(acc)
    }
    hullOf(pts).toDF("ti", "n_hull", "x_sum", "y_sum", "area2")
      .select(thrCol.as("threshold"), col("n_hull"), col("x_sum"),
        col("y_sum"), col("area2"))
      .orderBy("threshold")
  }

  val oracleSql: Map[String, String] = Map(
    // gift wrapping: from the lexicographic min, each march step picks the
    // point q with nothing strictly left of edge p->q (farthest wins among
    // edge-collinear candidates — corners only), stopping when the next
    // corner would be the start; the shoelace closes the ring via
    // lead-with-wraparound. Cross products / distances are exact integers.
    "q_convex_hull" ->
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
        |      FROM hull WINDOW w AS (PARTITION BY ti ORDER BY step))
        |SELECT any_value(t.threshold) AS threshold, count(*)::BIGINT AS n_hull,
        |  sum(hx)::BIGINT AS x_sum, sum(hy)::BIGINT AS y_sum,
        |  sum(hx * ny - nx * hy)::BIGINT AS area2
        |FROM e JOIN t ON t.ti = e.ti
        |GROUP BY e.ti ORDER BY threshold""".stripMargin)
}

package graft

import graft.core.{Cases, GeoJson, MarchingSquares, Poly, ContourResult, Tiling}
import graft.docs.DocCodec
import graft.engine.ContourEngine
import graft.model._
import graft.queries.{EventsGrid, MultimodalOps, TrainingOps}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per operator family, each paired
  * (where SQL-expressible) with a DuckDB oracle over the same parquet
  * tables. Contour queries run the full distributed pipeline over a grid
  * derived deterministically from events.parquet (see EventsGrid), so the
  * oracle can recompute cell cases / segment totals in pure SQL.
  */
object SparkEntry {

  private def engine(spark: SparkSession, smooth: Boolean = true) =
    new ContourEngine(spark, JobConfig(EventsGrid.Thresholds, smooth = smooth))

  /** events grid -> interleaved doc table -> decode (codec always on path) */
  private def eventTiles(spark: SparkSession, dir: String): Dataset[TileRow] = {
    implicit val s = spark
    DocCodec.decode(DocCodec.encode(EventsGrid.tiles(spark, dir)))
  }

  private def thresholdsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    EventsGrid.Thresholds.toDF("threshold")
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val tiles = eventTiles(spark, "/root/testdata/sf0.001")
    engine(spark).contours(tiles).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- threshold classification: count of samples >= t (oracle: SQL) ----
    "q_threshold_class" -> ((spark, dir) => {
      import spark.implicits._
      val tiles = eventTiles(spark, dir)
      val ts = EventsGrid.Thresholds
      val counts = tiles.flatMap { t =>
        // owned samples only (exclude halo)
        ts.iterator.map { th =>
          var n = 0L
          var r = 0
          while (r < t.th) {
            var c = 0
            while (c < t.tw) {
              if (t.values(r * t.vw + c) >= th) n += 1
              c += 1
            }
            r += 1
          }
          (th, n)
        }
      }.toDF("threshold", "n_partial")
      counts.groupBy("threshold").agg(sum("n_partial").as("n"))
        .join(thresholdsDf(spark), Seq("threshold"), "right")
        .na.fill(0L, Seq("n"))
        .select(col("threshold"), col("n").cast("long").as("n"))
        .orderBy("threshold")
    }),

    // ---- marching-squares cell-case histogram incl. virtual border ----
    "q_cell_case_hist" -> ((spark, dir) => {
      import spark.implicits._
      val tiles = eventTiles(spark, dir)
      val ts = EventsGrid.Thresholds
      tiles.flatMap { t =>
        val s = Tiling.TileSpec(t.tileX, t.tileY, t.sx0, t.sy0, t.tw, t.th,
          t.sx0, t.sy0, t.vw, t.vh,
          if (t.sx0 == 0) -1 else t.sx0, t.sx0 + t.tw - 1,
          if (t.sy0 == 0) -1 else t.sy0, t.sy0 + t.th - 1)
        ts.iterator.flatMap { th =>
          val hist = MarchingSquares.caseHistogram(t.values, t.vw, t.vh, t.sx0, t.sy0,
            t.gdx, t.gdy, s.cx0, s.cx1, s.cy0, s.cy1, th)
          hist.iterator.zipWithIndex.filter(_._1 > 0L).map { case (n, c) => (th, c, n) }
        }
      }.toDF("threshold", "case_idx", "n_partial")
        .groupBy("threshold", "case_idx")
        .agg(sum("n_partial").cast("long").as("n"))
        .select(col("threshold"), col("case_idx").cast("long").as("case_idx"), col("n"))
        .orderBy("threshold", "case_idx")
    }),

    // ---- segment conservation: total stitched ring segments per threshold
    //      (engine: sum over closed rings of nPts-1; oracle: per-case segment
    //      counts summed in SQL) ----
    "q_segment_count" -> ((spark, dir) => {
      import spark.implicits._
      val tiles = eventTiles(spark, dir)
      val eng = engine(spark, smooth = false)
      val closed = eng.closedRingRows(tiles)
      val ts = EventsGrid.Thresholds
      closed.filter(r => r.ti >= 0)
        .map(r => (ts(r.ti), r.pts.length.toLong / 2 - 1))
        .toDF("threshold", "segs")
        .groupBy("threshold").agg(sum("segs").as("segments"))
        .join(thresholdsDf(spark), Seq("threshold"), "right")
        .na.fill(0L, Seq("segments"))
        .select(col("threshold"), col("segments").cast("long").as("segments"))
        .orderBy("threshold")
    }),

    // ---- full contour pipeline: per-threshold structural stats ----
    "q_contours_stats" -> ((spark, dir) => {
      import spark.implicits._
      engine(spark).contours(eventTiles(spark, dir))
        .map { c =>
          val nPolys = c.polygons.length.toLong
          val nHoles = c.polygons.map(_.holes.length.toLong).sum
          val nPts = c.polygons.map(p => p.exterior.length / 2 +
            p.holes.map(_.length / 2).sum).sum.toLong
          (c.threshold, nPolys, nHoles, nPts)
        }
        .toDF("threshold", "n_polygons", "n_holes", "n_points")
        .orderBy("threshold")
    }),

    // ---- isolines stats ----
    "q_lines_stats" -> ((spark, dir) => {
      import spark.implicits._
      engine(spark).lines(eventTiles(spark, dir))
        .map(l => (l.threshold, l.lines.length.toLong,
          l.lines.map(_.length / 2).sum.toLong))
        .toDF("threshold", "n_lines", "n_points")
        .orderBy("threshold")
    }),

    // ---- isobands stats ----
    "q_isobands_stats" -> ((spark, dir) => {
      import spark.implicits._
      engine(spark).isobands(eventTiles(spark, dir))
        .map(b => (b.minV, b.maxV, b.polygons.length.toLong,
          b.polygons.map(_.holes.length.toLong).sum))
        .toDF("min_v", "max_v", "n_polygons", "n_holes")
        .orderBy("min_v")
    }),

    // ---- raw contour_rings (grid coords, no smoothing) ----
    "q_contour_rings_stats" -> ((spark, dir) => {
      import spark.implicits._
      engine(spark).contourRings(eventTiles(spark, dir))
        .map(r => (r.threshold, r.rings.length.toLong,
          r.rings.map(_.length / 2).sum.toLong))
        .toDF("threshold", "n_rings", "n_points")
        .orderBy("threshold")
    }),

    // ---- GeoJSON emission (deterministic serialization golden) ----
    "q_geojson" -> ((spark, dir) => {
      import spark.implicits._
      val cts = engine(spark).contours(eventTiles(spark, dir))
      cts.map { c =>
        val feat = GeoJson.contourFeature(ContourResult(c.threshold,
          c.polygons.map(p => Poly(p.exterior.toArray, p.holes.map(_.toArray)))))
        (c.threshold, feat.length.toLong,
          java.security.MessageDigest.getInstance("MD5")
            .digest(feat.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      }.toDF("threshold", "json_len", "json_md5")
        .orderBy("threshold")
    }),

    // ---- span-sequence invariant through append ----
    "q_span_invariant" -> ((spark, dir) => {
      implicit val s = spark
      import spark.implicits._
      val docs = DocCodec.encode(EventsGrid.tiles(spark, dir))
      val eng = engine(spark)
      val cts = eng.contours(DocCodec.decode(docs))
      val out = DocCodec.appendFeatures(docs, eng.contourFeatures(cts))
      val nViolations = DocCodec.spanInvariantViolations(docs, out).count()
      val nDocs = out.count()
      Seq((nDocs, nViolations, nViolations == 0)).toDF("n_docs", "n_violations", "ok")
    }),

    // ---- point-in-polygon tag join against the engine's own contours ----
    // Samples behave as unit pixels; the unsmoothed marching-squares curve
    // separates PIXEL CENTERS, so the center (x+0.5, y+0.5) is inside the
    // threshold-t MultiPolygon (even-odd over all rings) EXACTLY iff
    // value(x, y) >= t — which is what the DuckDB oracle checks relationally.
    "q_pip_tag" -> ((spark, dir) => {
      import spark.implicits._
      val cts = engine(spark, smooth = false).contours(eventTiles(spark, dir))
      val (w, _) = EventsGrid.dims(spark, dir)
      val points = spark.read.parquet(s"$dir/events.parquet")
        .selectExpr("event_id", s"cast(event_id % $w as double) + 0.5 as x",
          s"cast(event_id div $w as double) + 0.5 as y")
        .as[(Long, Double, Double)]
      graft.engine.SpatialOps.pipTag(spark, points, cts)
        .orderBy("point_id", "threshold")
    }),

    // ---- kNN join against emitted contour vertices ----
    "q_knn_vertices" -> ((spark, dir) => {
      import spark.implicits._
      val cts = engine(spark, smooth = false).contours(eventTiles(spark, dir))
      val verts = graft.engine.SpatialOps.contourVertices(spark, cts)
        .filter(col("threshold") === 50.0)
      val (w, _) = EventsGrid.dims(spark, dir)
      val queries = spark.read.parquet(s"$dir/events.parquet")
        .filter(col("event_id") < 50)
        .selectExpr("event_id", s"cast(event_id % $w as double) + 0.25 as x",
          s"cast(event_id div $w as double) + 0.25 as y")
        .as[(Long, Double, Double)]
      graft.engine.SpatialOps.knnVertices(spark, queries, verts, k = 5)
        .orderBy("query_id", "rank")
    }),

    // ---- tile assignment: point -> owning tile -> hierarchical Morton
    //      cell key (the stitch shuffle key), oracle-checked bit-for-bit ----
    "q_tile_assignment" -> ((spark, dir) => {
      import spark.implicits._
      val (w, _) = EventsGrid.dims(spark, dir)
      val tile = 50
      spark.read.parquet(s"$dir/events.parquet")
        .selectExpr("event_id", s"cast(event_id % $w as int) as x",
          s"cast(event_id div $w as int) as y")
        .as[(Long, Int, Int)]
        .map { case (id, x, y) =>
          val tx = x / tile
          val ty = y / tile
          val m = graft.index.CellIndex.morton(tx, ty)
          (id, tx.toLong, ty.toLong, m, graft.index.CellIndex.parent(m, 2))
        }
        .toDF("event_id", "tile_x", "tile_y", "cell", "parent_cell_l2")
        .orderBy("event_id")
    }),

    // ---- training-data ops over documents/embeddings ----
    "q_doc_exact_dup" -> TrainingOps.exactDup,
    "q_doc_token_stats" -> TrainingOps.tokenStats,
    "q_doc_quality" -> TrainingOps.qualityScore,
    "q_doc_lang_id" -> TrainingOps.langId,
    "q_doc_minhash" -> TrainingOps.minhashSignatures,
    "q_doc_minhash_pairs" -> TrainingOps.minhashDupPairs,
    "q_doc_jaccard_pairs" -> TrainingOps.jaccardPairs,
    "q_emb_near_dup" -> TrainingOps.embNearDup,
    "q_doc_winnow" -> TrainingOps.winnowFingerprints,
    "q_doc_simhash" -> TrainingOps.simhash,
    "q_doc_fingerprint" -> TrainingOps.fingerprint,
    "q_ann_topk" -> TrainingOps.annTopK,
    "q_ann_ivf_topk" -> TrainingOps.annIvfTopK,
    "q_ann_recall" -> TrainingOps.annRecall,

    // ---- multimodal binary columns (deterministic fake codec; real
    //      schema/partitioning/batch plumbing) ----
    "q_media_meta" -> ((spark, _) => {
      MultimodalOps.extractMeta(spark, MultimodalOps.syntheticMedia(spark, 300))
        .toDF().orderBy("mediaId")
    }),
    "q_media_pipeline" -> ((spark, _) => {
      val media = MultimodalOps.syntheticMedia(spark, 300)
      val processed = MultimodalOps.sampleFrames(spark,
        MultimodalOps.resizeImages(spark, media, 8, 8), 2)
      MultimodalOps.mediaFeatures(spark, processed).orderBy("media_id")
    })
  )

  /** DuckDB-equivalent SQL per query (omit => weaker rows-only check). */
  def oracleSql: Map[String, String] = Map(
    "q_threshold_class" ->
      """WITH ts(threshold) AS (VALUES (25.0),(50.0),(75.0),(100.0))
        |SELECT threshold,
        |       (SELECT count(*) FROM events WHERE value >= threshold)::BIGINT AS n
        |FROM ts ORDER BY threshold""".stripMargin,

    "q_cell_case_hist" ->
      """WITH dims AS (SELECT 100::INT AS w, (count(*) / 100)::INT AS h FROM events),
        |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
        |cells AS (
        |  SELECT t.threshold, cx.cx, cy.cy,
        |    COALESCE((b0.v >= t.threshold)::INT, 0) AS b0,
        |    COALESCE((b1.v >= t.threshold)::INT, 0) AS b1,
        |    COALESCE((b2.v >= t.threshold)::INT, 0) AS b2,
        |    COALESCE((b3.v >= t.threshold)::INT, 0) AS b3
        |  FROM (SELECT unnest(range(-1, (SELECT w FROM dims)))::INT AS cx) cx
        |  CROSS JOIN (SELECT unnest(range(-1, (SELECT h FROM dims)))::INT AS cy) cy
        |  CROSS JOIN (VALUES (25.0),(50.0),(75.0),(100.0)) t(threshold)
        |  LEFT JOIN g b0 ON b0.x = cx.cx     AND b0.y = cy.cy + 1
        |  LEFT JOIN g b1 ON b1.x = cx.cx + 1 AND b1.y = cy.cy + 1
        |  LEFT JOIN g b2 ON b2.x = cx.cx + 1 AND b2.y = cy.cy
        |  LEFT JOIN g b3 ON b3.x = cx.cx     AND b3.y = cy.cy)
        |SELECT threshold, (b0 + 2*b1 + 4*b2 + 8*b3)::BIGINT AS case_idx, count(*)::BIGINT AS n
        |FROM cells GROUP BY 1, 2 HAVING count(*) > 0 ORDER BY 1, 2""".stripMargin,

    "q_segment_count" ->
      """WITH dims AS (SELECT 100::INT AS w, (count(*) / 100)::INT AS h FROM events),
        |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
        |cells AS (
        |  SELECT t.threshold,
        |    COALESCE((b0.v >= t.threshold)::INT, 0)
        |      + 2 * COALESCE((b1.v >= t.threshold)::INT, 0)
        |      + 4 * COALESCE((b2.v >= t.threshold)::INT, 0)
        |      + 8 * COALESCE((b3.v >= t.threshold)::INT, 0) AS c
        |  FROM (SELECT unnest(range(-1, (SELECT w FROM dims)))::INT AS cx) cx
        |  CROSS JOIN (SELECT unnest(range(-1, (SELECT h FROM dims)))::INT AS cy) cy
        |  CROSS JOIN (VALUES (25.0),(50.0),(75.0),(100.0)) t(threshold)
        |  LEFT JOIN g b0 ON b0.x = cx.cx     AND b0.y = cy.cy + 1
        |  LEFT JOIN g b1 ON b1.x = cx.cx + 1 AND b1.y = cy.cy + 1
        |  LEFT JOIN g b2 ON b2.x = cx.cx + 1 AND b2.y = cy.cy
        |  LEFT JOIN g b3 ON b3.x = cx.cx     AND b3.y = cy.cy)
        |SELECT threshold,
        |  sum(CASE WHEN c IN (0, 15) THEN 0 WHEN c IN (5, 10) THEN 2 ELSE 1 END)::BIGINT AS segments
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pip_tag" ->
      """SELECT event_id AS point_id, threshold, (value >= threshold) AS inside
        |FROM events CROSS JOIN (VALUES (25.0),(50.0),(75.0),(100.0)) t(threshold)
        |ORDER BY point_id, threshold""".stripMargin,

    "q_tile_assignment" ->
      """WITH pts AS (SELECT event_id, ((event_id % 100) // 50)::BIGINT AS tx,
        |                    ((event_id // 100) // 50)::BIGINT AS ty FROM events),
        |sp AS (SELECT event_id, tx, ty,
        |  -- Morton bit-spread of tx (even bits) and ty (odd bits), same mask
        |  -- cascade as index.CellIndex.spread
        |  ((((((tx & 2147483647) | ((tx & 2147483647) << 16)) & 281470681808895
        |      | ((((tx & 2147483647) | ((tx & 2147483647) << 16)) & 281470681808895) << 8)) & 71777214294589695
        |      | (((((tx & 2147483647) | ((tx & 2147483647) << 16)) & 281470681808895
        |      | ((((tx & 2147483647) | ((tx & 2147483647) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095)) AS sx4,
        |  ((((((ty & 2147483647) | ((ty & 2147483647) << 16)) & 281470681808895
        |      | ((((ty & 2147483647) | ((ty & 2147483647) << 16)) & 281470681808895) << 8)) & 71777214294589695
        |      | (((((ty & 2147483647) | ((ty & 2147483647) << 16)) & 281470681808895
        |      | ((((ty & 2147483647) | ((ty & 2147483647) << 16)) & 281470681808895) << 8)) & 71777214294589695) << 4)) & 1085102592571150095)) AS sy4
        | FROM pts),
        |sp2 AS (SELECT event_id, tx, ty,
        |  (((sx4 | (sx4 << 2)) & 3689348814741910323) | (((sx4 | (sx4 << 2)) & 3689348814741910323) << 1)) & 6148914691236517205 AS sx,
        |  (((sy4 | (sy4 << 2)) & 3689348814741910323) | (((sy4 | (sy4 << 2)) & 3689348814741910323) << 1)) & 6148914691236517205 AS sy
        | FROM sp)
        |SELECT event_id, tx AS tile_x, ty AS tile_y,
        |       (sx | (sy << 1))::BIGINT AS cell,
        |       ((sx | (sy << 1)) >> 4)::BIGINT AS parent_cell_l2
        |FROM sp2 ORDER BY event_id""".stripMargin
  ) ++ TrainingOps.oracleSql
}

package graft

import org.apache.spark.sql.SparkSession

/** Per-query attribution harness for the optimization rounds (guide §1):
  * times every ops-leg query INDIVIDUALLY with the same session config,
  * same action (count) and same leg order as [[Bench]], so leg walls can
  * be attributed to queries without touching the frozen harness. Also
  * doubles as the plan-capture tool (SPARK_GRAFT_EXPLAIN_OUT) for the
  * committed plans/r06 evidence files.
  *
  * Env:
  *  - SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  *  - SPARK_GRAFT_CPUS     (default 32; ops run at min(16, cpus) like Bench)
  *  - SPARK_GRAFT_EXTRA_PASSES (default 2; min wall across passes)
  *  - SPARK_GRAFT_EXTRA_ONLY   (comma list of leg names or query names; default all)
  *  - SPARK_GRAFT_EXPLAIN_OUT  (dir: write `.explain("formatted")` per query instead of timing)
  *  - SPARK_GRAFT_EXPLAIN_SUFFIX (file suffix for plan capture, default "before")
  */
object BenchExtra {

  /** The ops legs, copied verbatim from Bench (whose fields are private and
    * frozen); keep in sync when a future build round adds a leg.
    */
  private[graft] val OpsLegs: Seq[(String, Seq[String])] = Seq(
    "ops" -> Seq("q_grid_pyramid", "q_pyramid_contours", "q_pip_tag", "q_evt_sessionize"),
    "ops2" -> Seq("q_zonal_stats", "q_grid_upsample", "q_auto_thresholds",
      "q_contour_moments", "q_doc_top_terms", "q_doc_char_terms"),
    "ops3" -> Seq("q_focal_mean", "q_grid_slope", "q_flow_dir", "q_pyramid_slope",
      "q_doc_decontam"),
    "ops4" -> Seq("q_idw_grid", "q_contour_near_dist", "q_zonal_slope",
      "q_doc_collocations"),
    "ops5" -> Seq("q_watershed", "q_kmeans_assign", "q_integral", "q_evt_window_join",
      "q_focal_median"),
    "ops6" -> Seq("q_clip_rings", "q_grid_cc", "q_viewshed", "q_evt_retention",
      "q_doc_pack", "q_media_phash"),
    "ops7" -> Seq("q_flow_accum", "q_convex_hull", "q_doc_quality_gate",
      "q_dist_transform", "q_evt_overlap", "q_evt_trend",
      "q_stream_power", "q_evt_transitions", "q_source_overlap"),
    "ops8" -> Seq("q_evt_hll", "q_evt_cms", "q_doc_kmv", "q_doc_bloom", "q_moran",
      "q_hist_equalize", "q_flow_len", "q_seg_crossings", "q_doc_simpson"),
    "ops9" -> Seq("q_doc_triangles", "q_evt_mad", "q_focal_majority", "q_local_moran",
      "q_evt_cusum"),
    "ops10" -> Seq("q_geary", "q_morton", "q_doc_novelty", "q_doc_assort",
      "q_evt_spearman"),
    "ops11" -> Seq("q_laplacian", "q_evt_spike", "q_cluster_mix", "q_doc_lcp",
      "q_doc_edit_dist", "q_source_tv"),
    "ops12" -> Seq("q_sobel", "q_evt_gaps", "q_doc_head_cov", "q_emb_energy"),
    "ops13" -> Seq("q_box_count", "q_evt_dau7", "q_evt_lifespan", "q_compactness", "q_evt_locf"),
    "ops14" -> Seq("q_getis", "q_hilbert", "q_cost_horizon", "q_doc_scrub"),
    "ops15" -> Seq("q_isochrone", "q_doc_kcore"),
    "ops16" -> Seq("q_variogram", "q_evt_growth", "q_emb_separation"),
    "ops17" -> Seq("q_tpi", "q_evt_gini", "q_emb_hamming", "q_doc_setsim"),
    "ops18" -> Seq("q_emb_pq", "q_doc_dedup_census", "q_evt_hourweek"),
    "ops19" -> Seq("q_ann_pq_recall", "q_doc_lang_confusion", "q_evt_markov", "q_tile_skew"),
    "ops20" -> Seq("q_evt_convert", "q_doc_lsh_recall", "q_kmeans_iterate"),
    "ops21" -> Seq("q_rel_pricing", "q_rel_revenue_nation", "q_rel_top_suppliers", "q_rel_priority"),
    "ops22" -> Seq("q_rel_weekly_trend", "q_rel_part_margin"),
    "ops23" -> Seq("q_rel_local_revenue", "q_rel_cust_dist", "q_rel_promo_share", "q_rel_balance_audit"),
    "ops24" -> Seq("q_rel_rollup", "q_rel_running", "q_rel_big_orders"),
    "ops25" -> Seq("q_rel_trade_matrix", "q_rel_top_customer"),
    "ops27" -> Seq("q_rel_reconcile", "q_rel_pivot", "q_evt_click_no_buy", "q_evt_click_and_buy",
      "q_evt_ntile", "q_rel_small_qty", "q_rel_cube", "q_rel_trailing",
      "q_rel_waiting", "q_rel_share", "q_rel_unpivot",
      "q_rel_cheapest", "q_evt_click_surplus", "q_rel_dominant",
      "q_rel_diversity", "q_rel_brand_revenue", "q_rel_benford",
      "q_rel_ship_priority", "q_rel_returned", "q_rel_lateness",
      "q_rel_market_share", "q_rel_profit"),
    "ops33" -> Seq("q_lake_skip", "q_lake_merge", "q_lake_zorder", "q_lake_delete", "q_lake_stats"),
    "ops34" -> Seq("q_lbp_hist", "q_evt_autocov", "q_critical_points", "q_contour_hausdorff",
      "q_contour_turning"),
    "ops35" -> Seq("q_blur5", "q_saddle_points", "q_doc_bm25", "q_doc_chi_terms",
      "q_evt_coverage", "q_rel_gsets"),
    "ops36" -> Seq("q_strahler", "q_hull_calipers", "q_doc_bfs_levels",
      "q_evt_haar", "q_evt_haar_energy"),
    "ops37" -> Seq("q_evt_mann_kendall", "q_evt_ordpat", "q_evt_ccf", "q_lake_diff",
      "q_evt_profile", "q_grid_pole", "q_grid_topology"),
    "ops38" -> Seq("q_doc_keyphrase", "q_evt_changepoint", "q_cc_nesting",
      "q_basin_borders"),
    "ops39" -> Seq("q_basin_pour", "q_grid_drainage", "q_basin_hypso", "q_evt_weekday",
      "q_evt_runs", "q_riparian"),
    "ops40" -> Seq("q_wetness", "q_evt_type_affinity", "q_basin_channel",
      "q_band_adjacency", "q_rel_basket", "q_basin_depth", "q_percolation"),
    "ops41" -> Seq("q_basin_melton", "q_doc_hapax"),
    "ops42" -> Seq("q_basin_elong", "q_flow_indegree"),
    "ops43" -> Seq("q_curvature", "q_flow_sinuosity"),
    "ops44" -> Seq("q_kmeans_silhouette", "q_basin_domdir"),
    "ops45" -> Seq("q_doc_containment", "q_source_containment"),
    "ops46" -> Seq("q_emb_jl", "q_glcm"),
    "ops47" -> Seq("q_evt_fano", "q_evt_simpson"),
    "ops48" -> Seq("q_fm_contours"),
    "ops49" -> Seq("q_doc_burstiness", "q_doc_sentences"),
    "ops50" -> Seq("q_doc_readability", "q_doc_yule"),
    "ops51" -> Seq("q_evt_ripley", "q_emb_dimstats"),
    "ops52" -> Seq("q_doc_mattr", "q_evt_nnd"),
    "ops53" -> Seq("q_evt_morisita", "q_evt_joincount"),
    "ops54" -> Seq("q_tophat", "q_glcm_stats"),
    "ops55" -> Seq("q_evt_tripley", "q_doc_zipf", "q_evt_crossk"),
    "ops56" -> Seq("q_med_contours"),
    "ops57" -> Seq("q_fm_isobands", "q_pyramid_isobands"))

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.ui.showConsoleProgress", "false")
      .config("spark.locality.wait", "0ms")
      .config("spark.sql.parquet.columnarReaderBatchSize", "32")
      .config("spark.sql.files.maxPartitionBytes", (64L << 20).toString)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val maxCpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val opsCpus = math.min(16, maxCpus)
    val passes = sys.env.getOrElse("SPARK_GRAFT_EXTRA_PASSES", "2").toInt
    val only = sys.env.get("SPARK_GRAFT_EXTRA_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val legs = only match {
      case None => OpsLegs
      case Some(sel) => OpsLegs
        .map { case (n, qs) => (n, if (sel(n)) qs else qs.filter(sel)) }
        .filter(_._2.nonEmpty)
    }

    sys.env.get("SPARK_GRAFT_EXPLAIN_OUT").foreach { outDir =>
      val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "before")
      val s = session(opsCpus)
      try {
        new java.io.File(outDir).mkdirs()
        for ((_, qs) <- legs; q <- qs) {
          val plan = SparkEntry.queries(q)(s, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$outDir/${q}_$suffix.txt")
          try w.write(plan) finally w.close()
          System.err.println(s"[explain] wrote $outDir/${q}_$suffix.txt")
          s.sqlContext.clearCache()
        }
      } finally s.stop()
      return
    }

    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    val legBest = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (pass <- 0 until passes) {
      val s = session(opsCpus)
      try legs.foreach { case (name, qs) =>
        val legT0 = System.nanoTime()
        qs.foreach { q =>
          s.sparkContext.setJobDescription(q)
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(q)(s, sfDir).count()
          val el = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[extra] pass=$pass leg=$name q=$q elapsed=$el%.2fs rows=$n")
          best(q) = math.min(best.getOrElse(q, Double.MaxValue), el)
        }
        s.sqlContext.clearCache()
        val legEl = (System.nanoTime() - legT0) / 1e9
        legBest(name) = math.min(legBest.getOrElse(name, Double.MaxValue), legEl)
      } finally s.stop()
    }
    val qJson = best.map { case (q, el) => s""""$q":$el""" }.mkString(",")
    val lJson = legBest.map { case (l, el) => s""""$l":$el""" }.mkString(",")
    println(s"""{"metric":"per_query_sec","value":${best.values.sum},"unit":"sec","queries":{$qJson},"legs":{$lJson},"sf":"$sfDir"}""")
    System.err.println("[extra] slowest queries:")
    best.toSeq.sortBy(-_._2).take(40).foreach { case (q, el) =>
      System.err.println(f"[extra]   $q%-24s ${el}%.2fs")
    }
  }
}

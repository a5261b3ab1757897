package graft

import graft.docs.DocCodec
import graft.engine.{ContourEngine, GridSynth}
import graft.model.{Doc, JobConfig}
import org.apache.spark.sql.SparkSession

/** Headline benchmark: marching-squares isoband extraction (23-threshold
  * volcano ladder, smooth=true) over a deterministic tiled synthetic DEM
  * stored as an interleaved document table.
  *
  * Metric: raster cells/sec where cells = gdx*gdy*|thresholds| (matching
  * BASELINE.md). No real multi-executor cluster exists in this sandbox, so
  * the two-cluster-size criterion is evidenced by running the same job on
  * the same input at N and 4N local executor threads; a full scaling curve
  * (1 -> 4 on the small input, 4 -> 16 and max on the large input) is
  * reported because the VM itself saturates at ~16 effective cores.
  *
  * The doc-table inputs are generated once under target/bench and reused;
  * walls are min-of-reps to reject VM-neighbor noise.
  */
object Bench {
  private val Thresholds = (90 to 200 by 5).map(_.toDouble)

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // the engine's shuffles carry few bytes but heavy per-group CPU
      // (assembly); byte-based AQE coalescing would serialize them
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.ui.showConsoleProgress", "false")
      .config("spark.locality.wait", "0ms") // local mode: never idle a core
      // blob rows carry ~0.5MB binary payloads: the default 4096-row reader
      // batch would reserve ~2GB contiguous per column vector; 32-row
      // batches keep the working set cache-resident
      .config("spark.sql.parquet.columnarReaderBatchSize", "32")
      // ~74 splits over the big input: enough waves to balance the
      // decode+kernel stage without paying per-task closure-deser overhead
      .config("spark.sql.files.maxPartitionBytes", (64L << 20).toString)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Generate `grids` volcano-style grids of side `side`, tiled `tile`^2,
    * as a doc table (exact contract schema, short media_refs) plus a binary
    * blob sidecar; idempotent per size signature. The sidecar keeps raster
    * payloads out of media_ref — a binary parquet column reads ~25% fewer
    * bytes than base64 and avoids the multi-MB UTF8String working sets that
    * thrashed shared cache at 16 threads.
    */
  private def ensureInput(spark: SparkSession, grids: Int, side: Int, tile: Int,
                          path: String): Unit = {
    implicit val s = spark
    if (new java.io.File(s"$path/docs", "_SUCCESS").exists() &&
        new java.io.File(s"$path/blobs", "_SUCCESS").exists()) return
    val parts = math.max(64, grids * ((side + tile - 1) / tile) * ((side + tile - 1) / tile) / 8)
    val tiles = (0 until grids).map { g =>
      GridSynth.tilesFromField(spark, s"bench$g",
        GridSynth.VolcanoField(42L + g, side, side), side, side, tile, tile,
        math.max(8, parts / grids))
    }.reduce(_ union _)
    val (docs, blobs) = DocCodec.encodeExternal(tiles)
    blobs.repartition(parts).write.mode("overwrite").parquet(s"$path/blobs")
    docs.repartition(8).write.mode("overwrite").parquet(s"$path/docs")
  }

  /** Second workload: the round-3 operator pipeline straight from the
    * contract surface — overview pyramid, contours over the pooled level,
    * the partitioned point-in-polygon join, and sessionization — over the
    * driver's sf parquet tables. One leg per pass (the pass structure
    * decorrelates the VM's noise phases); regression-guards the operators
    * the isoband headline never touches.
    */
  private val OpsQueries =
    Seq("q_grid_pyramid", "q_pyramid_contours", "q_pip_tag", "q_evt_sessionize")

  /** Third workload: the round-4 operator wave — zonal statistics (contours
    * + partitioned PIP + aggregation), bilinear upsample, exact quantile
    * thresholds, shoelace moments, and the two text rankers — same contract
    * surface, same interleaved min-of-passes discipline.
    */
  private val Ops2Queries =
    Seq("q_zonal_stats", "q_grid_upsample", "q_auto_thresholds",
      "q_contour_moments", "q_doc_top_terms", "q_doc_char_terms")

  /** Fourth workload: the round-5 wave — the halo-tiled raster window
    * family (focal mean, Horn slope, D8, plus the pyramid-slope
    * composition) and 5-gram decontamination — same discipline.
    */
  private val Ops3Queries =
    Seq("q_focal_mean", "q_grid_slope", "q_flow_dir", "q_pyramid_slope",
      "q_doc_decontam")

  /** The round-5 second wave: bucketed spatial joins (IDW, nearest-segment
    * distance), the zonal-of-slope composition, and the collocation text op.
    */
  private val Ops4Queries =
    Seq("q_idw_grid", "q_contour_near_dist", "q_zonal_slope",
      "q_doc_collocations")

  /** The round-5 fourth wave: watershed pointer doubling, the k-means
    * E-step, the integral-image scan composition, the bucketed
    * sliding-window join, and the focal median.
    */
  private val Ops5Queries =
    Seq("q_watershed", "q_kmeans_assign", "q_integral", "q_evt_window_join",
      "q_focal_median")

  /** The round-5 fifth wave: the bbox-clipped contour pipeline, raster
    * connected components over the level-2 overview, the exact-rational
    * viewshed scan, cohort retention, greedy sequence packing, and the
    * aHash media near-dup join.
    */
  private val Ops6Queries =
    Seq("q_clip_rings", "q_grid_cc", "q_viewshed", "q_evt_retention",
      "q_doc_pack", "q_media_phash")

  /** The round-5 sixth wave: flow accumulation (doubled composition over
    * the D8 forest), the two-level distributed convex hull, the composite
    * quality gate, the separable L1 distance transform, and the
    * interval-overlap join.
    */
  private val Ops7Queries =
    Seq("q_flow_accum", "q_convex_hull", "q_doc_quality_gate",
      "q_dist_transform", "q_evt_overlap", "q_evt_trend",
      "q_stream_power", "q_evt_transitions", "q_source_overlap")

  /** The round-5 eighth wave: the sketch family (HLL registers, count-min
    * cells, KMV per source, Bloom membership census), Moran's I through
    * the tiled kernel, histogram equalization, payload-doubled flow
    * length, and the segment-crossing overlay.
    */
  private val Ops8Queries =
    Seq("q_evt_hll", "q_evt_cms", "q_doc_kmv", "q_doc_bloom", "q_moran",
      "q_hist_equalize", "q_flow_len", "q_seg_crossings", "q_doc_simpson")

  /** The round-5 ninth wave: degree-ordered triangle counting over the
    * LSH pair graph, per-type MAD via the double histogram-window
    * selection, the focal majority (mode) and local Moran (LISA) tiled
    * kernels, and the per-user CUSUM change-point statistic.
    */
  private val Ops9Queries =
    Seq("q_doc_triangles", "q_evt_mad", "q_focal_majority", "q_local_moran",
      "q_evt_cusum")

  /** The round-5 tenth wave: Geary's C and the Morton block index through
    * the raster family, shingle novelty, LSH-graph degree assortativity,
    * and the per-type Spearman rank drift statistic.
    */
  private val Ops10Queries =
    Seq("q_geary", "q_morton", "q_doc_novelty", "q_doc_assort",
      "q_evt_spearman")

  /** The round-5 eleventh wave: the Laplacian tiled kernel, the hour
    * burst ratio, dup-cluster source mix, the bucketed-global-sort
    * neighbour LCP, and (spec-only) streaming exact top-k — plus wave
    * 43's neighbour edit distance (the same successor frame) and the
    * pairwise source total-variation matrix.
    */
  private val Ops11Queries =
    Seq("q_laplacian", "q_evt_spike", "q_cluster_mix", "q_doc_lcp",
      "q_doc_edit_dist", "q_source_tv")

  /** The round-5 twelfth wave: the Sobel tiled kernel, the inter-arrival
    * gap spectrum, Zipf head coverage, and the embedding energy census.
    */
  private val Ops12Queries =
    Seq("q_sobel", "q_evt_gaps", "q_doc_head_cov", "q_emb_energy")

  /** The round-5 thirteenth wave: box counting through the contour
    * pipeline, the trailing-7-day active curve, and the user lifespan
    * census (the lake snapshot diff is spec-only).
    */
  private val Ops13Queries =
    Seq("q_box_count", "q_evt_dau7", "q_evt_lifespan", "q_compactness", "q_evt_locf")

  /** The round-5 fourteenth wave: Getis-Ord hotspot share, Hilbert block
    * index, the K-halo cost-distance horizon, and the PII scrub census.
    */
  private val Ops14Queries =
    Seq("q_getis", "q_hilbert", "q_cost_horizon", "q_doc_scrub")

  /** The round-5 fifteenth wave: the isochrone composition (K-halo cost
    * relaxation through the full contour pipeline) and 2-core peeling
    * (rebuilds the LSH graph — the standalone-contract cost, like
    * cluster_mix).
    */
  private val Ops15Queries = Seq("q_isochrone", "q_doc_kcore")

  /** The round-5 sixteenth wave: directional variogram, growth
    * accounting, embedding label-separation matrix.
    */
  private val Ops16Queries = Seq("q_variogram", "q_evt_growth", "q_emb_separation")

  /** The round-5 seventeenth wave: multi-scale TPI landform census,
    * exact activity Gini, the linear-time label Hamming matrix, and the
    * prefix-filtered exact set-similarity join.
    */
  private val Ops17Queries =
    Seq("q_tpi", "q_evt_gini", "q_emb_hamming", "q_doc_setsim")

  /** The round-5 eighteenth wave: product-quantization assignment census,
    * post-dedup corpus census (rebuilds the LSH keep-list — the
    * standalone-contract cost), and the hour-of-week load profile
    * (streaming quantile locator is spec-only).
    */
  private val Ops18Queries =
    Seq("q_emb_pq", "q_doc_dedup_census", "q_evt_hourweek")

  /** The round-5 nineteenth wave: PQ-ADC recall harness, language-ID
    * confusion matrix, Markov stationary power iteration, tile-skew
    * audit.
    */
  private val Ops19Queries =
    Seq("q_ann_pq_recall", "q_doc_lang_confusion", "q_evt_markov", "q_tile_skew")

  /** The round-5 twentieth wave: time-to-convert quantiles, the LSH
    * recall audit (rebuilds BOTH exact and band pair pipelines — the
    * standalone-contract cost), and the Lloyd iteration census.
    */
  private val Ops20Queries =
    Seq("q_evt_convert", "q_doc_lsh_recall", "q_kmeans_iterate")

  /** The round-5 twenty-first wave: the relational warehouse family
    * (Q1-shaped pricing, three-hop nation revenue, registry top-k,
    * EXISTS priority audit).
    */
  private val Ops21Queries =
    Seq("q_rel_pricing", "q_rel_revenue_nation", "q_rel_top_suppliers", "q_rel_priority")

  /** The round-5 twenty-second wave: weekly region revenue trend (the
    * full four-hop dimension chain) and the per-part-type margin census.
    */
  private val Ops22Queries = Seq("q_rel_weekly_trend", "q_rel_part_margin")

  /** The round-5 twenty-third wave: dual-chain local revenue, trailing
    * left-outer customer distribution, conditional promo share, and the
    * mean-threshold anti-join balance audit.
    */
  private val Ops23Queries =
    Seq("q_rel_local_revenue", "q_rel_cust_dist", "q_rel_promo_share", "q_rel_balance_audit")

  /** The round-5 twenty-fourth wave: ROLLUP grouping sets, per-customer
    * running revenue window, HAVING + rejoin big-order report.
    */
  private val Ops24Queries = Seq("q_rel_rollup", "q_rel_running", "q_rel_big_orders")

  /** The round-5 twenty-fifth wave: Q7 bilateral trade matrix and the
    * per-nation argmax customer.
    */
  private val Ops25Queries = Seq("q_rel_trade_matrix", "q_rel_top_customer")

  /** The round-5 twenty-seventh/eighth/thirtieth waves: full-outer
    * reconciliation, the static-list pivot, the (user, day) set-EXCEPT /
    * set-INTERSECT rollups, and the ntile quartile census — plus waves
    * 35/36's relational faces (Q17-shaped small-quantity audit, full
    * CUBE rollup), wave 41's RANGE-frame trailing revenue, and wave
    * 42's Q21-shaped waiting-supplier audit, Q11-shaped share-of-total
    * threshold and the pivot->unpivot round trip.
    */
  private val Ops27Queries =
    Seq("q_rel_reconcile", "q_rel_pivot", "q_evt_click_no_buy", "q_evt_click_and_buy",
      "q_evt_ntile", "q_rel_small_qty", "q_rel_cube", "q_rel_trailing",
      "q_rel_waiting", "q_rel_share", "q_rel_unpivot",
      "q_rel_cheapest", "q_evt_click_surplus", "q_rel_dominant",
      "q_rel_diversity", "q_rel_brand_revenue", "q_rel_benford",
      "q_rel_ship_priority", "q_rel_returned", "q_rel_lateness",
      "q_rel_market_share", "q_rel_profit")

  /** The round-5 lake-DML waves (33/34/38/39): each query COMMITS the
    * fact table into a throwaway lake table first, so this leg measures
    * snapshot write + zone-map-pruned rewrite cost, deliberately apart
    * from the read-algebra legs.
    */
  private val Ops33Queries =
    Seq("q_lake_skip", "q_lake_merge", "q_lake_zorder", "q_lake_delete", "q_lake_stats")

  /** The round-5 waves 47/49/50/51: the LBP texture histogram and the
    * critical-point census through the tiled kernel, the lag-7
    * autocovariance census of daily event counts, the R-clipped
    * Hausdorff drift census between consecutive-threshold contours, and
    * the turning (convexity) census over the rings (the latter two
    * rebuild the contour pipeline — the standalone-contract cost).
    */
  private val Ops34Queries =
    Seq("q_lbp_hist", "q_evt_autocov", "q_critical_points", "q_contour_hausdorff",
      "q_contour_turning")

  /** Fifty-fourth/fifty-fifth waves: the K=2-halo binomial blur + the
    * saddle census (both zero-raster-shuffle tiled kernels), and the
    * BM25 retrieval scoring + chi-square keyword extraction over the
    * documents (candidate-filtered vs vocabulary-windowed text plans),
    * plus the day-split union-of-intervals coverage sweep and the
    * explicit GROUPING SETS pass (waves 57).
    */
  private val Ops35Queries =
    Seq("q_blur5", "q_saddle_points", "q_doc_bm25", "q_doc_chi_terms",
      "q_evt_coverage", "q_rel_gsets")

  /** Fifty-eighth/fifty-ninth/sixtieth waves: the Strahler level-set
    * rounds over the D8 forest (the round-per-order graph scheme), the
    * caliper diameter/width over the two-level distributed hull, the
    * multi-source BFS level census over the LSH pair graph (frontier +
    * anti-join rounds), and the integer Haar pyramid + its energy
    * rollup over daily event counts (the chained-halving level loop).
    */
  private val Ops36Queries =
    Seq("q_strahler", "q_hull_calipers", "q_doc_bfs_levels",
      "q_evt_haar", "q_evt_haar_energy")

  /** Sixty-first through sixty-third waves: the Mann–Kendall pairwise
    * trend census + the ordinal-pattern census (both over the
    * calendar-bounded daily frame), the cross-type lag CCF fan-out, the
    * lake snapshot diff (two commits + a time-travel full-outer-join CDC
    * census — write-path cost included by design, like ops33), the L1
    * matrix-profile census, and the pole-of-inaccessibility argmax over
    * the six-scan separable transform.
    */
  private val Ops37Queries =
    Seq("q_evt_mann_kendall", "q_evt_ordpat", "q_evt_ccf", "q_lake_diff",
      "q_evt_profile", "q_grid_pole", "q_grid_topology")

  /** Sixty-fifth through sixty-eighth waves: RAKE keyphrase extraction
    * (the positional text plan — segment windows + degree/freq rollup +
    * the phrase regroup, all doc-keyed), the depth-2 binary-segmentation
    * change points (prefix-window CUSUM recursion, one user_id
    * exchange), the component-nesting census over the threshold ladder
    * (the shared tile-contracted labeling + one cell-keyed self-join),
    * and the basin border census (two id-arithmetic label joins over the
    * pointer-doubling watershed labels).
    */
  private val Ops38Queries =
    Seq("q_doc_keyphrase", "q_evt_changepoint", "q_cc_nesting",
      "q_basin_borders")

  /** Sixty-ninth through seventy-first waves: the pour-point saddle
    * census + the drainage-density histogram (both riding the pointer-
    * doubling watershed labels), the hypsometric decile histogram (the
    * per-basin elevation-mass rollup), the weekday-seasonal residual
    * census + the Wald–Wolfowitz runs census (integer dow-profile and
    * doubled-median over the calendar-bounded daily frame), and the
    * riparian buffer census (Moore-shift set algebra over the channel
    * network).
    */
  private val Ops39Queries =
    Seq("q_basin_pour", "q_grid_drainage", "q_basin_hypso", "q_evt_weekday",
      "q_evt_runs", "q_riparian")

  /** Seventy-second/seventy-third waves: the wetness matrix (digit-count
    * log2 acc-bucket x slope-bucket 2D rollup on the stream-power join
    * shape), the type-affinity user-set overlap matrix (distinct
    * (user, type) frame self-joined per user), and the main-channel
    * length histogram (flow-length x watershed labels composed on the
    * shared level-1 feed).
    */
  private val Ops40Queries =
    Seq("q_wetness", "q_evt_type_affinity", "q_basin_channel",
      "q_band_adjacency", "q_rel_basket", "q_basin_depth", "q_percolation")

  /** Seventy-eighth wave onward: the Melton ruggedness census (per-basin
    * relief^2/area on the pointer-doubling watershed labels, digit-count
    * log2 buckets) and the per-doc corpus-hapax decile census (tf frame
    * -> token-keyed hapax semi-join -> doc rollup).
    */
  private val Ops41Queries =
    Seq("q_basin_melton", "q_doc_hapax")

  /** Eightieth wave onward: the basin shape census (per-basin bbox fill
    * decile + milli-scaled aspect ratio, pure id arithmetic on the
    * watershed labels) and the D8 in-degree census (inflow counts by one
    * map-side-combinable groupBy on succ).
    */
  private val Ops42Queries =
    Seq("q_basin_elong", "q_flow_indegree")

  /** Eighty-first/-second waves: the Zevenbergen-Thorne curvature pair
    * (two second-derivative stats through one tiled kernel pass) and the
    * flow-path sinuosity census (payload doubling with the sink carried,
    * then a joinless integer bucket fold).
    */
  private val Ops43Queries =
    Seq("q_curvature", "q_flow_sinuosity")

  /** Eighty-third/-fourth waves: the integer simplified-silhouette census
    * (both k-means distances from one broadcast packed-key sort) and the
    * basin dominant-direction census (modal D8 step per watershed by one
    * packed count-major argmax).
    */
  private val Ops44Queries =
    Seq("q_kmeans_silhouette", "q_basin_domdir")

  /** Eighty-fifth/-sixth waves: the doc-pair containment census (Broder
    * max-containment over the LSH candidates) and the cross-source
    * shingle-containment matrix.
    */
  private val Ops45Queries =
    Seq("q_doc_containment", "q_source_containment")

  /** Eighty-seventh/-eighth waves: the JL norm-distortion census (integer
    * sign projections from md5 bits, one posexplode + one rollup) and the
    * Haralick GLCM texture census (16 gray levels, two shift joins).
    */
  private val Ops46Queries =
    Seq("q_emb_jl", "q_glcm")

  /** Eighty-ninth/ninetieth waves: the Fano-factor burstiness census
    * (global-span binning + per-user count dispersion, all integer) and
    * the per-user event-type Simpson concentration census.
    */
  private val Ops47Queries =
    Seq("q_evt_fano", "q_evt_simpson")

  /** Ninety-first wave: low-pass contouring — the full distributed
    * contour pipeline composed over the tiled focal-mean field.
    */
  private val Ops48Queries =
    Seq("q_fm_contours")

  /** Ninety-second/-third waves: Church-Gale token burstiness and the
    * sentence-length census.
    */
  private val Ops49Queries =
    Seq("q_doc_burstiness", "q_doc_sentences")

  /** Ninety-fourth wave: Flesch reading-ease band census and Yule's K
    * vocabulary-richness census — both joinless integer-exact folds.
    */
  private val Ops50Queries =
    Seq("q_doc_readability", "q_doc_yule")

  /** Ninety-fifth wave: Ripley's K point-pattern census (9x bucket
    * fan-out pair joins at three radii) and the per-dimension embedding
    * health census (one posexplode, dims-sized output).
    */
  private val Ops51Queries =
    Seq("q_evt_ripley", "q_emb_dimstats")

  /** Ninety-sixth wave: MATTR lexical-diversity windows (zero-shuffle
    * until the fold) and the nearest-neighbor-distance G census.
    */
  private val Ops52Queries =
    Seq("q_doc_mattr", "q_evt_nnd")

  /** Ninety-seventh wave: Morisita quadrat-dispersion and Cliff-Ord
    * join-count censuses — the quadrat and adjacency views of the
    * point-pattern family.
    */
  private val Ops53Queries =
    Seq("q_evt_morisita", "q_evt_joincount")

  /** Ninety-eighth wave: white top-hat (K=2 composed-morphology tiled
    * kernel) and the Haralick GLCM scalar rollup.
    */
  private val Ops54Queries =
    Seq("q_tophat", "q_glcm_stats")

  /** Ninety-ninth wave: temporal Ripley (1-D 3-offset bin joins) and the
    * Zipf rank-mass census.
    */
  private val Ops55Queries =
    Seq("q_evt_tripley", "q_doc_zipf", "q_evt_crossk")

  /** Hundredth wave: median-filtered isolines — the nonlinear-filter
    * composition through the full distributed pipeline (lines path;
    * see the SparkEntry comment for the plateau rationale).
    */
  private val Ops56Queries =
    Seq("q_med_contours")

  /** Hundred-first/-second waves: isobands over the focal-mean field and
    * over the pyramid's level-1 overview — the band path composed behind
    * the low-pass filter and the 2x2 pooling.
    */
  private val Ops57Queries =
    Seq("q_fm_isobands", "q_pyramid_isobands")

  /** All ops legs, in bench order: (json key prefix, queries). */
  private val OpsLegs = Seq(
    "ops" -> OpsQueries, "ops2" -> Ops2Queries, "ops3" -> Ops3Queries,
    "ops4" -> Ops4Queries, "ops5" -> Ops5Queries, "ops6" -> Ops6Queries,
    "ops7" -> Ops7Queries, "ops8" -> Ops8Queries, "ops9" -> Ops9Queries,
    "ops10" -> Ops10Queries, "ops11" -> Ops11Queries,
    "ops12" -> Ops12Queries, "ops13" -> Ops13Queries,
    "ops14" -> Ops14Queries, "ops15" -> Ops15Queries,
    "ops16" -> Ops16Queries, "ops17" -> Ops17Queries,
    "ops18" -> Ops18Queries, "ops19" -> Ops19Queries,
    "ops20" -> Ops20Queries, "ops21" -> Ops21Queries,
    "ops22" -> Ops22Queries, "ops23" -> Ops23Queries,
    "ops24" -> Ops24Queries, "ops25" -> Ops25Queries,
    "ops27" -> Ops27Queries, "ops33" -> Ops33Queries,
    "ops34" -> Ops34Queries, "ops35" -> Ops35Queries,
    "ops36" -> Ops36Queries, "ops37" -> Ops37Queries,
    "ops38" -> Ops38Queries, "ops39" -> Ops39Queries,
    "ops40" -> Ops40Queries, "ops41" -> Ops41Queries,
    "ops42" -> Ops42Queries, "ops43" -> Ops43Queries,
    "ops44" -> Ops44Queries, "ops45" -> Ops45Queries,
    "ops46" -> Ops46Queries, "ops47" -> Ops47Queries,
    "ops48" -> Ops48Queries, "ops49" -> Ops49Queries,
    "ops50" -> Ops50Queries, "ops51" -> Ops51Queries,
    "ops52" -> Ops52Queries, "ops53" -> Ops53Queries,
    "ops54" -> Ops54Queries, "ops55" -> Ops55Queries,
    "ops56" -> Ops56Queries, "ops57" -> Ops57Queries)

  private def runQueriesOnce(spark: SparkSession, sfDir: String, qs: Seq[String]): Long =
    try qs.map(q => SparkEntry.queries(q)(spark, sfDir).count()).sum
    finally spark.sqlContext.clearCache()

  private def runOnce(spark: SparkSession, path: String, maxTileCoord: Int): Long = {
    implicit val s = spark
    import spark.implicits._
    val docs = spark.read.parquet(s"$path/docs").as[Doc]
    val blobs = spark.read.parquet(s"$path/blobs")
    val eng = new ContourEngine(spark, JobConfig(Thresholds, smooth = true))
    val n = eng.isobands(DocCodec.decodeExternal(docs, blobs), Some(maxTileCoord))
      .map(b => b.polygons.length.toLong).reduce(_ + _)
    spark.sqlContext.clearCache() // reps stay independent (persisted rounds)
    n
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val maxCpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val tile = sys.env.getOrElse("SPARK_GRAFT_BENCH_TILE", "256").toInt
    val side = sys.env.getOrElse("SPARK_GRAFT_BENCH_SIDE", "1024").toInt
    val gridsSmall = sys.env.getOrElse("SPARK_GRAFT_BENCH_GRIDS_SMALL", "96").toInt
    val gridsBig = sys.env.getOrElse("SPARK_GRAFT_BENCH_GRIDS", "288").toInt
    val maxTileCoord = (side + tile - 1) / tile - 1
    def cellsOf(g: Int): Long = g.toLong * side * side * Thresholds.length
    def pathOf(g: Int): String = s"target/bench/docs-g$g-s$side-t$tile"
    val warmPath = s"target/bench/docs-warm-s$tile"

    val gen0 = System.nanoTime()
    locally {
      val s = session(maxCpus)
      ensureInput(s, 2, 2 * tile, tile, warmPath)
      ensureInput(s, gridsSmall, side, tile, pathOf(gridsSmall))
      ensureInput(s, gridsBig, side, tile, pathOf(gridsBig))
      s.stop()
    }
    val genSec = (System.nanoTime() - gen0) / 1e9

    // scaling curve: same job, same input, N vs 4N executor threads, at
    // three N choices. This VM advertises 32 CPUs but delivers ~16
    // effective cores for spin work and fewer for memory-streaming work
    // (per-core throughput drops once the shared cache path saturates), so
    // the cleanest N->4N evidence is 1->4 / 2->8; 4->16 brushes the memory
    // ceiling and 16->32 measures the VM, not the engine.
    //
    // VM-neighbor noise arrives in multi-minute PHASES (identical runs
    // minutes apart differ up to ~70%), so consecutive reps of one leg
    // share a phase: the legs are INTERLEAVED across two passes and the
    // min wall accumulates across both — wall noise is strictly additive,
    // so min-of-decorrelated-reps estimates the true time.
    def legsOf(pass: Int): Seq[(Int, Int)] =
      Seq((1, gridsSmall), (4, gridsSmall), (2, gridsBig), (8, gridsBig),
        (4, gridsBig), (16, gridsBig)) ++
        // the hardware-ceiling leg needs no second pass
        (if (maxCpus != 16 && pass == 0) Seq((maxCpus, gridsBig)) else Nil)
    val best = scala.collection.mutable.Map[(Int, Int), Double]().withDefaultValue(Double.MaxValue)
    val perPass = scala.collection.mutable.Map[(Int, (Int, Int)), Double]().withDefaultValue(Double.MaxValue)
    def runLeg(pass: Int, cpus: Int, grids: Int): Unit = {
      val s = session(cpus)
      // the slowest legs (1-2 cores) carry one rep per pass; min-of-passes
      // plus the adaptive retry below still decorrelates their noise
      val nReps = if (cpus <= 2) math.max(1, reps - 1) else math.max(1, reps)
      try {
        runOnce(s, warmPath, 0) // JIT + codepath warmup
        for (r <- 0 until nReps) {
          val t0 = System.nanoTime()
          val nPolys = runOnce(s, pathOf(grids), maxTileCoord)
          val el = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench] pass=$pass cpus=$cpus grids=$grids rep=$r elapsed=$el%.2fs polys=$nPolys tput=${cellsOf(grids) / el / 1e6}%.1f Mcells/s")
          best((cpus, grids)) = math.min(best((cpus, grids)), el)
          perPass((pass, (cpus, grids))) = math.min(perPass((pass, (cpus, grids))), el)
        }
      } finally s.stop()
    }
    val passes = 2
    val opsCpus = math.min(16, maxCpus)
    val opsBest = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    val opsRows = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    def runOpsLeg(pass: Int): Unit = {
      val s = session(opsCpus)
      try OpsLegs.foreach { case (name, queries) =>
        val t0 = System.nanoTime()
        opsRows(name) = runQueriesOnce(s, sfDir, queries)
        val el = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] pass=$pass ${name}_pipeline cpus=$opsCpus elapsed=$el%.2fs rows=${opsRows(name)}")
        opsBest(name) = math.min(opsBest(name), el)
      } finally s.stop()
    }
    // SPARK_GRAFT_BENCH_OPS_ONLY=ops8,ops9 (or "all"): run just the named
    // ops legs, skip the isoband curve — the fast iteration loop when a
    // wave adds a leg. Interleaving (min across passes) is kept.
    sys.env.get("SPARK_GRAFT_BENCH_OPS_ONLY").foreach { sel =>
      val keep = sel.split(",").map(_.trim).filter(_.nonEmpty).toSet
      val legs = if (keep("all")) OpsLegs else OpsLegs.filter(t => keep(t._1))
      for (pass <- 0 until passes) {
        val s = session(opsCpus)
        try legs.foreach { case (name, queries) =>
          val t0 = System.nanoTime()
          opsRows(name) = runQueriesOnce(s, sfDir, queries)
          val el = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench] pass=$pass ${name}_pipeline cpus=$opsCpus elapsed=$el%.2fs rows=${opsRows(name)}")
          opsBest(name) = math.min(opsBest(name), el)
        } finally s.stop()
      }
      val legJson = legs.map { case (name, _) =>
        s""""${name}_pipeline_c$opsCpus":${opsBest(name)},"${name}_pipeline_rows":${opsRows(name)}"""
      }.mkString(",")
      println(s"""{"metric":"ops_only","value":0,"unit":"sec","queries":{$legJson},"sf":"$sfDir"}""")
      return
    }
    for (pass <- 0 until passes) {
      for ((cpus, grids) <- legsOf(pass)) runLeg(pass, cpus, grids)
      runOpsLeg(pass) // interleaved: one ops rep per pass
    }
    // adaptive third pass: a leg whose two passes disagree badly was likely
    // noise-trapped in both phases; retry the 3 worst (bounded runtime)
    val retry = legsOf(1)
      .map { leg =>
        val a = perPass((0, leg)); val b = perPass((1, leg))
        (leg, math.abs(a - b) / math.min(a, b))
      }
      .filter(_._2 > 0.25).sortBy(-_._2).take(3)
    for (((cpus, grids), _) <- retry) runLeg(2, cpus, grids)
    val e1 = best((1, gridsSmall))
    val e4small = best((4, gridsSmall))
    val e2 = best((2, gridsBig))
    val e8 = best((8, gridsBig))
    val e4 = best((4, gridsBig))
    val e16 = best((16, gridsBig))
    val eMax = if (maxCpus != 16) best((maxCpus, gridsBig)) else e16
    val tput = (g: Int, el: Double) => cellsOf(g) / el
    val t16 = tput(gridsBig, e16)
    val tMax = tput(gridsBig, eMax)
    val eff14 = (tput(gridsSmall, e4small) / tput(gridsSmall, e1)) / 4.0
    val eff28 = (tput(gridsBig, e8) / tput(gridsBig, e2)) / 4.0
    val eff416 = (t16 / tput(gridsBig, e4)) / 4.0
    val headline = math.max(t16, tMax)

    val qs = Seq(
      s""""isobands_g${gridsSmall}_c1":$e1""",
      s""""isobands_g${gridsSmall}_c4":$e4small""",
      s""""isobands_g${gridsBig}_c2":$e2""",
      s""""isobands_g${gridsBig}_c8":$e8""",
      s""""isobands_g${gridsBig}_c4":$e4""",
      s""""isobands_g${gridsBig}_c16":$e16""",
      s""""isobands_g${gridsBig}_c$maxCpus":$eMax""",
      s""""tput_c16":$t16""",
      s""""tput_c$maxCpus":$tMax""",
      s""""scaling_efficiency_1_to_4":$eff14""",
      s""""scaling_efficiency_2_to_8":$eff28""",
      s""""scaling_efficiency_4_to_16":$eff416""",
      OpsLegs.map { case (name, _) =>
        s""""${name}_pipeline_c$opsCpus":${opsBest(name)},"${name}_pipeline_rows":${opsRows(name)}"""
      }.mkString(","),
      s""""gen_sec":$genSec""",
      s""""cells":${cellsOf(gridsBig)}"""
    ).mkString("{", ",", "}")
    println(s"""{"metric":"isoband_cells_per_sec","value":$headline,"unit":"cells/sec","queries":$qs,"sf":"$sfDir"}""")
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watershed delineation over the D8 flow graph — the hydrology
  * composition on top of the tiled raster kernels: every interior cell's
  * steepest-descent successor (core.RasterKernel.d8SuccCells, zero raster
  * shuffle) defines a FUNCTIONAL FOREST (acyclic: a successor exists only
  * on a quantized drop >= 1 quantum, so elevation strictly decreases along
  * every path), and each cell's basin is the terminal its path reaches —
  * a pit (no positive drop) or a boundary cell outside the interior.
  *
  * Labeling runs by POINTER DOUBLING, not step-by-step peeling: each round
  * joins the pointer table with itself (ptr' = ptr[ptr] where defined), so
  * after k rounds every pointer has advanced 2^k hops — O(log longest
  * flow path) rounds total, each ONE narrow shuffle join of (id, cur)
  * longs, vs the O(path length) rounds of topological peeling. The same
  * genus as TrainingOps.connectedComponents (hash-min CC), with the same
  * per-round lineage truncation; convergence is a per-round metadata-sized
  * semi-join count against the STATIC non-terminal key set (a pointer is
  * done iff it no longer lands on a key that itself has a successor).
  */
object HydroOps {

  /** Backstop on doubling rounds: 2^64 hops covers any path a Long cell id
    * can index, so hitting this cap is a loud failure (a cycle — which the
    * strict-descent construction rules out), never a truncation.
    */
  private val MaxRounds = 64

  // ---- shared hydrology feeds (optimization guide §2.4 / round-5 verdict
  //      item #1): the D8 successor forests, the pointer-doubling labels,
  //      the downstream-pair set, the accumulation/flow-length tables and
  //      the level-1 slope are each ONE deterministic function of the
  //      parquet inputs, consumed by 3-10 contract queries. Feeds.shared
  //      computes each once per (session, dir) — the first consumer pays
  //      the full build inside its own timed region; results are
  //      bit-identical (same frames, materialized). ----

  /** Base-grid D8 successor forest (id, succ). */
  private def baseSucc(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "hydro_succ0") {
      import spark.implicits._
      val (w, h) = EventsGrid.dims(spark, dir)
      RasterOps.d8SuccCellsTiledOf(
        RasterOps.baseCells(spark, dir).as[(Int, Int, Double)], w, h)
    }

  /** Base-grid watershed labels (id, sink) — the pointer-doubling output. */
  private def baseLabels(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "hydro_labels0") { basinLabels(baseSucc(spark, dir)) }

  /** Level-1 D8 successor forest. */
  private def l1SuccF(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "hydro_succ1") { level1Succ(spark, dir) }

  /** Level-1 transitive downstream pairs (anc, node). */
  private def l1Pairs(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "hydro_pairs1") { downstreamPairs(l1SuccF(spark, dir)) }

  /** Level-1 flow accumulation (id, acc). */
  private def l1Acc(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "hydro_acc1") {
      accCellsOf(l1Pairs(spark, dir), l1SuccF(spark, dir))
    }

  /** Level-1 watershed labels. */
  private def l1Labels(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "hydro_labels1") { basinLabels(l1SuccF(spark, dir)) }

  /** Level-1 per-cell flow lengths (id, nc, nd, sink). */
  private def l1FlowLen(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "hydro_flowlen1") {
      val (w, _) = EventsGrid.dims(spark, dir)
      flowLengths(l1SuccF(spark, dir), w / 2)
    }

  /** Level-1 quantized Horn slope (id, qslope). */
  private def l1Slope(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "hydro_slope1") {
      val (c1, w1, h1) = RasterOps.level1Cells(spark, dir)
      RasterOps.slopeCellsTiledOf(c1, w1, h1, 25, 25)
        .select(col("point_id").as("id"), col("qv").as("qslope"))
    }

  /** Resolve each cell of the (id, succ) successor table (succ = -1 for
    * pits) to its terminal: (id, sink). Pits are their own sinks;
    * successors that are not themselves keys (boundary cells) are sinks.
    */
  private[graft] def basinLabels(succ: DataFrame): DataFrame = {
    // cells that HAVE a successor — the only ones needing resolution; the
    // key set is static across rounds (every round keeps the same ids)
    val step = succ.filter(col("succ") >= 0L)
      .select(col("id"), col("succ").as("cur"))
      .localCheckpoint(true)
    val keys = step.select(col("id").as("kid")).localCheckpoint(true)
    // all rounds run at a shuffle width derived from the measured pointer
    // count (Feeds.withLoopPartitions): each round shuffles two long
    // columns, and the session-wide width pays a full empty-task wave per
    // tiny round with AQE coalescing off
    Feeds.withLoopPartitions(succ.sparkSession, step.count()) {
    def undone(p: DataFrame): Long =
      p.join(keys, p("cur") === keys("kid"), "left_semi").count()
    var ptr = step
    var left = undone(ptr)
    var rounds = 0
    while (left > 0 && rounds < MaxRounds) {
      // ptr' = ptr[ptr] where cur is itself a key, else cur (terminal).
      // Each round's plan reads only the previous checkpoint — constant
      // plan size, and the previous round's blocks drop once the next
      // materializes (the undone() count is the materializing action).
      val jumped = ptr.as("a")
        .join(ptr.select(col("id").as("bid"), col("cur").as("bcur")).as("b"),
          col("a.cur") === col("bid"), "left")
        .select(col("a.id").as("id"), coalesce(col("bcur"), col("a.cur")).as("cur"))
        .localCheckpoint(true)
      left = undone(jumped)
      ptr.unpersist(blocking = false)
      ptr = jumped
      rounds += 1
    }
    require(left == 0, s"basinLabels: unresolved pointers after $MaxRounds doubling rounds")
    keys.unpersist(blocking = false)
    val pits = succ.filter(col("succ") === -1L).select(col("id"), col("id").as("cur"))
    ptr.unionByName(pits).select(col("id"), col("cur").as("sink"))
    } // withLoopPartitions
  }

  /** Watershed summary over the events grid: interior cells group into
    * basins by terminal sink, then basins fold into a size histogram
    * (basin_size, n_basins, sink_id_sum) — order-free integer aggregates,
    * rows bounded by the number of distinct basin sizes. The sink_id_sum
    * pins the exact basin->sink assignment under the fold (two different
    * basin partitions of the same sizes would almost surely differ in
    * some size class's sink sum).
    */
  val watershed: (SparkSession, String) => DataFrame = (spark, dir) => {
    baseLabels(spark, dir)
      .groupBy("sink").agg(count(lit(1)).as("n"))
      .groupBy(col("n").as("basin_size"))
      .agg(count(lit(1)).as("n_basins"), sum(col("sink")).as("sink_id_sum"))
      .orderBy("basin_size")
  }

  /** BASIN BORDER census — the ridge-line structure of the watershed
    * partition: every rook-adjacent pair of interior cells whose
    * [[basinLabels]] sinks DIFFER is a border edge; the census emits the
    * total adjacency count, the internal (same-basin) count, and over
    * the distinct unordered basin pairs the pair count, total border
    * edge count, the longest shared ridge (max edges for one pair), and
    * the sink-id checksums pinning WHICH basins abut. Adjacency needs NO
    * neighbor shuffle of the raster: interior cell ids are y*w + x, so
    * the right/down neighbor joins are plain equi-joins on id-1 / id-w
    * against the label frame (a neighbor outside the interior band is
    * simply absent — ids can't wrap into the next row because x = w-1
    * is never interior). internal + border = total is the closure the
    * spec asserts against the grid dims. Plan: the pointer-doubling
    * labeling dominates; the census adds two label-keyed equi-joins and
    * two tiny rollups.
    */
  val basinBorders: (SparkSession, String) => DataFrame = (spark, dir) => {
    val (w, _) = EventsGrid.dims(spark, dir)
    val lbl = baseLabels(spark, dir)
    val a = lbl.select(col("id"), col("sink").as("sa"))
    val right = a.join(lbl.select((col("id") - 1L).as("id"), col("sink").as("sb")), Seq("id"))
    val down = a.join(lbl.select((col("id") - w.toLong).as("id"), col("sink").as("sb")), Seq("id"))
    val allp = right.unionByName(down).select("sa", "sb").localCheckpoint(true)
    val tot = allp.agg(count(lit(1)).as("n_adj_pairs"),
      sum(when(col("sa") === col("sb"), 1L).otherwise(0L)).as("n_internal"))
    val bp = allp.filter(col("sa") =!= col("sb"))
      .select(least(col("sa"), col("sb")).as("lo"), greatest(col("sa"), col("sb")).as("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("ne"))
      .agg(count(lit(1)).as("n_basin_pairs"), sum("ne").as("n_border_edges"),
        max("ne").as("max_pair_edges"), sum("lo").as("lo_sum"), sum("hi").as("hi_sum"))
    tot.crossJoin(bp)
  }

  /** POUR-POINT census over the basin borders — the watershed MERGE
    * criterion: crossing from basin A to basin B costs the lower of the
    * border's saddles, where each border edge's crossing height is
    * max(elev_a, elev_b) (you must climb over the higher endpoint) and
    * the pair's POUR elevation is the min crossing over its shared
    * ridge. This is the quantity priority-flood / merge-tree watershed
    * algorithms order basin merges by. Elevations ride the same
    * id-arithmetic neighbor joins as [[basinBorders]] (quantized
    * floor(v*2^20) so Spark and the oracle agree bit-for-bit), the
    * per-pair min folds in one label-pair rollup, and the census pins
    * the pair count, pour min/max/sum, and the lexicographic-argmin
    * pair (pour, lo, hi) via one struct-min — deterministic under ties.
    * Plan: identical shape to basinBorders plus one qv equi-join.
    */
  /** Quantized elevations keyed by cell id — floor(v*2^20) as a long, the
    * repo-wide f64 quantization, shared by [[basinPour]]/[[basinHypso]].
    */
  private def qvCells(cells: org.apache.spark.sql.Dataset[(Int, Int, Double)],
                      w: Int): DataFrame =
    cells.toDF("x", "y", "v").select(
      (col("y").cast("long") * w + col("x")).as("id"),
      floor(col("v") * lit(1048576.0)).cast("long").as("qv"))

  val basinPour: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, _) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)]
    val a = baseLabels(spark, dir).join(qvCells(cells, w), Seq("id"))
      .select(col("id"), col("sink").as("sa"), col("qv").as("qa"))
      .localCheckpoint(true) // feeds both neighbor joins
    def shifted(d: Long) = a.select((col("id") - d).as("id"),
      col("sa").as("sb"), col("qa").as("qb"))
    val edges = a.join(shifted(1L), Seq("id"))
      .unionByName(a.join(shifted(w.toLong), Seq("id")))
      .filter(col("sa") =!= col("sb"))
      .select(least(col("sa"), col("sb")).as("lo"),
        greatest(col("sa"), col("sb")).as("hi"),
        greatest(col("qa"), col("qb")).as("cr"))
    edges.groupBy("lo", "hi").agg(min("cr").as("pour"))
      .agg(count(lit(1)).as("n_pairs"), min("pour").as("pour_min"),
        max("pour").as("pour_max"), sum("pour").as("pour_sum"),
        min(struct(col("pour"), col("lo"), col("hi"))).as("am"))
      .select(col("n_pairs"), col("pour_min"), col("pour_max"),
        col("pour_sum"), col("am.lo").as("min_lo"), col("am.hi").as("min_hi"))
  }

  /** DEPRESSION FILL-DEPTH census — the quantity priority-flood
    * depression filling computes per pit: a pit basin holds water up to
    * its SPILL elevation (the min border-crossing over ALL its border
    * edges — [[basinPour]]'s per-pair min, folded per basin instead),
    * so depth = spill - qv(sink) is how deep the filled lake at the pit
    * would be. Only PIT sinks participate (succ = -1; basins whose sink
    * is a boundary cell drain off-grid — stated drop, as are pits whose
    * basin touches no other, which cannot happen on a connected interior
    * with >= 2 basins). Depth is signed: the D8 steepest-QUANTIZED-drop
    * assignment can route a cell to a pit above some border cell, so no
    * clamp — exact arithmetic either way. Emits one row: n_pits,
    * depth min/max/sum, and the deepest pit pinned by a lexicographic
    * struct-max over (depth, sink). Plan: [[basinPour]]'s exact shape
    * plus one per-sink fold and one pit semi-join.
    */
  val basinDepth: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, _) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)]
    val succ = baseSucc(spark, dir) // feed: already materialized
    val qv = qvCells(cells, w).localCheckpoint(true)
    val a = baseLabels(spark, dir).join(qv, Seq("id"))
      .select(col("id"), col("sink").as("sa"), col("qv").as("qa"))
      .localCheckpoint(true) // feeds both neighbor joins
    def shifted(d: Long) = a.select((col("id") - d).as("id"),
      col("sa").as("sb"), col("qa").as("qb"))
    val edges = a.join(shifted(1L), Seq("id"))
      .unionByName(a.join(shifted(w.toLong), Seq("id")))
      .filter(col("sa") =!= col("sb"))
      .select(col("sa"), col("sb"), greatest(col("qa"), col("qb")).as("cr"))
    val spill = edges.select(col("sa").as("sink"), col("cr"))
      .unionByName(edges.select(col("sb").as("sink"), col("cr")))
      .groupBy("sink").agg(min("cr").as("spill"))
    succ.filter(col("succ") === -1L).select(col("id").as("sink"))
      .join(qv.select(col("id").as("sink"), col("qv").as("qsink")), Seq("sink"))
      .join(spill, Seq("sink"))
      .select(col("sink"), (col("spill") - col("qsink")).as("depth"))
      .agg(count(lit(1)).as("n_pits"), min("depth").as("depth_min"),
        max("depth").as("depth_max"), sum("depth").as("depth_sum"),
        max(struct(col("depth"), col("sink"))).as("dm"))
      .select(col("n_pits"), col("depth_min"), col("depth_max"),
        col("depth_sum"), col("dm.depth").as("max_depth"),
        col("dm.sink").as("max_sink"))
  }

  /** DRAINAGE-DENSITY histogram over the level-1 basins — the composition
    * of BOTH hydrology derivatives on the SHARED level-1 D8 feed
    * ([[level1Succ]], one definition): a cell is CHANNEL when its flow
    * accumulation reaches [[ChannelAcc]] (the standard accumulation-
    * threshold channel-network extraction), and each basin reports how
    * much of it is channelized. Basins fold to a histogram keyed by
    * channel-cell count (n_channel, n_basins, cells_sum, sink_sum) —
    * order-free integer aggregates, rows bounded by the distinct channel
    * counts. One id equi-join of two per-cell long tables on top of the
    * label/accumulation machinery; the pointer doubling dominates.
    */
  private[graft] val ChannelAcc = 4L

  private[graft] def drainageCensus(succ: DataFrame): DataFrame =
    drainageCensusOf(basinLabels(succ), accCells(succ))

  /** The census body over prebuilt (labels, acc) frames — lets the query
    * path ride the shared feeds while specs keep the succ-only entry.
    */
  private[graft] def drainageCensusOf(labels: DataFrame, acc: DataFrame): DataFrame =
    labels.join(acc, Seq("id"))
      .groupBy("sink")
      .agg(count(lit(1)).as("n_cells"),
        sum(when(col("acc") >= ChannelAcc, 1L).otherwise(0L)).as("n_channel"))
      .groupBy("n_channel")
      .agg(count(lit(1)).as("n_basins"), sum("n_cells").as("cells_sum"),
        sum("sink").as("sink_sum"))
      .orderBy("n_channel")

  val gridDrainage: (SparkSession, String) => DataFrame = (spark, dir) =>
    drainageCensusOf(l1Labels(spark, dir), l1Acc(spark, dir))

  /** RIPARIAN BUFFER census over the level-1 channel network — the
    * stream-corridor classification GIS pipelines run after channel
    * extraction: CHANNEL cells (flow accumulation >= [[ChannelAcc]], the
    * [[gridDrainage]] criterion — one definition), BUFFER cells (non-
    * channel cells 8-adjacent to a channel cell), FAR cells (the rest).
    * The buffer needs NO raster stencil: channel ids shift by the eight
    * neighbor offsets (pure id arithmetic — a shift off the interior
    * band is never a valid interior id, so the domain semi-join is the
    * exact Moore neighborhood), distinct-collapse, and one semi-join +
    * one anti-join classify. Emits one row: n_channel, n_buffer, n_far,
    * chan_id_sum, buf_id_sum (the id checksums pin WHICH cells, not just
    * how many). Plan: the accumulation's doubled composition dominates;
    * the census adds three id-keyed joins of long tables.
    */
  private[graft] def riparianOf(acc: DataFrame, w: Int): DataFrame = {
    val chan = acc.filter(col("acc") >= ChannelAcc).select("id")
      .localCheckpoint(true) // feeds the shifts, the anti-joins, and its own census
    val offs = Seq(-w - 1, -w, -w + 1, -1, 1, w - 1, w, w + 1).map(_.toLong)
    val near = offs.map(o => chan.select((col("id") + o).as("id")))
      .reduce(_ unionByName _).distinct()
      .join(acc.select("id"), Seq("id"), "left_semi")
    val buf = near.join(chan, Seq("id"), "left_anti").localCheckpoint(true)
    val a1 = chan.agg(count(lit(1)).as("n_channel"),
      coalesce(sum("id"), lit(0L)).as("chan_id_sum"))
    val a2 = buf.agg(count(lit(1)).as("n_buffer"),
      coalesce(sum("id"), lit(0L)).as("buf_id_sum"))
    val a3 = acc.select("id").join(chan, Seq("id"), "left_anti")
      .join(buf, Seq("id"), "left_anti").agg(count(lit(1)).as("n_far"))
    a1.crossJoin(a2).crossJoin(a3)
  }

  val riparian: (SparkSession, String) => DataFrame = (spark, dir) => {
    val (w, _) = EventsGrid.dims(spark, dir)
    riparianOf(l1Acc(spark, dir), w / 2)
  }

  /** MAIN-CHANNEL LENGTH histogram per basin — the "longest flow path"
    * every basin report leads with: per basin, the maximum flow-path
    * step count over its cells (the main channel's head is the cell
    * attaining it; its full path IS the main channel since all paths
    * funnel to the one sink), folded into a histogram keyed by that
    * maximum. The head cell pins deterministically via one
    * lexicographic struct-max over (steps, id); the histogram emits
    * (max_steps, n_basins, cells_sum, sink_sum, head_id_sum). Both
    * per-cell tables ([[flowLengths]] payload-carrying doubling,
    * [[basinLabels]] pointer doubling) ride the SHARED level-1 succ
    * feed; the composition adds one id equi-join and two rollups.
    */
  private[graft] def channelCensus(succ: DataFrame, w: Int): DataFrame =
    channelCensusOf(basinLabels(succ), flowLengths(succ, w))

  /** The census body over prebuilt (labels, flow-length) frames. */
  private[graft] def channelCensusOf(labels: DataFrame, flens: DataFrame): DataFrame =
    labels
      .join(flens
        .select(col("id"), (col("nc") + col("nd")).as("steps")), Seq("id"))
      .groupBy("sink")
      .agg(count(lit(1)).as("n"), max(struct(col("steps"), col("id"))).as("hd"))
      .select(col("sink"), col("n"), col("hd.steps").as("max_steps"),
        col("hd.id").as("head_id"))
      .groupBy("max_steps")
      .agg(count(lit(1)).as("n_basins"), sum("n").as("cells_sum"),
        sum("sink").as("sink_sum"), sum("head_id").as("head_id_sum"))
      .orderBy("max_steps")

  val basinChannel: (SparkSession, String) => DataFrame = (spark, dir) =>
    channelCensusOf(l1Labels(spark, dir), l1FlowLen(spark, dir))

  /** WETNESS MATRIX — the integer-exact surrogate of the topographic
    * wetness index ln((acc+1)/tan(slope)): instead of crossing an f64
    * log/tan through the oracle compare, the census bins each level-1
    * interior cell into the 2D (acc_bucket, slope_bucket) lattice with
    * acc_bucket = floor(log2(acc+1)) computed EXACTLY as the binary
    * digit count (length(bin(acc+1)) - 1 — string arithmetic, no
    * floating log near power-of-two boundaries) and slope_bucket =
    * qslope div 2^19 (half-unit-wide buckets of the q20 Horn slope).
    * High acc_bucket + low slope_bucket = the wet corner, the TWI
    * ordering, recoverable by any monotone scoring downstream. Emits
    * (acc_bucket, slope_bucket, n_cells, id_sum) — rows bounded by
    * ~log2(cells) x max-slope/0.5, data-size-free. Plan: [[streamPower]]'s
    * exact join shape (two per-cell long tables on id), different fold.
    */
  val wetness: (SparkSession, String) => DataFrame = (spark, dir) => {
    val slope = l1Slope(spark, dir)
    val acc = l1Acc(spark, dir)
    slope.join(acc, Seq("id"))
      .select(col("id"),
        (length(bin(col("acc") + 1)) - 1).cast("long").as("acc_bucket"),
        expr("qslope div 524288").as("slope_bucket"))
      .groupBy("acc_bucket", "slope_bucket")
      .agg(count(lit(1)).as("n_cells"), sum("id").as("id_sum"))
      .orderBy("acc_bucket", "slope_bucket")
  }

  /** HYPSOMETRIC-INDEX decile histogram per basin — the area-elevation
    * summary hydrologists compute per watershed (Strahler's hypsometric
    * integral, here its integer-exact mean-based estimator): per basin,
    * idx = (mean - min) / (max - min) in [0, 1) locates the basin's mass
    * between its lowest (the sink side) and highest (the ridge) cells —
    * computed as the EXACT integer decile ((sumq - n*minq) * 10) div
    * (n * (maxq - minq)) over the floor(v*2^20) quantized elevations, so
    * no f64 division crosses the oracle compare. mean < max whenever
    * min < max, so deciles land in 0..9; single-elevation basins (max =
    * min, the degenerate denominator) pin the stated sentinel 10.
    * Basins fold to (decile, n_basins, cells_sum, sink_sum). Long
    * headroom: sumq <= n * 2^27ish and the *10 keeps products far under
    * 2^62 at any real grid. Plan: one qv equi-join + one per-sink rollup
    * on top of the pointer-doubling labels (which dominate).
    */
  val basinHypso: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, _) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)]
    baseLabels(spark, dir).join(qvCells(cells, w), Seq("id"))
      .groupBy("sink").agg(count(lit(1)).as("n"), sum("qv").as("sumq"),
        min("qv").as("minq"), max("qv").as("maxq"))
      .select(col("sink"), col("n"),
        when(col("maxq") === col("minq"), lit(10L))
          .otherwise(expr("((sumq - n * minq) * 10) div (n * (maxq - minq))"))
          .as("decile"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_basins"), sum("n").as("cells_sum"),
        sum("sink").as("sink_sum"))
      .orderBy("decile")
  }

  /** MELTON RUGGEDNESS census per basin — the relief/area ratio
    * geomorphologists use to classify debris-flow vs fluvial basins
    * (Melton 1965: MR = relief / sqrt(area)). Its SQUARE is integer-exact
    * over the floor(v*2^20) quantized elevations: mr2 = (maxq - minq)^2
    * div n — no sqrt, no f64 division crosses the oracle compare. Basins
    * bucket by floor(log2(mr2 + 1)) computed as the binary DIGIT COUNT
    * length(bin(mr2+1)) - 1 ([[wetness]]'s trick — exact at power-of-two
    * boundaries where a floating log2 wobbles), then fold to (bucket,
    * n_basins, cells_sum, sink_sum, mr2_max). Long headroom: qv < 2^27ish
    * on this data, so (maxq-minq)^2 < 2^56 — far under 2^62 before the
    * div. Single-cell and flat basins land in bucket 0 (mr2 = 0). Plan:
    * identical to [[basinHypso]] — one qv equi-join + one per-sink rollup
    * on top of the pointer-doubling labels (which dominate), then a
    * bucket-bounded fold.
    */
  val basinMelton: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val (w, _) = EventsGrid.dims(spark, dir)
    val cells = RasterOps.baseCells(spark, dir).as[(Int, Int, Double)]
    baseLabels(spark, dir).join(qvCells(cells, w), Seq("id"))
      .groupBy("sink").agg(count(lit(1)).as("n"),
        min("qv").as("minq"), max("qv").as("maxq"))
      .select(col("sink"), col("n"),
        expr("((maxq - minq) * (maxq - minq)) div n").as("mr2"))
      .select(col("sink"), col("n"), col("mr2"),
        (length(bin(col("mr2") + 1)) - 1).cast("long").as("mr_bucket"))
      .groupBy("mr_bucket")
      .agg(count(lit(1)).as("n_basins"), sum("n").as("cells_sum"),
        sum("sink").as("sink_sum"), max("mr2").as("mr2_max"))
      .orderBy("mr_bucket")
  }

  /** BASIN SHAPE census — bounding-box fill and elongation per watershed
    * basin, the planform metrics (Horton's form factor genus) read next to
    * Melton's ruggedness: compact equant basins vs long thin ones. Both
    * are integer-exact and need NO elevation join — the bbox folds out of
    * id arithmetic alone (x = id mod w, y = id div w — the percolation
    * census trick), inside the same per-sink rollup every basin op uses.
    * fill_decile = (n * 10) div (bw * bh) in 0..10 (n <= bw*bh always;
    * 10 iff the basin tiles its bbox exactly — all single-cell basins),
    * elongq = (max(bw,bh) * 1000) div min(bw,bh) >= 1000 (the aspect
    * ratio, milli-scaled — no f64 division crosses the oracle compare).
    * Basins fold to (fill_decile, n_basins, cells_sum, sink_sum,
    * bbox_sum, elongq_max). Long headroom: n * 10 and bw * bh are far
    * under 2^62 at any real grid; elongq <= w * 1000. Plan: the
    * pointer-doubling labeling dominates; the census adds one per-sink
    * rollup (map-side combinable) and a decile-bounded fold — no qv join,
    * strictly cheaper than [[basinHypso]].
    */
  val basinElong: (SparkSession, String) => DataFrame = (spark, dir) => {
    val (w, _) = EventsGrid.dims(spark, dir)
    baseLabels(spark, dir)
      .select(col("sink"), (col("id") % w).as("x"), expr(s"id div $w").as("y"))
      .groupBy("sink").agg(count(lit(1)).as("n"),
        min("x").as("minx"), max("x").as("maxx"),
        min("y").as("miny"), max("y").as("maxy"))
      .select(col("sink"), col("n"),
        (col("maxx") - col("minx") + 1L).as("bw"),
        (col("maxy") - col("miny") + 1L).as("bh"))
      .select(col("sink"), col("n"), (col("bw") * col("bh")).as("bbox"),
        expr("(n * 10) div (bw * bh)").as("fill_decile"),
        expr("(greatest(bw, bh) * 1000) div least(bw, bh)").as("elongq"))
      .groupBy("fill_decile")
      .agg(count(lit(1)).as("n_basins"), sum("n").as("cells_sum"),
        sum("sink").as("sink_sum"), sum("bbox").as("bbox_sum"),
        max("elongq").as("elongq_max"))
      .orderBy("fill_decile")
  }

  /** BASIN DOMINANT-DIRECTION census — the drainage-orientation summary
    * per watershed basin: each flowing cell's D8 step decodes from id
    * arithmetic (d8 = (dy+1)*3 + (dx+1) in 0..8, never 4 for a flowing
    * cell; pits take the 4 = "no move" slot so every basin member
    * counts), the basin's modal direction pins by ONE packed integer
    * argmax (pk = cnt*16 + d8 — count-major, ties to the LARGER
    * direction code, zero extra passes), and basins fold by (dom_dir,
    * share_decile) where share_decile = (domcnt*10) div n in 1..10 (10
    * iff every member steps the same way — all single-cell basins land
    * on (4, 10)). The anisotropy dashboard: a dominant share near 10
    * over a big basin means parallel drainage (structural control), near
    * 1-2 means dendritic. Plan: the pointer-doubling labels dominate;
    * the census adds one id equi-join of two succ-derived tables + two
    * map-side-combinable rollups (per-(sink, d8), then per-sink) and a
    * <= 99-key fold.
    */
  val basinDomdir: (SparkSession, String) => DataFrame = (spark, dir) => {
    val (w, _) = EventsGrid.dims(spark, dir)
    val succ = baseSucc(spark, dir)
    val dirs = succ.select(col("id"),
      when(col("succ") === -1L, 4L)
        .otherwise((expr(s"succ div ${w}L") - expr(s"id div ${w}L") + 1L) * 3L
          + (col("succ") % w - col("id") % w + 1L)).as("d8"))
    baseLabels(spark, dir).join(dirs, Seq("id"))
      .groupBy("sink", "d8").agg(count(lit(1)).as("cnt"))
      .groupBy("sink").agg(max(col("cnt") * 16L + col("d8")).as("pk"),
        sum("cnt").as("n"))
      .select(col("sink"), col("n"), (col("pk") % 16L).as("dom_dir"),
        expr("((pk div 16) * 10) div n").as("share_decile"))
      .groupBy("dom_dir", "share_decile")
      .agg(count(lit(1)).as("n_basins"), sum("n").as("cells_sum"),
        sum("sink").as("sink_sum"))
      .orderBy("dom_dir", "share_decile")
  }

  /** D8 IN-DEGREE census — the confluence structure of the flow forest:
    * per interior cell, how many interior cells flow DIRECTLY into it
    * (0..8), split by whether the cell is itself a pit (succ = -1). Cells
    * with in-degree >= 2 are the network's junctions; in-degree 0 cells
    * are ridge sources — the census is the degree histogram hydrologists
    * read before channel extraction (cf. [[gridDrainage]]'s accumulation
    * criterion — this is the LOCAL inflow count, accumulation is the
    * transitive one). Edges INTO boundary cells fall outside the interior
    * id set and are excluded by construction (stated: the census is over
    * interior->interior edges only). Fold: (indeg, is_pit, n_cells,
    * id_sum) — the id checksum pins WHICH cells carry each degree. Plan:
    * one map-side-combinable groupBy on succ + one id-keyed left join
    * back to the cell set + a degree-bounded fold; no labeling, no
    * doubling — the cheapest op in the family.
    */
  val flowIndegree: (SparkSession, String) => DataFrame = (spark, dir) => {
    val succ = baseSucc(spark, dir)
    val infl = succ.filter(col("succ") >= 0L)
      .groupBy(col("succ").as("id")).agg(count(lit(1)).as("indeg"))
    succ.select(col("id"),
        when(col("succ") === -1L, 1L).otherwise(0L).as("is_pit"))
      .join(infl, Seq("id"), "left")
      .na.fill(0L, Seq("indeg"))
      .groupBy("indeg", "is_pit")
      .agg(count(lit(1)).as("n_cells"), sum("id").as("id_sum"))
      .orderBy("indeg", "is_pit")
  }

  /** All transitive DOWNSTREAM pairs (anc, node) of the successor forest —
    * every (cell, strictly-downstream cell on its flow path) — by DOUBLED
    * COMPOSITION: the invariant after the round at stride s is "pairs
    * covers every path distance in [1, 2s]" (capped at path end), because
    * the round composes only FULL-stride pointers (d == s) with the
    * existing pairs (mid-to-target distance in [1, s]), yielding exactly
    * the distances [s+1, 2s] — each pair lands ONCE (a functional graph
    * has one path per source, so (anc, node) has a unique distance and a
    * unique producing round): no dedup pass anywhere. O(log longest flow
    * path L) rounds, each one narrow equi-join; per-round lineage
    * truncation via localCheckpoint like [[basinLabels]]. Exchange
    * accounting, honestly: the OUTPUT pair volume is TC = the sum of path
    * lengths, but each round's composition re-shuffles the accumulated
    * pair set, so total exchange is O(TC log L) — vs topological
    * peeling's O(TC) spread over O(L) rounds. The doubling trade wins
    * when L is large (real DEM flow paths run the raster's diameter) and
    * loses nothing here; a caller who knows L is small can peel instead.
    */
  private[graft] def downstreamPairs(succ: DataFrame): DataFrame = {
    val edges = succ.filter(col("succ") >= 0L).localCheckpoint(true)
    val keys = edges.select(col("id").as("kid")).localCheckpoint(true)
    // loop width derived from the edge count with a smaller per-partition
    // target than the label loops: the accumulated pair set is edge count
    // x mean path length, so the same width carries ~pathlen x more rows
    Feeds.withLoopPartitions(succ.sparkSession, edges.count(), 1L << 16) {
    var ptr = edges.select(col("id"), col("succ").as("cur"), lit(1L).as("d"))
      .localCheckpoint(true)
    var pairs = edges.select(col("id").as("anc"), col("succ").as("node"))
      .localCheckpoint(true)
    var stride = 1L
    var rounds = 0
    def live(p: DataFrame): Long =
      p.join(keys, p("cur") === keys("kid"), "left_semi").count()
    var left = live(ptr)
    while (left > 0 && rounds < MaxRounds) {
      val newPairs = ptr.filter(col("d") === stride).as("a")
        .join(pairs.as("p"), col("a.cur") === col("p.anc"))
        .select(col("a.id").as("anc"), col("p.node").as("node"))
      val merged = pairs.unionByName(newPairs).localCheckpoint(true)
      // advance only full-stride pointers; saturated rows (cur terminal,
      // or d < stride from an earlier saturation) ride along unchanged
      val jumped = ptr.as("a")
        .join(ptr.select(col("id").as("bid"), col("cur").as("bcur"),
            col("d").as("bd")).as("b"),
          col("a.d") === stride && col("a.cur") === col("bid"), "left")
        .select(col("a.id").as("id"),
          coalesce(col("bcur"), col("a.cur")).as("cur"),
          (col("a.d") + coalesce(col("bd"), lit(0L))).as("d"))
        .localCheckpoint(true)
      left = live(jumped)
      pairs.unpersist(blocking = false); ptr.unpersist(blocking = false)
      pairs = merged; ptr = jumped
      stride *= 2
      rounds += 1
    }
    require(left == 0, s"downstreamPairs: unresolved pointers after $MaxRounds doubling rounds")
    ptr.unpersist(blocking = false)
    keys.unpersist(blocking = false); edges.unpersist(blocking = false)
    pairs
    } // withLoopPartitions
  }

  /** D8 flow ACCUMULATION — the second standard hydrology derivative
    * (stream-network extraction): acc(cell) = number of upstream cells
    * whose flow path passes through it. Runs over the LEVEL-1 overview
    * (composing the pyramid like q_pyramid_slope; pair volume = sum of
    * path lengths, which the overview keeps oracle-bounded — at full
    * resolution the identical plan applies, with the pairs table as the
    * documented volume contract). Engine = [[downstreamPairs]] grouped by
    * downstream node; cells nothing drains into report 0 (left join from
    * the full interior domain). Output is the accumulation histogram
    * (acc, n_cells, id_sum) — order-free integers, rows bounded by
    * distinct accumulation values, with the id_sum discriminator pinning
    * WHICH cells carry each accumulation class.
    */
  /** Per-cell accumulation (id, acc) over every id of the successor
    * table — headwaters report 0 through the left join. The composable
    * feed shared by [[flowAccum]] and the stream-power composition.
    */
  private[graft] def accCells(succ: DataFrame): DataFrame =
    accCellsOf(downstreamPairs(succ), succ)

  /** Accumulation from a prebuilt downstream-pair set (the shared-feed
    * entry; [[accCells]] delegates here).
    */
  private[graft] def accCellsOf(pairs: DataFrame, succ: DataFrame): DataFrame = {
    val acc = pairs
      .groupBy(col("node").as("id")).agg(count(lit(1)).as("acc"))
    succ.select(col("id")).join(acc, Seq("id"), "left")
      .select(col("id"), coalesce(col("acc"), lit(0L)).as("acc"))
  }

  /** STRAHLER STREAM ORDER over a D8 forest — the stream-classification
    * number every hydrology package derives after flow accumulation
    * (headwaters are order 1; a confluence of two equal-order streams
    * steps the order up; unequal orders keep the max). The sequential
    * definition looks topological-depth-bound, but the LEVEL SETS
    * S_k = {v : order(v) >= k} admit a round-per-ORDER scheme (max order
    * <= log2(#headwaters), not path length): S_1 = all nodes, and
    * S_{k+1} = the downstream closure of {v : >= 2 upstream neighbours
    * in S_k} — a node with one >= k+1 child is downstream of that
    * child's seed, and order is non-decreasing downstream, so the
    * closure is exactly the level set. Each round is one semi-join (mark
    * S_k children), one count-filter (seeds), and one semi-join against
    * the PRECOMPUTED downstream-pair set ([[downstreamPairs]], the
    * flow-accum machinery reused verbatim) — per-round lineage
    * truncation like the hash-min CC loop. The node domain is every cell
    * with a successor row PLUS every successor target (terminal
    * junctions on the tile rim participate, matching the oracle's node
    * CTE). Orders are capped at the oracle's chained-CTE depth 8 — a
    * deeper network raises loudly rather than truncating silently.
    * Exact order = 1 + (number of level sets S_2..S_K containing the
    * node), since the level sets are nested by construction.
    */
  private[graft] def strahlerOrders(succ: DataFrame): DataFrame =
    strahlerOrdersOf(succ, downstreamPairs(succ).localCheckpoint(true))

  /** Strahler level-set rounds over a prebuilt (succ, downstream-pair)
    * couple — the shared-feed entry; callers pass `pairs` already
    * materialized.
    */
  private[graft] def strahlerOrdersOf(succ: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = succ.filter(col("succ") >= 0L).localCheckpoint(true)
    val nodes = succ.select(col("id"))
      .unionByName(edges.select(col("succ").as("id")))
      .distinct().localCheckpoint(true)
    // level-set rounds at a data-derived shuffle width: the widest frame
    // any round shuffles is the downstream-pair set
    Feeds.withLoopPartitions(succ.sparkSession, pairs.count(), 1L << 16) {
    val sets = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var cur = nodes
    var k = 1
    var n = 1L
    while (n > 0 && k < 8) {
      val inSk = edges.join(cur.select(col("id").as("sid")),
        edges("id") === col("sid"), "left_semi")
      val seeds = inSk.groupBy(col("succ").as("id"))
        .agg(count(lit(1)).as("nc")).filter(col("nc") >= 2)
        .select("id").localCheckpoint(true)
      val next = seeds.unionByName(
          pairs.join(seeds.select(col("id").as("sd")),
            pairs("anc") === col("sd"), "left_semi")
            .select(col("node").as("id")))
        .distinct().localCheckpoint(true)
      sets += next
      cur = next
      n = next.count()
      k += 1
    }
    require(n == 0, "strahler: order exceeds the oracle-chained cap 8")
    val ord = nodes.join(
        sets.reduce(_ unionByName _).groupBy("id").agg(count(lit(1)).as("extra")),
        Seq("id"), "left")
      .select(col("id"), (lit(1L) + coalesce(col("extra"), lit(0L))).as("ord"))
    val out = ord.groupBy("ord")
      .agg(count(lit(1)).as("n_cells"), sum("id").as("id_sum"))
      .orderBy("ord")
    out
    } // withLoopPartitions
  }

  /** Contract output: the Strahler order census over the level-1 D8
    * forest — (ord, n_cells, id_sum); oracle = the same level-set chain
    * as NON-recursive CTEs whose closure comes from the linear recursive
    * walk enumeration (the q_flow_accum walk), the independent
    * formulation of both the pair set and the per-order membership.
    */
  val strahler: (SparkSession, String) => DataFrame = (spark, dir) =>
    strahlerOrdersOf(l1SuccF(spark, dir), l1Pairs(spark, dir))

  /** The level-1 D8 successor table — the feed shared by flowAccum and
    * streamPower (ONE definition of the overview + tiling choice).
    */
  private[graft] def level1Succ(spark: SparkSession, dir: String): DataFrame = {
    val (c1, w1, h1) = RasterOps.level1Cells(spark, dir)
    RasterOps.d8SuccCellsTiledOf(c1, w1, h1, 25, 25)
  }

  val flowAccum: (SparkSession, String) => DataFrame = (spark, dir) =>
    l1Acc(spark, dir)
      .groupBy("acc")
      .agg(count(lit(1)).as("n_cells"), sum(col("id")).as("id_sum"))
      .orderBy("acc")

  /** Per-cell flow-path LENGTH to the terminal — the third classic D8
    * derivative (hydrologic length grids): the number of cardinal and
    * diagonal steps along each cell's flow path, EXACT as the integer
    * pair (nc, nd) (a quantized-sqrt(2) scalar would lose the pair's
    * information for free; callers weight nd however they like). The
    * doubling here carries an ADDITIVE PAYLOAD through pointer jumping:
    * the invariant of (id, cur, nc, nd) is "(nc, nd) counts the steps
    * from id to cur", and composing a.cur = b.id sums the two compressed
    * path segments — O(log longest flow path) rounds, same lineage
    * truncation and static-key convergence count as [[basinLabels]].
    * Pits report (0, 0) through the union domain. The converged cur IS
    * the terminal sink, so it rides out as a trailing `sink` column for
    * free (pits: sink = id) — the feed for path-vs-chord compositions
    * ([[flowSinuosity]]) without a second doubling pass.
    */
  private[graft] def flowLengths(succ: DataFrame, w: Int): DataFrame = {
    val step = succ.filter(col("succ") >= 0L)
      .withColumn("diag",
        (col("succ") % w) =!= (col("id") % w) &&
          expr(s"succ div ${w}L") =!= expr(s"id div ${w}L"))
      .select(col("id"), col("succ").as("cur"),
        when(col("diag"), 0L).otherwise(1L).as("nc"),
        when(col("diag"), 1L).otherwise(0L).as("nd"))
      .localCheckpoint(true)
    val keys = step.select(col("id").as("kid")).localCheckpoint(true)
    Feeds.withLoopPartitions(succ.sparkSession, step.count()) {
    def undone(p: DataFrame): Long =
      p.join(keys, p("cur") === keys("kid"), "left_semi").count()
    var ptr = step
    var left = undone(ptr)
    var rounds = 0
    while (left > 0 && rounds < MaxRounds) {
      val jumped = ptr.as("a")
        .join(ptr.select(col("id").as("bid"), col("cur").as("bcur"),
            col("nc").as("bnc"), col("nd").as("bnd")).as("b"),
          col("a.cur") === col("bid"), "left")
        .select(col("a.id").as("id"),
          coalesce(col("bcur"), col("a.cur")).as("cur"),
          (col("a.nc") + coalesce(col("bnc"), lit(0L))).as("nc"),
          (col("a.nd") + coalesce(col("bnd"), lit(0L))).as("nd"))
        .localCheckpoint(true)
      left = undone(jumped)
      ptr.unpersist(blocking = false)
      ptr = jumped
      rounds += 1
    }
    require(left == 0, s"flowLengths: unresolved pointers after $MaxRounds doubling rounds")
    keys.unpersist(blocking = false)
    val pits = succ.filter(col("succ") === -1L)
      .select(col("id"), lit(0L).as("nc"), lit(0L).as("nd"),
        col("id").as("sink"))
    ptr.select(col("id"), col("nc"), col("nd"), col("cur").as("sink"))
      .unionByName(pits)
    } // withLoopPartitions
  }

  /** Contract output: the path-length histogram over the level-1 overview
    * — (steps = nc + nd, n_cells, diag_sum, id_sum); diag_sum pins the
    * cardinal/diagonal split per length class and id_sum pins WHICH cells
    * carry it. Oracle = the linear recursive walk with per-step diagonal
    * classification, the independent algorithm.
    */
  val flowLength: (SparkSession, String) => DataFrame = (spark, dir) => {
    l1FlowLen(spark, dir)
      .groupBy((col("nc") + col("nd")).as("steps"))
      .agg(count(lit(1)).as("n_cells"), sum("nd").as("diag_sum"),
        sum("id").as("id_sum"))
      .orderBy("steps")
  }

  /** FLOW-PATH SINUOSITY census — the meander metric per cell: how much
    * longer is the D8 flow path from a cell to its sink than the straight
    * chord between them, entirely in exact integers. Path length
    * milli-quantizes from the (nc, nd) step pair as pq = nc*1000 +
    * nd*1414 (1414 is the stated milli-sqrt(2) convention — a fixed
    * integer weight, not a float); the chord stays SQUARED (dist2 =
    * dx^2 + dy^2 from id arithmetic, never a sqrt), and the census key is
    * sin2q = pq^2 div (dist2 * 1000) ~ 1000 * sinuosity^2 — straight
    * cardinal paths land exactly on 1000, straight diagonals on 999 (the
    * 1414 truncation), meanders above. Pits drop (no path); non-pits
    * always have sink != id so dist2 >= 1. Long headroom: pq <= 1414 *
    * (w*h), pq^2 needs w*h < ~2^26 per GRID — the stated per-grid bound,
    * far above any tile this engine routes. Fold: log2 buckets via the
    * binary digit count ([[basinMelton]]'s trick) with n_cells, id_sum,
    * sin2q_sum, sin2q_max. Plan: ONE payload-doubling pass
    * ([[flowLengths]], which now carries the sink for free) + a
    * map-side-combinable bucket fold — no join at all.
    */
  val flowSinuosity: (SparkSession, String) => DataFrame = (spark, dir) => {
    val (w, _) = EventsGrid.dims(spark, dir)
    flowLengths(baseSucc(spark, dir), w)
      .filter(col("nc") + col("nd") > 0L)
      .select(col("id"),
        (col("nc") * 1000L + col("nd") * 1414L).as("pq"),
        ((col("sink") % w - col("id") % w) * (col("sink") % w - col("id") % w)
          + (expr(s"sink div ${w}L") - expr(s"id div ${w}L"))
            * (expr(s"sink div ${w}L") - expr(s"id div ${w}L"))).as("dist2"))
      .select(col("id"), expr("(pq * pq) div (dist2 * 1000)").as("sin2q"))
      .groupBy(length(bin(col("sin2q"))).cast("long").as("sin_bucket"))
      .agg(count(lit(1)).as("n_cells"), sum("id").as("id_sum"),
        sum("sin2q").as("sin2q_sum"), max("sin2q").as("sin2q_max"))
      .orderBy("sin_bucket")
  }

  /** Stream-power index — the hydrology composition on top of BOTH level-1
    * feeds: per interior cell, spi = qslope * (acc + 1) (the integer-exact
    * stand-in for the classic A^m * S^n erosion index at m = n = 1; the
    * +1 counts the cell's own drainage, the standard convention) — the
    * tiled Horn slope cells join the accumulation cells on the cell id
    * (one narrow equi-join of two already-tiny per-cell integer tables),
    * then fold to per-raster-row stats. Long headroom: qslope < 2^30,
    * acc < cells, product far under 2^62 at any realistic overview; ANSI
    * makes an overflow loud regardless.
    */
  val streamPower: (SparkSession, String) => DataFrame = (spark, dir) => {
    val w1 = EventsGrid.dims(spark, dir)._1 / 2
    val slope = l1Slope(spark, dir)
    val acc = l1Acc(spark, dir)
    slope.join(acc, Seq("id"))
      .select(expr(s"id div $w1").as("y"),
        (col("qslope") * (col("acc") + 1L)).as("spi"))
      .groupBy("y")
      .agg(count(lit(1)).as("n_cells"), sum("spi").as("spi_sum"),
        max("spi").as("spi_max"))
      .orderBy("y")
  }

  /** The oracle follows every cell's flow path step by step with a
    * recursive CTE (linear in total path length — fine at oracle scale,
    * and a genuinely different algorithm from the engine's logarithmic
    * pointer doubling); the D8 successor decode reuses the q_flow_dir
    * packed-argmax terms.
    */
  val oracleSql: Map[String, String] = {
    val slotJoins = (0 to 8).filter(_ != 4).map { o =>
      val dx = o % 3 - 1; val dy = o / 3 - 1
      s"JOIN g b$o ON b$o.x = t.x - ($dx) AND b$o.y = t.y - ($dy)"
    }.mkString("\n  ")
    val slotJoins1 = (0 to 8).filter(_ != 4).map { o =>
      val dx = o % 3 - 1; val dy = o / 3 - 1
      s"JOIN g1 b$o ON b$o.x = t.x - ($dx) AND b$o.y = t.y - ($dy)"
    }.mkString("\n  ")
    val terms = Seq(0, 1, 2, 3, 5, 6, 7, 8).map { o =>
      val dxo = o % 3 - 1; val dyo = o / 3 - 1
      val distSql = if (dxo != 0 && dyo != 0) "sqrt(2.0)" else "1.0"
      s"(floor((t.v - b$o.v) / $distSql * 1048576.0)::BIGINT * 16 + ${8 - o})"
    }.mkString(",\n    ")
    // Strahler level-set chain: per order k, seeds = nodes with >= 2
    // children in s{k-1}, s{k} = seeds UNION their downstream closure
    // gathered from the walk enumeration. Every set is MATERIALIZED —
    // each s{k} is referenced twice by level k+1, so inlined CTEs would
    // re-plan the whole upstream pipeline 2^k times (the getis lesson)
    val strahlerChain = (2 to 8).map { k =>
      s"""sd$k AS MATERIALIZED (SELECT s.succ AS id FROM step s
         |  WHERE s.succ IS NOT NULL AND s.id IN (SELECT id FROM s${k - 1})
         |  GROUP BY 1 HAVING count(*) >= 2),
         |s$k AS MATERIALIZED (SELECT DISTINCT id FROM (
         |  SELECT id FROM sd$k
         |  UNION ALL SELECT pr.node AS id FROM pr JOIN sd$k ON pr.anc = sd$k.id))""".stripMargin
    }.mkString(",\n")
    val strahlerOrd = (2 to 8)
      .map(k => s"(n.id IN (SELECT id FROM s$k))::INT").mkString(" + ")
    Map(
      // Strahler order census: the same level sets as chained
      // NON-recursive CTEs, with every downstream closure gathered from
      // the linear walk enumeration (vs the engine's doubled-composition
      // pair set) and order = 1 + nested-membership count
      "q_strahler" ->
        s"""WITH RECURSIVE
           |g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |${RasterOps.poolCte(1, 100)},
           |p AS (SELECT t.x, t.y, greatest(
           |    $terms) AS pmax
           |  FROM g1 t
           |  $slotJoins1
           |  WHERE t.x BETWEEN 1 AND 48 AND t.y BETWEEN 1 AND (SELECT h FROM d) // 2 - 2),
           |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
           |step AS MATERIALIZED (SELECT (y * 50 + x)::BIGINT AS id,
           |  CASE WHEN dir >= 0
           |       THEN ((y - (dir // 3 - 1)) * 50 + (x - (dir % 3 - 1)))::BIGINT END AS succ
           |  FROM dc),
           |walk(anc, node) AS (
           |  SELECT id, succ FROM step WHERE succ IS NOT NULL
           |  UNION ALL
           |  SELECT w.anc, s.succ FROM walk w
           |  JOIN step s ON s.id = w.node AND s.succ IS NOT NULL),
           |pr AS MATERIALIZED (SELECT anc, node FROM walk),
           |nodes AS MATERIALIZED (SELECT DISTINCT id FROM (
           |  SELECT id FROM step
           |  UNION ALL SELECT succ AS id FROM step WHERE succ IS NOT NULL)),
           |s1 AS MATERIALIZED (SELECT id FROM nodes),
           |$strahlerChain,
           |m AS (SELECT n.id, (1 + $strahlerOrd)::BIGINT AS ord FROM nodes n)
           |SELECT ord, count(*)::BIGINT AS n_cells, sum(id)::BIGINT AS id_sum
           |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

      // flow accumulation on the level-1 overview: the walk CTE enumerates
      // every (ancestor, downstream-node) pair step by step — the linear-
      // round independent algorithm vs the engine's doubled composition;
      // count(w.anc) over the LEFT join gives headwater cells their 0
      "q_flow_accum" ->
        s"""WITH RECURSIVE
           |g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |${RasterOps.poolCte(1, 100)},
           |p AS (SELECT t.x, t.y, greatest(
           |    $terms) AS pmax
           |  FROM g1 t
           |  $slotJoins1
           |  WHERE t.x BETWEEN 1 AND 48 AND t.y BETWEEN 1 AND (SELECT h FROM d) // 2 - 2),
           |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
           |step AS (SELECT (y * 50 + x)::BIGINT AS id,
           |  CASE WHEN dir >= 0
           |       THEN ((y - (dir // 3 - 1)) * 50 + (x - (dir % 3 - 1)))::BIGINT END AS succ
           |  FROM dc),
           |walk(anc, node) AS (
           |  SELECT id, succ FROM step WHERE succ IS NOT NULL
           |  UNION ALL
           |  SELECT w.anc, s.succ FROM walk w
           |  JOIN step s ON s.id = w.node AND s.succ IS NOT NULL),
           |a AS (SELECT s.id, count(w.anc) AS acc
           |      FROM step s LEFT JOIN walk w ON w.node = s.id GROUP BY 1)
           |SELECT acc::BIGINT AS acc, count(*)::BIGINT AS n_cells,
           |  sum(id)::BIGINT AS id_sum
           |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,

      // flow length on the level-1 overview: the walk CTE advances one
      // step per round, classifying each step cardinal/diagonal from the
      // id arithmetic — the linear-round independent algorithm vs the
      // engine's payload-carrying pointer doubling
      "q_flow_len" ->
        s"""WITH RECURSIVE
           |g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |${RasterOps.poolCte(1, 100)},
           |p AS (SELECT t.x, t.y, greatest(
           |    $terms) AS pmax
           |  FROM g1 t
           |  $slotJoins1
           |  WHERE t.x BETWEEN 1 AND 48 AND t.y BETWEEN 1 AND (SELECT h FROM d) // 2 - 2),
           |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
           |step AS (SELECT (y * 50 + x)::BIGINT AS id,
           |  CASE WHEN dir >= 0
           |       THEN ((y - (dir // 3 - 1)) * 50 + (x - (dir % 3 - 1)))::BIGINT END AS succ
           |  FROM dc),
           |walk(id, cur, nc, nd) AS (
           |  SELECT id, succ,
           |    CASE WHEN succ % 50 <> id % 50 AND succ // 50 <> id // 50 THEN 0 ELSE 1 END,
           |    CASE WHEN succ % 50 <> id % 50 AND succ // 50 <> id // 50 THEN 1 ELSE 0 END
           |  FROM step WHERE succ IS NOT NULL
           |  UNION ALL
           |  SELECT w.id, s.succ,
           |    w.nc + CASE WHEN s.succ % 50 <> s.id % 50 AND s.succ // 50 <> s.id // 50 THEN 0 ELSE 1 END,
           |    w.nd + CASE WHEN s.succ % 50 <> s.id % 50 AND s.succ // 50 <> s.id // 50 THEN 1 ELSE 0 END
           |  FROM walk w JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
           |fin AS (
           |  SELECT w.id, w.nc, w.nd FROM walk w
           |  WHERE NOT EXISTS (SELECT 1 FROM step s
           |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)
           |  UNION ALL
           |  SELECT id, 0, 0 FROM step WHERE succ IS NULL)
           |SELECT (nc + nd)::BIGINT AS steps, count(*)::BIGINT AS n_cells,
           |  sum(nd)::BIGINT AS diag_sum, sum(id)::BIGINT AS id_sum
           |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,

      // stream power: the level-1 Horn-slope reconstruction joined to the
      // recursive-walk accumulation on the cell id — both independent
      // formulations of the engine's two tiled feeds — then spi =
      // qslope * (acc + 1) folded per raster row
      "q_stream_power" ->
        s"""WITH RECURSIVE
           |g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
           |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
           |${RasterOps.poolCte(1, 100)},
           |p AS (SELECT t.x, t.y,
           |  (((b0.v + b3.v * 2.0) + b6.v) - ((b2.v + b5.v * 2.0) + b8.v)) / 8.0 AS gx,
           |  (((b0.v + b1.v * 2.0) + b2.v) - ((b6.v + b7.v * 2.0) + b8.v)) / 8.0 AS gy,
           |  greatest(
           |    $terms) AS pmax
           |  FROM g1 t
           |  $slotJoins1
           |  WHERE t.x BETWEEN 1 AND 48 AND t.y BETWEEN 1 AND (SELECT h FROM d) // 2 - 2),
           |sl AS (SELECT (y * 50 + x)::BIGINT AS id, y,
           |  floor(sqrt(gx * gx + gy * gy) * 1048576.0)::BIGINT AS qslope FROM p),
           |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
           |step AS (SELECT (y * 50 + x)::BIGINT AS id,
           |  CASE WHEN dir >= 0
           |       THEN ((y - (dir // 3 - 1)) * 50 + (x - (dir % 3 - 1)))::BIGINT END AS succ
           |  FROM dc),
           |walk(anc, node) AS (
           |  SELECT id, succ FROM step WHERE succ IS NOT NULL
           |  UNION ALL
           |  SELECT w.anc, s.succ FROM walk w
           |  JOIN step s ON s.id = w.node AND s.succ IS NOT NULL),
           |a AS (SELECT s.id, count(w.anc) AS acc
           |      FROM step s LEFT JOIN walk w ON w.node = s.id GROUP BY 1)
           |SELECT sl.y::BIGINT AS y, count(*)::BIGINT AS n_cells,
           |  sum(sl.qslope * (a.acc + 1))::BIGINT AS spi_sum,
           |  max(sl.qslope * (a.acc + 1))::BIGINT AS spi_max
           |FROM sl JOIN a USING (id) GROUP BY 1 ORDER BY 1""".stripMargin,

      // basin borders: the same recursive sink walk, then the two
      // id-arithmetic neighbor joins and the unordered-pair rollup
      "q_basin_borders" ->
      s"""WITH RECURSIVE
         |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g t
         |  $slotJoins
         |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS (SELECT (y * 100 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 100 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walk(id, cur) AS (
         |  SELECT id, COALESCE(succ, id) FROM step
         |  UNION ALL
         |  SELECT w.id, s.succ FROM walk w
         |  JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
         |sinks AS (SELECT w.id, w.cur AS sink FROM walk w
         |  WHERE NOT EXISTS (SELECT 1 FROM step s
         |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)),
         |allp AS (SELECT a.sink AS sa, b.sink AS sb FROM sinks a
         |         JOIN sinks b ON b.id = a.id + 1
         |         UNION ALL
         |         SELECT a.sink, b.sink FROM sinks a
         |         JOIN sinks b ON b.id = a.id + 100),
         |bp AS (SELECT least(sa, sb) AS lo, greatest(sa, sb) AS hi,
         |         count(*)::BIGINT AS ne
         |       FROM allp WHERE sa <> sb GROUP BY 1, 2)
         |SELECT (SELECT count(*) FROM allp)::BIGINT AS n_adj_pairs,
         |  (SELECT count(*) FROM allp WHERE sa = sb)::BIGINT AS n_internal,
         |  count(*)::BIGINT AS n_basin_pairs, sum(ne)::BIGINT AS n_border_edges,
         |  max(ne)::BIGINT AS max_pair_edges,
         |  sum(lo)::BIGINT AS lo_sum, sum(hi)::BIGINT AS hi_sum
         |FROM bp""".stripMargin,

      // pour points: the basin-borders walk with quantized elevations
      // riding the neighbor joins; per unordered pair the min crossing,
      // argmin pinned by an ORDER BY (pour, lo, hi) subselect
      "q_basin_pour" ->
      s"""WITH RECURSIVE
         |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g t
         |  $slotJoins
         |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS (SELECT (y * 100 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 100 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walk(id, cur) AS (
         |  SELECT id, COALESCE(succ, id) FROM step
         |  UNION ALL
         |  SELECT w.id, s.succ FROM walk w
         |  JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
         |sinks AS (SELECT w.id, w.cur AS sink FROM walk w
         |  WHERE NOT EXISTS (SELECT 1 FROM step s
         |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)),
         |qc AS (SELECT (y * 100 + x)::BIGINT AS id,
         |         floor(v * 1048576.0)::BIGINT AS qv FROM g),
         |allp AS (SELECT a.sink AS sa, b.sink AS sb, greatest(qa.qv, qb.qv) AS cr
         |         FROM sinks a JOIN sinks b ON b.id = a.id + 1
         |         JOIN qc qa ON qa.id = a.id JOIN qc qb ON qb.id = b.id
         |         UNION ALL
         |         SELECT a.sink, b.sink, greatest(qa.qv, qb.qv)
         |         FROM sinks a JOIN sinks b ON b.id = a.id + 100
         |         JOIN qc qa ON qa.id = a.id JOIN qc qb ON qb.id = b.id),
         |bp AS (SELECT least(sa, sb) AS lo, greatest(sa, sb) AS hi,
         |         min(cr) AS pour
         |       FROM allp WHERE sa <> sb GROUP BY 1, 2)
         |SELECT count(*)::BIGINT AS n_pairs, min(pour)::BIGINT AS pour_min,
         |  max(pour)::BIGINT AS pour_max, sum(pour)::BIGINT AS pour_sum,
         |  (SELECT lo FROM bp ORDER BY pour, lo, hi LIMIT 1)::BIGINT AS min_lo,
         |  (SELECT hi FROM bp ORDER BY pour, lo, hi LIMIT 1)::BIGINT AS min_hi
         |FROM bp""".stripMargin,

      // fill depth: the pour-point walk and edge set, the per-basin min
      // crossing over BOTH edge sides, pits only, the deepest pit via an
      // ORDER BY (depth, sink) DESC subselect
      "q_basin_depth" ->
      s"""WITH RECURSIVE
         |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g t
         |  $slotJoins
         |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS (SELECT (y * 100 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 100 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walk(id, cur) AS (
         |  SELECT id, COALESCE(succ, id) FROM step
         |  UNION ALL
         |  SELECT w.id, s.succ FROM walk w
         |  JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
         |sinks AS (SELECT w.id, w.cur AS sink FROM walk w
         |  WHERE NOT EXISTS (SELECT 1 FROM step s
         |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)),
         |qc AS (SELECT (y * 100 + x)::BIGINT AS id,
         |         floor(v * 1048576.0)::BIGINT AS qv FROM g),
         |allp AS (SELECT a.sink AS sa, b.sink AS sb, greatest(qa.qv, qb.qv) AS cr
         |         FROM sinks a JOIN sinks b ON b.id = a.id + 1
         |         JOIN qc qa ON qa.id = a.id JOIN qc qb ON qb.id = b.id
         |         UNION ALL
         |         SELECT a.sink, b.sink, greatest(qa.qv, qb.qv)
         |         FROM sinks a JOIN sinks b ON b.id = a.id + 100
         |         JOIN qc qa ON qa.id = a.id JOIN qc qb ON qb.id = b.id),
         |sp AS (SELECT sink, min(cr) AS spill FROM (
         |         SELECT sa AS sink, cr FROM allp WHERE sa <> sb
         |         UNION ALL SELECT sb, cr FROM allp WHERE sa <> sb)
         |       GROUP BY 1),
         |dd AS (SELECT p2.sink, sp.spill - qc.qv AS depth
         |       FROM (SELECT id AS sink FROM step WHERE succ IS NULL) p2
         |       JOIN sp USING (sink) JOIN qc ON qc.id = p2.sink)
         |SELECT count(*)::BIGINT AS n_pits, min(depth)::BIGINT AS depth_min,
         |  max(depth)::BIGINT AS depth_max, sum(depth)::BIGINT AS depth_sum,
         |  (SELECT depth FROM dd ORDER BY depth DESC, sink DESC LIMIT 1)::BIGINT AS max_depth,
         |  (SELECT sink FROM dd ORDER BY depth DESC, sink DESC LIMIT 1)::BIGINT AS max_sink
         |FROM dd""".stripMargin,

      // hypsometric deciles: the sink walk joined to quantized
      // elevations, per-basin integer decile, sentinel 10 on max = min
      "q_basin_hypso" ->
      s"""WITH RECURSIVE
         |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g t
         |  $slotJoins
         |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS (SELECT (y * 100 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 100 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walk(id, cur) AS (
         |  SELECT id, COALESCE(succ, id) FROM step
         |  UNION ALL
         |  SELECT w.id, s.succ FROM walk w
         |  JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
         |sinks AS (SELECT w.id, w.cur AS sink FROM walk w
         |  WHERE NOT EXISTS (SELECT 1 FROM step s
         |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)),
         |qc AS (SELECT (y * 100 + x)::BIGINT AS id,
         |         floor(v * 1048576.0)::BIGINT AS qv FROM g),
         |bas AS (SELECT s.sink, count(*)::BIGINT AS n, sum(qv)::BIGINT AS sumq,
         |          min(qv)::BIGINT AS minq, max(qv)::BIGINT AS maxq
         |        FROM sinks s JOIN qc ON qc.id = s.id GROUP BY 1),
         |dec AS (SELECT sink, n,
         |          CASE WHEN maxq = minq THEN 10
         |               ELSE ((sumq - n * minq) * 10) // (n * (maxq - minq))
         |          END AS decile
         |        FROM bas)
         |SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n_basins,
         |  sum(n)::BIGINT AS cells_sum, sum(sink)::BIGINT AS sink_sum
         |FROM dec GROUP BY 1 ORDER BY 1""".stripMargin,

      // Melton ruggedness: the same sink walk + quantized elevations,
      // mr2 = (maxq - minq)^2 // n per basin, log2 bucket via the binary
      // digit count (bin string length), per-bucket fold
      "q_basin_melton" ->
      s"""WITH RECURSIVE
         |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g t
         |  $slotJoins
         |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS (SELECT (y * 100 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 100 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walk(id, cur) AS (
         |  SELECT id, COALESCE(succ, id) FROM step
         |  UNION ALL
         |  SELECT w.id, s.succ FROM walk w
         |  JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
         |sinks AS (SELECT w.id, w.cur AS sink FROM walk w
         |  WHERE NOT EXISTS (SELECT 1 FROM step s
         |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)),
         |qc AS (SELECT (y * 100 + x)::BIGINT AS id,
         |         floor(v * 1048576.0)::BIGINT AS qv FROM g),
         |bas AS (SELECT s.sink, count(*)::BIGINT AS n,
         |          min(qv)::BIGINT AS minq, max(qv)::BIGINT AS maxq
         |        FROM sinks s JOIN qc ON qc.id = s.id GROUP BY 1),
         |m AS (SELECT sink, n,
         |        (((maxq - minq) * (maxq - minq)) // n)::BIGINT AS mr2
         |      FROM bas)
         |SELECT (length(bin(mr2 + 1)) - 1)::BIGINT AS mr_bucket,
         |  count(*)::BIGINT AS n_basins, sum(n)::BIGINT AS cells_sum,
         |  sum(sink)::BIGINT AS sink_sum, max(mr2)::BIGINT AS mr2_max
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

      // basin shape: the same sink walk, bbox by min/max of id%100 and
      // id//100 per basin, integer fill decile + milli-scaled aspect ratio
      "q_basin_elong" ->
      s"""WITH RECURSIVE
         |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g t
         |  $slotJoins
         |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS (SELECT (y * 100 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 100 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walk(id, cur) AS (
         |  SELECT id, COALESCE(succ, id) FROM step
         |  UNION ALL
         |  SELECT w.id, s.succ FROM walk w
         |  JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
         |sinks AS (SELECT w.id, w.cur AS sink FROM walk w
         |  WHERE NOT EXISTS (SELECT 1 FROM step s
         |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)),
         |bb AS (SELECT s.sink, count(*)::BIGINT AS n,
         |         (max(s.id % 100) - min(s.id % 100) + 1)::BIGINT AS bw,
         |         (max(s.id // 100) - min(s.id // 100) + 1)::BIGINT AS bh
         |       FROM sinks s GROUP BY 1),
         |f AS (SELECT sink, n, bw * bh AS bbox,
         |        (n * 10) // (bw * bh) AS fill_decile,
         |        (greatest(bw, bh) * 1000) // least(bw, bh) AS elongq
         |      FROM bb)
         |SELECT fill_decile::BIGINT AS fill_decile, count(*)::BIGINT AS n_basins,
         |  sum(n)::BIGINT AS cells_sum, sum(sink)::BIGINT AS sink_sum,
         |  sum(bbox)::BIGINT AS bbox_sum, max(elongq)::BIGINT AS elongq_max
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,

      // in-degree census: the packed-argmax step table, inflow counts by
      // one GROUP BY succ, left-joined back over the interior cell set
      "q_flow_indegree" ->
      s"""WITH
         |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g t
         |  $slotJoins
         |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS (SELECT (y * 100 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 100 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |cnt AS (SELECT succ AS id, count(*)::BIGINT AS indeg
         |        FROM step WHERE succ IS NOT NULL GROUP BY 1),
         |ind AS (SELECT s.id,
         |          CASE WHEN s.succ IS NULL THEN 1 ELSE 0 END AS is_pit,
         |          COALESCE(c.indeg, 0) AS indeg
         |        FROM step s LEFT JOIN cnt c ON c.id = s.id)
         |SELECT indeg::BIGINT AS indeg, is_pit::BIGINT AS is_pit,
         |  count(*)::BIGINT AS n_cells, sum(id)::BIGINT AS id_sum
         |FROM ind GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // basin dominant direction: the sink walk joined to per-cell D8
      // codes decoded from the step table's id arithmetic (pits -> 4),
      // modal direction by the packed count-major argmax, decile fold
      "q_basin_domdir" ->
      s"""WITH RECURSIVE
         |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g t
         |  $slotJoins
         |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS (SELECT (y * 100 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 100 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walk(id, cur) AS (
         |  SELECT id, COALESCE(succ, id) FROM step
         |  UNION ALL
         |  SELECT w.id, s.succ FROM walk w
         |  JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
         |sinks AS (SELECT w.id, w.cur AS sink FROM walk w
         |  WHERE NOT EXISTS (SELECT 1 FROM step s
         |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)),
         |dirs AS (SELECT s.id,
         |    CASE WHEN s.succ IS NULL THEN 4
         |         ELSE (s.succ // 100 - s.id // 100 + 1) * 3
         |              + (s.succ % 100 - s.id % 100 + 1) END AS d8
         |  FROM step s),
         |per AS (SELECT k.sink, dr.d8, count(*)::BIGINT AS cnt
         |        FROM sinks k JOIN dirs dr ON dr.id = k.id GROUP BY 1, 2),
         |dom AS (SELECT sink, max(cnt * 16 + d8) AS pk, sum(cnt) AS n
         |        FROM per GROUP BY 1),
         |f AS (SELECT sink, n, pk % 16 AS dom_dir,
         |        ((pk // 16) * 10) // n AS share_decile FROM dom)
         |SELECT dom_dir::BIGINT AS dom_dir, share_decile::BIGINT AS share_decile,
         |  count(*)::BIGINT AS n_basins, sum(n)::BIGINT AS cells_sum,
         |  sum(sink)::BIGINT AS sink_sum
         |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // flow-path sinuosity: the recursive walk WITH the (nc, nd) step
      // payload at full resolution AND the terminal kept as sink; pq =
      // nc*1000 + nd*1414 (the stated milli-sqrt(2) integer weight),
      // chord SQUARED from id arithmetic, census key (pq*pq) //
      // (dist2*1000), log2 buckets by the binary digit count
      "q_flow_sinuosity" ->
      s"""WITH RECURSIVE
         |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g t
         |  $slotJoins
         |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS (SELECT (y * 100 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 100 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walk(id, cur, nc, nd) AS (
         |  SELECT id, succ,
         |    CASE WHEN succ % 100 <> id % 100 AND succ // 100 <> id // 100 THEN 0 ELSE 1 END,
         |    CASE WHEN succ % 100 <> id % 100 AND succ // 100 <> id // 100 THEN 1 ELSE 0 END
         |  FROM step WHERE succ IS NOT NULL
         |  UNION ALL
         |  SELECT w.id, s.succ,
         |    w.nc + CASE WHEN s.succ % 100 <> s.id % 100 AND s.succ // 100 <> s.id // 100 THEN 0 ELSE 1 END,
         |    w.nd + CASE WHEN s.succ % 100 <> s.id % 100 AND s.succ // 100 <> s.id // 100 THEN 1 ELSE 0 END
         |  FROM walk w JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
         |fin AS (SELECT w.id, w.cur AS sink, w.nc, w.nd FROM walk w
         |  WHERE NOT EXISTS (SELECT 1 FROM step s
         |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)),
         |sq AS (SELECT id, nc * 1000 + nd * 1414 AS pq,
         |         (sink % 100 - id % 100) * (sink % 100 - id % 100)
         |         + (sink // 100 - id // 100) * (sink // 100 - id // 100) AS dist2
         |       FROM fin),
         |k AS (SELECT id, (pq * pq) // (dist2 * 1000) AS sin2q FROM sq)
         |SELECT length(bin(sin2q))::BIGINT AS sin_bucket, count(*)::BIGINT AS n_cells,
         |  sum(id)::BIGINT AS id_sum, sum(sin2q)::BIGINT AS sin2q_sum,
         |  max(sin2q)::BIGINT AS sin2q_max
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

      // main channel: the flow-length walk joined per cell to the sink
      // walk, per-basin argmax via row_number (steps DESC, id DESC) —
      // the window formulation of the engine's struct-max
      "q_basin_channel" ->
      s"""WITH RECURSIVE
         |g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |${RasterOps.poolCte(1, 100)},
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g1 t
         |  $slotJoins1
         |  WHERE t.x BETWEEN 1 AND 48 AND t.y BETWEEN 1 AND (SELECT h FROM d) // 2 - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS MATERIALIZED (SELECT (y * 50 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 50 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walkl(id, cur, nc, nd) AS (
         |  SELECT id, succ,
         |    CASE WHEN succ % 50 <> id % 50 AND succ // 50 <> id // 50 THEN 0 ELSE 1 END,
         |    CASE WHEN succ % 50 <> id % 50 AND succ // 50 <> id // 50 THEN 1 ELSE 0 END
         |  FROM step WHERE succ IS NOT NULL
         |  UNION ALL
         |  SELECT w.id, s.succ,
         |    w.nc + CASE WHEN s.succ % 50 <> s.id % 50 AND s.succ // 50 <> s.id // 50 THEN 0 ELSE 1 END,
         |    w.nd + CASE WHEN s.succ % 50 <> s.id % 50 AND s.succ // 50 <> s.id // 50 THEN 1 ELSE 0 END
         |  FROM walkl w JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
         |fin AS (
         |  SELECT w.id, w.nc + w.nd AS steps FROM walkl w
         |  WHERE NOT EXISTS (SELECT 1 FROM step s
         |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)
         |  UNION ALL
         |  SELECT id, 0 FROM step WHERE succ IS NULL),
         |walks(id, cur) AS (
         |  SELECT id, COALESCE(succ, id) FROM step
         |  UNION ALL
         |  SELECT w.id, s.succ FROM walks w
         |  JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
         |sinks AS (SELECT w.id, w.cur AS sink FROM walks w
         |  WHERE NOT EXISTS (SELECT 1 FROM step s
         |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)),
         |bas AS (SELECT s.sink, f.id, f.steps,
         |          row_number() OVER (PARTITION BY s.sink
         |                             ORDER BY f.steps DESC, f.id DESC) AS rn,
         |          count(*) OVER (PARTITION BY s.sink) AS n
         |        FROM sinks s JOIN fin f ON f.id = s.id),
         |hd AS (SELECT sink, n, steps AS max_steps, id AS head_id
         |       FROM bas WHERE rn = 1)
         |SELECT max_steps::BIGINT AS max_steps, count(*)::BIGINT AS n_basins,
         |  sum(n)::BIGINT AS cells_sum, sum(sink)::BIGINT AS sink_sum,
         |  sum(head_id)::BIGINT AS head_id_sum
         |FROM hd GROUP BY 1 ORDER BY 1""".stripMargin,

      // wetness matrix: the stream-power slope/acc reconstruction, the
      // digit-count log2 bucket (length(bin(acc+1))-1), the 2D rollup
      "q_wetness" ->
      s"""WITH RECURSIVE
         |g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |${RasterOps.poolCte(1, 100)},
         |p AS (SELECT t.x, t.y,
         |  (((b0.v + b3.v * 2.0) + b6.v) - ((b2.v + b5.v * 2.0) + b8.v)) / 8.0 AS gx,
         |  (((b0.v + b1.v * 2.0) + b2.v) - ((b6.v + b7.v * 2.0) + b8.v)) / 8.0 AS gy,
         |  greatest(
         |    $terms) AS pmax
         |  FROM g1 t
         |  $slotJoins1
         |  WHERE t.x BETWEEN 1 AND 48 AND t.y BETWEEN 1 AND (SELECT h FROM d) // 2 - 2),
         |sl AS (SELECT (y * 50 + x)::BIGINT AS id,
         |  floor(sqrt(gx * gx + gy * gy) * 1048576.0)::BIGINT AS qslope FROM p),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS (SELECT (y * 50 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 50 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walk(anc, node) AS (
         |  SELECT id, succ FROM step WHERE succ IS NOT NULL
         |  UNION ALL
         |  SELECT w.anc, s.succ FROM walk w
         |  JOIN step s ON s.id = w.node AND s.succ IS NOT NULL),
         |a AS (SELECT s.id, count(w.anc) AS acc
         |      FROM step s LEFT JOIN walk w ON w.node = s.id GROUP BY 1)
         |SELECT (length(bin(a.acc + 1)) - 1)::BIGINT AS acc_bucket,
         |  (sl.qslope // 524288)::BIGINT AS slope_bucket,
         |  count(*)::BIGINT AS n_cells, sum(sl.id)::BIGINT AS id_sum
         |FROM sl JOIN a USING (id) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // riparian buffer: the flow-accum walk, channel = acc >= 4, the
      // eight id-offset shifts as a VALUES cross join, NOT-IN set algebra
      "q_riparian" ->
      s"""WITH RECURSIVE
         |g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |${RasterOps.poolCte(1, 100)},
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g1 t
         |  $slotJoins1
         |  WHERE t.x BETWEEN 1 AND 48 AND t.y BETWEEN 1 AND (SELECT h FROM d) // 2 - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS (SELECT (y * 50 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 50 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walk(anc, node) AS (
         |  SELECT id, succ FROM step WHERE succ IS NOT NULL
         |  UNION ALL
         |  SELECT w.anc, s.succ FROM walk w
         |  JOIN step s ON s.id = w.node AND s.succ IS NOT NULL),
         |a AS (SELECT s.id, count(w.anc) AS acc
         |      FROM step s LEFT JOIN walk w ON w.node = s.id GROUP BY 1),
         |ch AS (SELECT id FROM a WHERE acc >= 4),
         |sh AS (SELECT DISTINCT ch.id + t.o AS id FROM ch
         |       CROSS JOIN (VALUES (-51), (-50), (-49), (-1),
         |                          (1), (49), (50), (51)) t(o)),
         |bf AS (SELECT sh.id FROM sh JOIN a USING (id)
         |       WHERE sh.id NOT IN (SELECT id FROM ch))
         |SELECT (SELECT count(*) FROM ch)::BIGINT AS n_channel,
         |  (SELECT coalesce(sum(id), 0) FROM ch)::BIGINT AS chan_id_sum,
         |  (SELECT count(*) FROM bf)::BIGINT AS n_buffer,
         |  (SELECT coalesce(sum(id), 0) FROM bf)::BIGINT AS buf_id_sum,
         |  (SELECT count(*) FROM a WHERE id NOT IN (SELECT id FROM ch)
         |     AND id NOT IN (SELECT id FROM bf))::BIGINT AS n_far""".stripMargin,

      // drainage density: the flow-accum walk counts (channel = acc >= 4)
      // joined per cell to the sink walk, folded per basin then into the
      // channel-count histogram
      "q_grid_drainage" ->
      s"""WITH RECURSIVE
         |g0 AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |${RasterOps.poolCte(1, 100)},
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g1 t
         |  $slotJoins1
         |  WHERE t.x BETWEEN 1 AND 48 AND t.y BETWEEN 1 AND (SELECT h FROM d) // 2 - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS MATERIALIZED (SELECT (y * 50 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 50 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walkp(anc, node) AS (
         |  SELECT id, succ FROM step WHERE succ IS NOT NULL
         |  UNION ALL
         |  SELECT w.anc, s.succ FROM walkp w
         |  JOIN step s ON s.id = w.node AND s.succ IS NOT NULL),
         |a AS (SELECT s.id, count(w.anc) AS acc
         |      FROM step s LEFT JOIN walkp w ON w.node = s.id GROUP BY 1),
         |walks(id, cur) AS (
         |  SELECT id, COALESCE(succ, id) FROM step
         |  UNION ALL
         |  SELECT w.id, s.succ FROM walks w
         |  JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
         |sinks AS (SELECT w.id, w.cur AS sink FROM walks w
         |  WHERE NOT EXISTS (SELECT 1 FROM step s
         |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)),
         |bas AS (SELECT sk.sink, count(*)::BIGINT AS n_cells,
         |          sum((a.acc >= 4)::INT)::BIGINT AS n_chan
         |        FROM sinks sk JOIN a ON a.id = sk.id GROUP BY 1)
         |SELECT n_chan AS n_channel, count(*)::BIGINT AS n_basins,
         |  sum(n_cells)::BIGINT AS cells_sum, sum(sink)::BIGINT AS sink_sum
         |FROM bas GROUP BY 1 ORDER BY 1""".stripMargin,

      "q_watershed" ->
      s"""WITH RECURSIVE
         |g AS (SELECT (event_id % 100)::INT AS x, (event_id // 100)::INT AS y, value AS v FROM events),
         |d AS (SELECT (count(*) // 100)::INT AS h FROM events),
         |p AS (SELECT t.x, t.y, greatest(
         |    $terms) AS pmax
         |  FROM g t
         |  $slotJoins
         |  WHERE t.x BETWEEN 1 AND 98 AND t.y BETWEEN 1 AND (SELECT h FROM d) - 2),
         |dc AS (SELECT x, y, CASE WHEN pmax >= 16 THEN 8 - pmax % 16 ELSE -1 END AS dir FROM p),
         |step AS (SELECT (y * 100 + x)::BIGINT AS id,
         |  CASE WHEN dir >= 0
         |       THEN ((y - (dir // 3 - 1)) * 100 + (x - (dir % 3 - 1)))::BIGINT END AS succ
         |  FROM dc),
         |walk(id, cur) AS (
         |  SELECT id, COALESCE(succ, id) FROM step
         |  UNION ALL
         |  SELECT w.id, s.succ FROM walk w
         |  JOIN step s ON s.id = w.cur AND s.succ IS NOT NULL),
         |sinks AS (SELECT w.id, w.cur AS sink FROM walk w
         |  WHERE NOT EXISTS (SELECT 1 FROM step s
         |                    WHERE s.id = w.cur AND s.succ IS NOT NULL)),
         |basins AS (SELECT sink, count(*) AS n FROM sinks GROUP BY 1)
         |SELECT n::BIGINT AS basin_size, count(*)::BIGINT AS n_basins,
         |  sum(sink)::BIGINT AS sink_id_sum
         |FROM basins GROUP BY 1 ORDER BY 1""".stripMargin)
  }
}

package graft.streaming

import graft.core.{Assembly, FragmentMerge, OpenFrag, Tiling}
import graft.docs.DocCodec
import graft.engine.ContourEngine
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import scala.collection.mutable.ArrayBuffer

/** Streaming re-contour of appended tile documents: an append-only document
  * stream (e.g. new raster snapshots landing in the lake) is decoded and
  * contoured per micro-batch with the same batch engine — foreachBatch gives
  * exactly-once sink semantics against the checkpoint, and each batch's
  * grids are independent (a grid's tiles are expected to land atomically,
  * which the lake's snapshot commit guarantees).
  */
object StreamingContour {

  val docSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[Doc].schema

  /** Start a stream reading doc parquet from `inputPath`, contouring each
    * micro-batch, and handing results to `sink`.
    */
  def start(spark: SparkSession, inputPath: String, checkpointDir: String,
            cfg: JobConfig)(sink: (Dataset[ContourRow], Long) => Unit): StreamingQuery = {
    import spark.implicits._
    // doc rows carry MB-scale media_ref strings; the default 4096-row
    // vectorized reader batch can overflow the 2GB column vector
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "32")
    spark.readStream
      .schema(docSchema)
      .parquet(inputPath)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        implicit val s: SparkSession = batch.sparkSession
        val docs = batch.as[Doc]
        val engine = new ContourEngine(batch.sparkSession, cfg)
        sink(engine.contours(DocCodec.decode(docs)), batchId)
      }
      .start()
  }

  /** Per-grid cross-batch state — INCREMENTAL: only the still-open boundary
    * fragments, the coverage counters, and the arrived tile keys (morton of
    * (tileX, tileY), for loud duplicate detection). Closed rings leave the
    * state the moment they close (FragmentMerge never reopens a closed
    * ring), so state size is O(open perimeter + arrived tiles), never
    * O(total contour length) — a huge grid arriving over many batches
    * carries only its frontier. `covered == -1` is the completion
    * tombstone: late or re-appended tiles after emission fail loudly
    * instead of silently restarting the counter.
    */
  final case class GridState(covered: Long, total: Long,
                             tileKeys: Seq[Long], open: Seq[RingFragRow])

  /** In emitted RingFragRow rows: ti >= 0 -> a closed ring of threshold
    * index ti; ti == CompleteTi -> the grid completed this batch.
    */
  val CompleteTi: Int = -2

  /** Stateful streaming contouring: a grid's tiles may arrive across ANY
    * number of micro-batches. flatMapGroupsWithState on gridId runs the
    * tile kernel on arrivals, merges boundary fragments with the carried
    * open set (FragmentMerge is arrival-order independent, so the final
    * rings are byte-identical to the batch engine's), and EMITS CLOSED
    * RINGS AS THEY CLOSE. Each batch's emitted rings land idempotently in
    * a parquet ring store under the checkpoint dir (one overwrite-mode
    * directory per batchId, so foreachBatch retries never duplicate);
    * when a grid's owned-cell coverage reaches gdx * gdy a completion
    * marker triggers the downstream per-grid assembly — reading back just
    * that grid's rings — and `sink` sees its contours exactly once.
    * This lifts `start`'s grids-land-atomically restriction.
    */
  def startStateful(spark: SparkSession, inputPath: String, checkpointDir: String,
                    cfg: JobConfig)(sink: (Dataset[ContourRow], Long) => Unit): StreamingQuery = {
    import spark.implicits._
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "32")
    val ringStore = s"$checkpointDir/rings"
    val emitted = spark.readStream
      .schema(docSchema)
      .parquet(inputPath)
      .as[Doc]
      .flatMap(DocCodec.docToTiles)
      .groupByKey(_.gridId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateGrid(cfg))
    emitted.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[RingFragRow], batchId: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val rows = batch.persist()
        try {
          val completed = rows.filter(_.ti == CompleteTi).map(_.gridId)
            .collect().toSet
          // idempotent ring append: a retried batch overwrites its own dir.
          // Within the batch dir the rings are PARTITIONED BY GRID (a copy
          // column, so the full RingFragRow schema stays in the files) —
          // grid completion then reads only that grid's partitions instead
          // of scanning the whole ring-store history, which on a
          // long-running stream would grow without bound.
          rows.filter(_.ti >= 0).toDF()
            .withColumn("gid", col("gridId"))
            .write.mode("overwrite").partitionBy("gid")
            .parquet(s"$ringStore/b$batchId")
          // per-grid directory index: completion walks O(batches containing
          // that grid), not O(all batches). Collected grid list is bounded
          // by the batch's grid count; marker writes are idempotent.
          val ringGrids = rows.filter(_.ti >= 0).map(_.gridId).distinct().collect()
          val fs = new org.apache.hadoop.fs.Path(ringStore)
            .getFileSystem(s.sessionState.newHadoopConf())
          writeRingIndex(fs, ringStore, batchId, ringGrids.toSeq)
          if (completed.nonEmpty) {
            val markers = rows.filter(r => r.ti == CompleteTi)
            val rings = readRingStore(s, ringStore, completed)
            sink(assembleCompleted(s, rings.union(markers), cfg), batchId)
          }
        } finally rows.unpersist()
      }
      .start()
  }

  /** The completed grids' persisted rings: only the `gid=` partition
    * directories of those grids, across the per-batch directories — the
    * rest of the ring-store history is never touched. Legacy batch dirs
    * (bare parquet written before the store was partitioned) are read
    * whole; the row filter below keeps the result correct for them while
    * being a no-op for pre-pruned partition dirs.
    */
  private[streaming] def readRingStore(spark: SparkSession, ringStore: String,
                                       grids: Set[String]): Dataset[RingFragRow] = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(ringStore)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = ringDirsFor(fs, ringStore, grids)
    if (dirs.isEmpty) spark.emptyDataset[RingFragRow]
    else spark.read.schema(org.apache.spark.sql.Encoders.product[RingFragRow].schema)
      .parquet(dirs: _*)
      // a COLUMN predicate (not a typed closure): pushes down to the
      // parquet reader so legacy whole-batch reads skip non-matching row
      // groups by column stats instead of deserializing every pts array;
      // a no-op for the pre-pruned partitioned dirs
      .filter(col("gridId").isin(grids.toSeq: _*))
      .as[RingFragRow]
  }

  private def escGid(gid: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(gid)

  private val LegacyEof = "#eof"

  /** Record, in the per-grid directory index, which grids batch `batchId`
    * wrote rings for: one empty marker file `index/gid=<g>/b<batchId>` per
    * grid (same Hive-style escaping as partitionBy, so exotic grid ids
    * round-trip). IDEMPOTENT: a retried batch recreates the same markers.
    * The FIRST indexing call on a store that already holds batch dirs
    * (an engine upgrade on a live stream) records those pre-index batch
    * names once in `index/_legacy_batches`, so reads never miss
    * un-indexed history.
    *
    * CRASH SAFETY: index initialization is guarded by the legacy file's
    * COMPLETENESS (a `#eof` trailer line), not by the index dir's
    * existence — a crash after mkdirs but before/among the legacy-file
    * bytes leaves a missing-or-torn file, and the replayed batch simply
    * re-captures the pre-index list (the crashed attempt wrote no markers
    * yet, so "all b* dirs except the current batch" is still exactly the
    * un-indexed history). Readers treat a torn legacy file as
    * "index not initialized" and fall back to the full walk — a correct
    * superset — for the window until the retry repairs it.
    */
  private[streaming] def writeRingIndex(fs: org.apache.hadoop.fs.FileSystem,
                                        ringStore: String, batchId: Long,
                                        grids: Seq[String]): Unit = {
    val root = new org.apache.hadoop.fs.Path(ringStore)
    val indexDir = new org.apache.hadoop.fs.Path(root, "index")
    val legacyFile = new org.apache.hadoop.fs.Path(indexDir, "_legacy_batches")
    if (readLegacyBatches(fs, legacyFile).isEmpty) { // absent OR torn
      val preexisting =
        try fs.listStatus(root).filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("b") && st.getPath.getName != s"b$batchId")
          .map(_.getPath.getName).sorted
        catch { case _: java.io.FileNotFoundException => Array.empty[String] }
      fs.mkdirs(indexDir)
      val out = fs.create(legacyFile, true)
      try out.write((preexisting :+ LegacyEof).mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
    grids.sorted.foreach { g =>
      val gdir = new org.apache.hadoop.fs.Path(indexDir, s"gid=${escGid(g)}")
      fs.mkdirs(gdir)
      fs.create(new org.apache.hadoop.fs.Path(gdir, s"b$batchId"), true).close()
    }
  }

  /** The pre-index batch names, iff the legacy file exists AND is complete
    * (trailer present); None for absent or torn — callers treat both as
    * "index not initialized".
    */
  private def readLegacyBatches(fs: org.apache.hadoop.fs.FileSystem,
                                legacyFile: org.apache.hadoop.fs.Path): Option[Seq[String]] = {
    if (!fs.exists(legacyFile)) return None
    val lines = graft.lake.Lake.readFully(fs, legacyFile).split("\n", -1).toSeq
    if (lines.lastOption.contains(LegacyEof)) Some(lines.dropRight(1).filter(_.nonEmpty))
    else None
  }

  /** The directories holding `grids`' rings.
    *
    * Indexed store (any store this engine has written): each grid's marker
    * dir lists exactly the batches holding its rings, so the walk is
    * O(batches containing that grid) — one `listStatus` per grid plus one
    * existence check per marker — regardless of how many batches the
    * stream has accumulated. Batches from before the index existed (an
    * upgraded live stream) were recorded once in `_legacy_batches` and are
    * read whole (the row filter prunes them).
    *
    * Pre-index store (no `index/` dir at all): the original full walk —
    * every batch's matching `gid=` partition dirs (partition values
    * matched by UNESCAPING the dir name, the exact inverse of
    * partitionBy's escaping), plus any whole batch dir in the
    * pre-partitioning layout (bare parquet at the batch level), which
    * readRingStore's row filter prunes.
    */
  private[streaming] def ringDirsFor(fs: org.apache.hadoop.fs.FileSystem,
                                     ringStore: String,
                                     grids: Set[String]): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(ringStore)
    val indexDir = new org.apache.hadoop.fs.Path(root, "index")
    readLegacyBatches(fs, new org.apache.hadoop.fs.Path(indexDir, "_legacy_batches")) match {
      case Some(legacyNames) =>
        val legacy = legacyNames
          .flatMap(b => expandBatchDir(fs, new org.apache.hadoop.fs.Path(root, b), grids))
        val indexed = grids.toSeq.sorted.flatMap { g =>
          val e = escGid(g)
          val markers =
            try fs.listStatus(new org.apache.hadoop.fs.Path(indexDir, s"gid=$e"))
              .map(_.getPath.getName).sorted.toSeq
            catch { case _: java.io.FileNotFoundException => Nil }
          markers.flatMap { b =>
            val d = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(root, b), s"gid=$e")
            // a batch retry may legitimately rewrite fewer grids than the
            // failed attempt indexed — stale markers are skipped, not errors
            if (fs.exists(d)) Some(d.toString) else None
          }
        }
        legacy ++ indexed
      case None => // no index, or a torn init — full walk is a correct superset
        val batches =
          try fs.listStatus(root)
            .filter(st => st.isDirectory && st.getPath.getName != "index").map(_.getPath)
          catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.Path] }
        batches.toIndexedSeq.flatMap(b => expandBatchDir(fs, b, grids))
    }
  }

  /** One batch dir's read set for `grids`: the whole dir for the
    * pre-partitioning layout (bare parquet at the batch level — the row
    * filter prunes), else the matching `gid=` partition dirs.
    */
  private def expandBatchDir(fs: org.apache.hadoop.fs.FileSystem,
                             b: org.apache.hadoop.fs.Path,
                             grids: Set[String]): Seq[String] = {
    val entries =
      try fs.listStatus(b)
      catch { case _: java.io.FileNotFoundException => return Nil }
    val legacy = entries.exists(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (legacy) Seq(b.toString)
    else entries.iterator.filter(_.isDirectory).map(_.getPath)
      .filter { d =>
        val n = d.getName
        n.startsWith("gid=") &&
          grids.contains(org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(n.drop(4)))
      }
      .map(_.toString).toSeq
  }

  /** Distributed per-grid assembly of completed grids — identical reducer
    * semantics to ContourEngine.contoursFrom. The completion markers ride
    * along so a grid with zero rings still emits its (empty) contour rows.
    */
  private def assembleCompleted(spark: SparkSession, rows: Dataset[RingFragRow],
                                cfg: JobConfig): Dataset[ContourRow] = {
    import spark.implicits._
    val ts = cfg.thresholds.toArray
    val (xs, ys, xo, yo) = (cfg.xStep, cfg.yStep, cfg.xOrigin, cfg.yOrigin)
    val ident = cfg.isIdentityAffine
    rows.groupByKey(_.gridId).flatMapGroups { (gid: String, it: Iterator[RingFragRow]) =>
      val byTi = it.filter(_.ti >= 0).toArray.groupBy(_.ti)
      ts.indices.iterator.map { ti =>
        val rings = byTi.getOrElse(ti, Array.empty).sortBy(_.maxKey).map { r =>
          if (!ident) Assembly.applyAffine(r.pts, xs, ys, xo, yo)
          r.pts
        }
        val polys = Assembly.assembleContour(rings.toSeq)
        ContourRow(gid, ts(ti), polys.map(p => PolyRow(p.exterior.toSeq, p.holes.map(_.toSeq))))
      }
    }
  }

  private[streaming] def updateGrid(cfg: JobConfig)(
      gid: String, tiles: Iterator[TileRow],
      state: GroupState[GridState]): Iterator[RingFragRow] = {
    val ts = cfg.thresholds.toArray
    val prev = state.getOption.getOrElse(GridState(0L, 0L, Nil, Nil))
    if (prev.covered == -1L) {
      val late = tiles.map(t => (t.tileX, t.tileY)).toSeq
      if (late.nonEmpty)
        throw new IllegalStateException(
          s"grid $gid already completed and emitted; late/duplicate tiles: $late")
      return Iterator.empty
    }
    var covered = prev.covered
    var total = prev.total
    val seen = scala.collection.mutable.Set[Long](prev.tileKeys: _*)
    val emit = ArrayBuffer[RingFragRow]()
    val open = ArrayBuffer[RingFragRow](prev.open: _*)
    tiles.foreach { t =>
      val key = graft.index.CellIndex.morton(t.tileX, t.tileY)
      if (!seen.add(key))
        throw new IllegalStateException(
          s"duplicate tile (${t.tileX}, ${t.tileY}) delivered for grid $gid")
      total = t.gdx.toLong * t.gdy
      covered += t.tw.toLong * t.th
      if (covered > total)
        throw new IllegalStateException(
          s"grid $gid coverage overshoot: $covered > $total owned cells")
      val spec = Tiling.TileSpec(t.tileX, t.tileY, t.sx0, t.sy0, t.tw, t.th,
        t.sx0, t.sy0, t.vw, t.vh,
        if (t.sx0 == 0) -1 else t.sx0, t.sx0 + t.tw - 1,
        if (t.sy0 == 0) -1 else t.sy0, t.sy0 + t.th - 1)
      val outs = Tiling.tileKernelMulti(t.values, spec, t.gdx, t.gdy, ts, cfg.smooth)
      ts.indices.foreach { ti =>
        outs(ti).rings.foreach(r =>
          emit += RingFragRow(gid, ti, closed = true, 0, 0, 0L, 0L, r.maxKey, 0, r.pts))
        outs(ti).frags.foreach(f =>
          open += RingFragRow(gid, ti, closed = false, t.tileX, t.tileY,
            f.startKey, f.endKey, f.maxKey, f.anchorPos, f.pts))
      }
    }
    val done = total > 0 && covered == total
    // merge this batch's open fragments with the carried ones, per
    // threshold; anything that closes is FINAL (FragmentMerge never
    // reopens a closed ring) and is emitted now, not carried
    val stillOpen = ArrayBuffer[RingFragRow]()
    open.groupBy(_.ti).foreach { case (ti, rows) =>
      val res = FragmentMerge.merge(
        rows.map(r => OpenFrag(r.pts, r.startKey, r.endKey, r.maxKey, r.anchorPos)).toSeq)
      res.rings.foreach(r =>
        emit += RingFragRow(gid, ti, closed = true, 0, 0, 0L, 0L, r.maxKey, 0, r.pts))
      res.open.foreach(f =>
        stillOpen += RingFragRow(gid, ti, closed = false, 0, 0,
          f.startKey, f.endKey, f.maxKey, f.anchorPos, f.pts))
    }
    if (!done) {
      state.update(GridState(covered, total, seen.toSeq, stillOpen.toSeq))
      emit.iterator
    } else {
      if (stillOpen.nonEmpty)
        throw new IllegalStateException(
          s"${stillOpen.length} fragments failed to close for completed grid $gid")
      // tombstone: late arrivals after emission must fail loudly, not
      // silently restart the grid
      state.update(GridState(-1L, total, Nil, Nil))
      emit += RingFragRow(gid, CompleteTi, closed = true, 0, 0, 0L, 0L, 0L, 0, Array.empty)
      emit.iterator
    }
  }
}

package graft.streaming

import graft.core.{Assembly, FragmentMerge, OpenFrag, Tiling}
import graft.docs.DocCodec
import graft.engine.ContourEngine
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** Per-grid cross-batch state: covered owned cells, the grid's total, and
    * every closed ring + still-open boundary fragment accumulated so far.
    */
  final case class GridState(covered: Long, total: Long, rows: Seq[RingFragRow])

  /** Stateful streaming contouring: a grid's tiles may arrive across ANY
    * number of micro-batches. flatMapGroupsWithState on gridId runs the
    * tile kernel on arrivals, merges boundary fragments with the carried
    * state (FragmentMerge is arrival-order independent, so the final rings
    * are byte-identical to the batch engine's), and emits the grid's
    * contours exactly once — when the owned-cell coverage reaches
    * gdx * gdy. This lifts `start`'s grids-land-atomically restriction.
    */
  def startStateful(spark: SparkSession, inputPath: String, checkpointDir: String,
                    cfg: JobConfig)(sink: (Dataset[ContourRow], Long) => Unit): StreamingQuery = {
    import spark.implicits._
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "32")
    val contours = spark.readStream
      .schema(docSchema)
      .parquet(inputPath)
      .as[Doc]
      .flatMap(DocCodec.docToTiles)
      .groupByKey(_.gridId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateGrid(cfg))
    contours.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[ContourRow], batchId: Long) =>
        sink(batch, batchId)
      }
      .start()
  }

  private def updateGrid(cfg: JobConfig)(
      gid: String, tiles: Iterator[TileRow],
      state: GroupState[GridState]): Iterator[ContourRow] = {
    val ts = cfg.thresholds.toArray
    val prev = state.getOption.getOrElse(GridState(0L, 0L, Nil))
    var covered = prev.covered
    var total = prev.total
    val closed = ArrayBuffer[RingFragRow](prev.rows.filter(_.closed): _*)
    val open = ArrayBuffer[RingFragRow](prev.rows.filterNot(_.closed): _*)
    tiles.foreach { t =>
      total = t.gdx.toLong * t.gdy
      covered += t.tw.toLong * t.th
      val spec = Tiling.TileSpec(t.tileX, t.tileY, t.sx0, t.sy0, t.tw, t.th,
        t.sx0, t.sy0, t.vw, t.vh,
        if (t.sx0 == 0) -1 else t.sx0, t.sx0 + t.tw - 1,
        if (t.sy0 == 0) -1 else t.sy0, t.sy0 + t.th - 1)
      val outs = Tiling.tileKernelMulti(t.values, spec, t.gdx, t.gdy, ts, cfg.smooth)
      ts.indices.foreach { ti =>
        outs(ti).rings.foreach(r =>
          closed += RingFragRow(gid, ti, closed = true, 0, 0, 0L, 0L, r.maxKey, 0, r.pts))
        outs(ti).frags.foreach(f =>
          open += RingFragRow(gid, ti, closed = false, t.tileX, t.tileY,
            f.startKey, f.endKey, f.maxKey, f.anchorPos, f.pts))
      }
    }
    val done = total > 0 && covered == total
    // merge this batch's open fragments with the carried ones, per threshold
    val stillOpen = ArrayBuffer[RingFragRow]()
    open.groupBy(_.ti).foreach { case (ti, rows) =>
      val res = FragmentMerge.merge(
        rows.map(r => OpenFrag(r.pts, r.startKey, r.endKey, r.maxKey, r.anchorPos)).toSeq)
      res.rings.foreach(r =>
        closed += RingFragRow(gid, ti, closed = true, 0, 0, 0L, 0L, r.maxKey, 0, r.pts))
      res.open.foreach(f =>
        stillOpen += RingFragRow(gid, ti, closed = false, 0, 0,
          f.startKey, f.endKey, f.maxKey, f.anchorPos, f.pts))
    }
    if (!done) {
      state.update(GridState(covered, total, (closed ++ stillOpen).toSeq))
      Iterator.empty
    } else {
      if (stillOpen.nonEmpty)
        throw new IllegalStateException(
          s"${stillOpen.length} fragments failed to close for completed grid $gid")
      state.remove()
      // assembly identical to ContourEngine.contoursFrom's reducer
      val (xs, ys, xo, yo) = (cfg.xStep, cfg.yStep, cfg.xOrigin, cfg.yOrigin)
      val byTi = closed.groupBy(_.ti)
      ts.indices.iterator.map { ti =>
        val rings = byTi.getOrElse(ti, ArrayBuffer.empty).toArray.sortBy(_.maxKey).map { r =>
          if (!cfg.isIdentityAffine) Assembly.applyAffine(r.pts, xs, ys, xo, yo)
          r.pts
        }
        val polys = Assembly.assembleContour(rings.toSeq)
        ContourRow(gid, ts(ti), polys.map(p => PolyRow(p.exterior.toSeq, p.holes.map(_.toSeq))))
      }
    }
  }
}

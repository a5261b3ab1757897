package graft.streaming

import graft.docs.DocCodec
import graft.engine.ContourEngine
import graft.model.{ContourRow, Doc, JobConfig}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

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
}

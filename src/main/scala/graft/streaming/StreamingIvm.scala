package graft.streaming

import graft.lake.Lake
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming INCREMENTAL VIEW MAINTENANCE — the aggregate counterpart of
  * [[StreamingLakeSink]]'s row append: each micro-batch folds ONLY its
  * own rows into a lake-resident materialized count+sum rollup
  * (`Lake.fullSums` of the batch merged via the abelian
  * `Lake.foldSums`), committed as a new VIEW snapshot whose op carries
  * the batch id. Unlike the complete-mode streaming rollups
  * (StreamingPricing et al.), the state here is NOT Spark-owned: the
  * view lives in the lake — durable, time-travelable (snapshot k IS the
  * rollup of the first k+1 batches), and readable by any engine while
  * the stream runs. Replay-proof the same way as the sink: a
  * re-delivered batch id is detected against the latest snapshot's op
  * and skipped, so every row folds in EXACTLY ONCE; per-batch cost is
  * O(|batch| + |touched keys|), never a history rescan.
  */
object StreamingIvm {

  private val OpPrefix = "ivm-batch-"

  private[graft] def opOf(batchId: Long): String = s"$OpPrefix$batchId"

  /** The per-batch fold — exposed so specs can exercise the replay path
    * deterministically. Returns false when the batch id was already
    * applied (restart re-delivery) and nothing was committed.
    */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long, viewTable: String,
                                keyCols: Seq[String], sumCols: Seq[String]): Boolean = {
    val spark = batch.sparkSession
    val last = Lake.latest(spark, viewTable)
    val lastApplied = last.map(_.op).collect {
      case op if op.startsWith(OpPrefix) => op.drop(OpPrefix.length).toLong
    }
    if (lastApplied.exists(_ >= batchId)) return false
    val deltaAgg = Lake.fullSums(batch, keyCols, sumCols)
    val next = last match {
      case None       => deltaAgg
      case Some(snap) => Lake.foldSums(Lake.read(spark, snap), deltaAgg, keyCols, sumCols)
    }
    Lake.commit(spark, viewTable, next, opOf(batchId))
    true
  }

  /** The live view: the latest maintained rollup. */
  def readView(spark: SparkSession, viewTable: String): DataFrame =
    Lake.read(spark, Lake.latest(spark, viewTable).getOrElse(
      throw new IllegalArgumentException(s"readView: $viewTable has no snapshot")))

  def start(df: DataFrame, viewTable: String, keyCols: Seq[String],
            sumCols: Seq[String], checkpoint: String): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        applyBatch(b.toDF(), id, viewTable, keyCols, sumCols)
        ()
      }
      .start()
}

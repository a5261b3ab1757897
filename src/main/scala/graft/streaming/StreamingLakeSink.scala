package graft.streaming

import graft.lake.Lake
import org.apache.spark.sql.{DataFrame, Row, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Idempotent streaming sink into the snapshot lake — the exactly-once
  * composition of the two subsystems: each micro-batch commits as ONE
  * lake snapshot whose op name carries the batch id
  * (`stream-batch-<id>`), making the sink REPLAY-PROOF: Structured
  * Streaming re-delivers an in-flight batch with the SAME id after a
  * restart, and the sink skips ids already committed (`latestFor` walks
  * manifests newest-first, so the probe reads O(1) manifests in the
  * common case). Combined with the lake's seq-collision commit, a
  * crashed commit either left no complete manifest (the replay
  * recommits; `sweepOrphans` reclaims the half-written data dir) or a
  * complete one (the replay skips) — every stream row lands in the table
  * EXACTLY ONCE either way.
  *
  * The table is an APPEND LOG over snapshots (the Iceberg append
  * contract): each batch's snapshot holds that batch's rows, and
  * [[readTable]] resolves the live contents as the union of all complete
  * stream-batch snapshots — one manifest listing plus a multi-path
  * parquet read, no compaction required (and [[Lake.compact]]-style
  * maintenance can rewrite history without changing what readers see).
  */
object StreamingLakeSink {

  private val OpPrefix = "stream-batch-"

  private[graft] def opOf(batchId: Long): String = s"$OpPrefix$batchId"

  /** The per-batch commit body — exposed so specs can exercise the
    * replay path deterministically (same id, second delivery -> no-op).
    */
  private[graft] def commitBatch(batch: DataFrame, batchId: Long, table: String): Unit = {
    val spark = batch.sparkSession
    if (Lake.latestFor(spark, table, opOf(batchId)).isEmpty) {
      Lake.commit(spark, table, batch, opOf(batchId))
      ()
    }
  }

  /** Live table contents: the union of every complete stream-batch
    * snapshot, in batch order.
    */
  def readTable(spark: SparkSession, table: String): DataFrame = {
    val paths = Lake.snapshots(spark, table)
      .filter(_.op.startsWith(OpPrefix)).map(_.path)
    require(paths.nonEmpty, s"readTable: $table has no stream-batch snapshots")
    spark.read.parquet(paths: _*)
  }

  def start(df: DataFrame, table: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: Dataset[Row], id: Long) => commitBatch(b.toDF(), id, table))
      .start()
}

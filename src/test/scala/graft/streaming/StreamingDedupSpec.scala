package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** Streaming dedup: first arrival wins across micro-batches; duplicate
  * text inside the watermark horizon is dropped; once the watermark
  * evicts a fingerprint, a later re-arrival re-emits (the documented
  * bounded-state trade).
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("cross-batch dedup with bounded, watermark-evicted state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val ckpt = Files.createTempDirectory("dedup-ckpt").toString
    val q = StreamingDedup.dedup(docs, horizon = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      def ids(): Set[Long] =
        spark.sql("SELECT doc_id FROM dedup_out").as[Long].collect().toSet

      input.addData((1L, "aaa", ts(100)), (2L, "bbb", ts(101)))
      q.processAllAvailable()
      assert(ids() == Set(1L, 2L))

      // batch 2: a duplicate inside the horizon is dropped, new text passes
      input.addData((3L, "aaa", ts(105)), (4L, "ccc", ts(106)))
      q.processAllAvailable()
      assert(ids() == Set(1L, 2L, 4L))

      // advance the watermark far past the old fingerprints
      input.addData((5L, "ddd", ts(200)))
      q.processAllAvailable()
      assert(ids() == Set(1L, 2L, 4L, 5L))

      // "bbb" state was evicted (watermark 200-10=190 > 101): re-arrival re-emits
      input.addData((6L, "bbb", ts(201)))
      q.processAllAvailable()
      assert(ids() == Set(1L, 2L, 4L, 5L, 6L))

      // state stays bounded: at most the fingerprints inside the horizon
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty && state.head.numRowsTotal <= 3,
        s"state rows ${state.map(_.numRowsTotal).mkString(",")}")
    } finally q.stop()
  }
}

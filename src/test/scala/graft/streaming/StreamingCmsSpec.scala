package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming CMS: the complete-mode cell table must equal the batch
  * sketch of the full history bit for bit, every cell monotone
  * non-decreasing across micro-batches (counts only add), state bounded
  * at d x w = 128 rows, and recovered from the checkpoint through a
  * kill-restart.
  */
class StreamingCmsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def batchCells(): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    graft.queries.StatsOps.cmsSketch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("final cell table == batch sketch; cells monotone across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val uids = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").as[Long].collect().toSeq
    val input = MemoryStream[Long]
    val events = input.toDF().toDF("user_id")
    val ckpt = Files.createTempDirectory("cms-ckpt").toString
    val q = StreamingCms.cmsCells(events)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      def out(): Map[(Long, Long), Long] =
        spark.sql("SELECT * FROM cms_out").as[(Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
      var prev = Map.empty[(Long, Long), Long]
      var prevTotal = 0L
      uids.grouped((uids.length + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
        val cur = out()
        assert(cur.size <= 128, "sketch state must stay bounded at d x w cells")
        prev.foreach { case (cell, n) =>
          assert(cur(cell) >= n, s"cell $cell regressed")
        }
        // mass conservation: each micro-batch adds exactly 2 counts per id
        assert(cur.values.sum == prevTotal + 2L * b.length)
        prevTotal = cur.values.sum
        prev = cur
      }
      val want = batchCells().map(r => (r._1, r._2) -> r._3).toMap
      assert(prev == want, "final streaming cells != batch sketch")
    } finally q.stop()
  }

  test("cells recover from the checkpoint across a kill-restart") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val uids = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").as[Long].collect().toSeq
    val (first, second) = uids.splitAt(uids.length / 2)
    val ckpt = Files.createTempDirectory("cms-ckpt2").toString

    val input1 = MemoryStream[Long]
    val q1 = StreamingCms.cmsCells(input1.toDF().toDF("user_id"))
      .writeStream.format("memory").queryName("cms_r1")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try { input1.addData(first); q1.processAllAvailable() } finally q1.stop()

    // restart against the same checkpoint: MemoryStream offsets replay the
    // committed batch, so re-add the first half, then feed the second
    val input2 = MemoryStream[Long]
    input2.addData(first)
    val q2 = StreamingCms.cmsCells(input2.toDF().toDF("user_id"))
      .writeStream.format("memory").queryName("cms_r2")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      input2.addData(second)
      q2.processAllAvailable()
      val got = spark.sql("SELECT * FROM cms_r2").as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3)).toSeq.sortBy(r => (r._1, r._2))
      assert(got == batchCells(), "post-restart cells != batch sketch")
    } finally q2.stop()
  }
}

package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming HLL: the complete-mode register table must equal the batch
  * sketch of the full history bit for bit, grow monotonically across
  * micro-batches (register max-merge), stay bounded at m = 64 rows, and
  * recover its state from the checkpoint through a kill-restart.
  */
class StreamingDistinctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def batchRegisters(): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    graft.queries.StatsOps.hllRegisters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("final register table == batch sketch; monotone across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val uids = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").as[Long].collect().toSeq
    val input = MemoryStream[Long]
    val events = input.toDF().toDF("user_id")
    val ckpt = Files.createTempDirectory("hll-ckpt").toString
    val q = StreamingDistinct.hllRegisters(events)
      .writeStream.format("memory").queryName("hll_out")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      def out(): Map[Long, (Long, Long)] =
        spark.sql("SELECT * FROM hll_out").as[(Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3)).toMap
      var prev = Map.empty[Long, (Long, Long)]
      uids.grouped((uids.length + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
        val cur = out()
        assert(cur.size <= 64, "sketch state must stay bounded at m rows")
        // registers only grow; per-bucket row counts only grow
        prev.foreach { case (bkt, (reg, n)) =>
          val (reg2, n2) = cur(bkt)
          assert(reg2 >= reg && n2 >= n, s"bucket $bkt regressed")
        }
        prev = cur
      }
      val want = batchRegisters().map(r => r._1 -> (r._2, r._3)).toMap
      assert(prev == want, "final streaming registers != batch sketch")
    } finally q.stop()
  }

  test("registers recover from the checkpoint across a kill-restart") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val uids = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").as[Long].collect().toSeq
    val (first, second) = uids.splitAt(uids.length / 2)
    val ckpt = Files.createTempDirectory("hll-ckpt2").toString

    val input1 = MemoryStream[Long]
    val q1 = StreamingDistinct.hllRegisters(input1.toDF().toDF("user_id"))
      .writeStream.format("memory").queryName("hll_r1")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try { input1.addData(first); q1.processAllAvailable() } finally q1.stop()

    // restart against the same checkpoint: MemoryStream offsets replay the
    // committed batch, so re-add the first half, then feed the second
    val input2 = MemoryStream[Long]
    input2.addData(first)
    val q2 = StreamingDistinct.hllRegisters(input2.toDF().toDF("user_id"))
      .writeStream.format("memory").queryName("hll_r2")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      input2.addData(second)
      q2.processAllAvailable()
      val got = spark.sql("SELECT * FROM hll_r2").as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3)).toSeq.sortBy(_._1)
      assert(got == batchRegisters(), "post-restart registers != batch sketch")
    } finally q2.stop()
  }
}

package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming exact top-k: after every micro-batch the complete-mode table
  * must equal the local top-k of the full prefix under the batch total
  * order (value DESC, event_id ASC), the k-th value must never decrease,
  * the final table must equal the batch q_top_events rows exactly, and
  * the fold state must recover from the checkpoint across a kill-restart.
  */
class StreamingTopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val K = graft.queries.StatsOps.TopK

  private def eventsLocal(): Seq[(Long, Double)] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "value").as[(Long, Double)].collect().toSeq
  }

  private def localTopK(rows: Seq[(Long, Double)]): Seq[(Long, Long, Double)] =
    rows.sortBy { case (id, v) => (-v, id) }.take(K).zipWithIndex
      .map { case ((id, v), i) => (i + 1L, id, v) }

  test("per-batch table == local prefix top-k; k-th value monotone; final == batch q_top_events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = eventsLocal()
    val input = MemoryStream[(Long, Double)]
    val events = input.toDF().toDF("event_id", "value")
    val ckpt = Files.createTempDirectory("topk-ckpt").toString
    val q = StreamingTopK.topEvents(events)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      def out(): Seq[(Long, Long, Double)] =
        spark.sql("SELECT * FROM topk_out").as[(Long, Long, Double)]
          .collect().toSeq.sortBy(_._1)
      var seen = Vector.empty[(Long, Double)]
      var prevKth = Option.empty[Double] // defined once the list is FULL
      rows.grouped((rows.length + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
        seen ++= b
        val cur = out()
        assert(cur == localTopK(seen), "streaming table != prefix top-k")
        // the k-th value is monotone only once k rows exist (before that
        // the "last" row is just the running minimum)
        if (cur.length == K) {
          val kth = cur.last._3
          prevKth.foreach(p => assert(kth >= p, "k-th value regressed"))
          prevKth = Some(kth)
        }
      }
      val batch = graft.queries.StatsOps.topEvents(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(out() == batch, "final streaming top-k != batch q_top_events")
    } finally q.stop()
  }

  test("small k drops dominated rows through the bounded fold (k = 7)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = eventsLocal()
    val input = MemoryStream[(Long, Double)]
    val ckpt = Files.createTempDirectory("topk-ckpt3").toString
    val q = StreamingTopK.topEvents(input.toDF().toDF("event_id", "value"), k = 7)
      .writeStream.format("memory").queryName("topk_small")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      var seen = Vector.empty[(Long, Double)]
      rows.grouped((rows.length + 4) / 5).foreach { b =>
        input.addData(b); q.processAllAvailable()
        seen ++= b
        val cur = spark.sql("SELECT * FROM topk_small").as[(Long, Long, Double)]
          .collect().toSeq.sortBy(_._1)
        val want = seen.sortBy { case (id, v) => (-v, id) }.take(7).zipWithIndex
          .map { case ((id, v), i) => (i + 1L, id, v) }
        assert(cur == want, s"k=7 prefix top-k mismatch at |seen|=${seen.length}")
      }
    } finally q.stop()
  }

  test("top-k state recovers from the checkpoint across a kill-restart") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = eventsLocal()
    val (first, second) = rows.splitAt(rows.length / 2)
    val ckpt = Files.createTempDirectory("topk-ckpt2").toString

    val input1 = MemoryStream[(Long, Double)]
    val q1 = StreamingTopK.topEvents(input1.toDF().toDF("event_id", "value"))
      .writeStream.format("memory").queryName("topk_r1")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try { input1.addData(first); q1.processAllAvailable() } finally q1.stop()

    // restart from the same checkpoint with ONLY the second half queued:
    // the recovered fold must still account for the first half
    val input2 = MemoryStream[(Long, Double)]
    input2.addData(first) // MemoryStream replays its own buffer on recovery
    input2.addData(second)
    val q2 = StreamingTopK.topEvents(input2.toDF().toDF("event_id", "value"))
      .writeStream.format("memory").queryName("topk_r2")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      val got = spark.sql("SELECT * FROM topk_r2").as[(Long, Long, Double)]
        .collect().toSeq.sortBy(_._1)
      assert(got == localTopK(rows), "post-restart top-k != full-history top-k")
    } finally q2.stop()
  }
}

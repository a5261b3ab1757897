package graft.streaming

import graft.SparkTestSession
import graft.queries.EventOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** Streaming sessionization must equal the batch operator once every
  * session is closed, including per-user lifetime session ordinals; and
  * out-of-order arrivals inside the watermark horizon must merge open
  * sessions exactly.
  */
class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("streaming == batch sessionize on sf0.001 once the watermark closes everything") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "cast(ts as timestamp) as ts", "value")
      .as[(Long, Timestamp, Double)].collect().sortBy(_._2.getTime)
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val ckpt = Files.createTempDirectory("sess-ckpt").toString
    val q = StreamingSessionize.sessionize(events, horizon = "0 seconds")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // three chronological micro-batches, then two sentinel batches: the
      // first advances the watermark past every real session + gap, the
      // second triggers the resulting event-time timeouts
      val far = rows.last._2.getTime / 60000L + 24 * 60
      val batches = rows.grouped((rows.length + 2) / 3).toSeq
      batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      input.addData((-1L, ts(far), 0.0)); q.processAllAvailable()
      input.addData((-1L, ts(far + 1), 0.0)); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM sess_out").as[SessionOut].collect()
        .filter(_.user_id >= 0)
        .map(s => (s.user_id, s.session_idx, s.n_events, s.start_us, s.end_us, s.qsum))
        .sortBy(r => (r._1, r._2)).toSeq
      val want = EventOps.sessionize(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSeq
      assert(got == want)
      assert(want.nonEmpty && want.exists(_._3 > 1))
    } finally q.stop()
  }

  test("out-of-order arrivals merge open sessions; ordinals survive state drain") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val ckpt = Files.createTempDirectory("sess-ckpt2").toString
    val gapUs = 10L * 60 * 1000000 // 10 minutes
    val q = StreamingSessionize.sessionize(events, gapUs = gapUs, horizon = "60 minutes")
      .writeStream.format("memory").queryName("sess_out2")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // keep the timeline clear of the initial watermark (epoch 0): an
      // event AT the watermark boundary is filtered as late
      val b = 1000L
      def out(): Seq[(Long, Long, Long, Long, Long)] =
        spark.sql("SELECT * FROM sess_out2").as[SessionOut].collect()
          .filter(_.user_id >= 0)
          .map(s => (s.user_id, s.session_idx, s.n_events,
            s.start_us / 60000000L - b, s.end_us / 60000000L - b))
          .sortBy(r => (r._1, r._2)).toSeq

      // three disjoint open fragments for user 7, out of order...
      input.addData((7L, ts(b + 0), 1.0), (7L, ts(b + 24), 1.0), (7L, ts(b + 12), 1.0))
      q.processAllAvailable()
      // ...then two bridging events that merge ALL of them into one session
      input.addData((7L, ts(b + 6), 1.0), (7L, ts(b + 18), 1.0))
      q.processAllAvailable()
      assert(out().isEmpty) // nothing closable yet

      // advance the watermark far past 24min + gap, then trigger timeouts
      input.addData((-1L, ts(b + 300), 0.0)); q.processAllAvailable()
      input.addData((-1L, ts(b + 301), 0.0)); q.processAllAvailable()
      assert(out() == Seq((7L, 1L, 5L, 0L, 24L)))

      // a later session for the same user continues the ordinal ledger
      input.addData((7L, ts(b + 400), 1.0)); q.processAllAvailable()
      input.addData((-1L, ts(b + 600), 0.0)); q.processAllAvailable()
      input.addData((-1L, ts(b + 601), 0.0)); q.processAllAvailable()
      assert(out() == Seq((7L, 1L, 5L, 0L, 24L), (7L, 2L, 1L, 400L, 400L)))
    } finally q.stop()
  }

  test("state survives a query restart from the checkpoint (open sessions + ordinals)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val ckpt = Files.createTempDirectory("sess-ckpt3").toString
    val outDir = Files.createTempDirectory("sess-out3").toString
    val gapUs = 10L * 60 * 1000000
    // the memory sink refuses checkpoint recovery — a FILE sink is the
    // fault-tolerant one, which is exactly what this test is about
    def start() = StreamingSessionize.sessionize(events, gapUs = gapUs, horizon = "60 minutes")
      .writeStream.format("parquet").option("path", outDir)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    def out(): Seq[(Long, Long, Long, Long, Long)] =
      spark.read.schema(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[SessionOut]().schema)
        .parquet(outDir).as[SessionOut].collect()
        .filter(_.user_id >= 0)
        .map(s => (s.user_id, s.session_idx, s.n_events,
          s.start_us / 60000000L - 1000, s.end_us / 60000000L - 1000))
        .sortBy(r => (r._1, r._2)).toSeq
    val b = 1000L
    val q1 = start()
    try {
      // an OPEN session enters state, then the query dies
      input.addData((9L, ts(b + 0), 1.0), (9L, ts(b + 5), 1.0))
      q1.processAllAvailable()
      assert(out().isEmpty)
    } finally q1.stop()
    val q2 = start()
    try {
      // the restarted query extends the recovered open session...
      input.addData((9L, ts(b + 12), 1.0))
      q2.processAllAvailable()
      // ...and closes it with the recovered count + bounds intact
      input.addData((-1L, ts(b + 300), 0.0)); q2.processAllAvailable()
      input.addData((-1L, ts(b + 301), 0.0)); q2.processAllAvailable()
      assert(out() == Seq((9L, 1L, 3L, 0L, 12L)))
      // a post-restart second session continues the recovered ordinal ledger
      input.addData((9L, ts(b + 400), 1.0)); q2.processAllAvailable()
      input.addData((-1L, ts(b + 600), 0.0)); q2.processAllAvailable()
      input.addData((-1L, ts(b + 601), 0.0)); q2.processAllAvailable()
      assert(out() == Seq((9L, 1L, 3L, 0L, 12L), (9L, 2L, 1L, 400L, 400L)))
    } finally q2.stop()
  }
}

package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** Stream-stream interval join: the emitted (purchase, view) pairs must
  * equal the batch attribution join exactly — including per-purchase
  * counts vs the batch windowJoin operator — each pair exactly once, with
  * cross-batch arrival (view first, purchase later) covered explicitly.
  */
class StreamingJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("emitted pairs == batch attribution pairs on sf0.001 (exactly once)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_type"))
    def side(kind: String) = ev.filter(col("event_type") === kind)
      .select("event_id", "user_id", "ts")
      .as[(Long, Long, Timestamp)].collect().sortBy(_._3.getTime)
    val vRows = side("view"); val pRows = side("purchase")
    val vIn = MemoryStream[(Long, Long, Timestamp)]
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    def frame(in: MemoryStream[(Long, Long, Timestamp)]) =
      in.toDF().toDF("event_id", "user_id", "ts")
    val ckpt = Files.createTempDirectory("ssj-ckpt").toString
    val q = StreamingJoin.viewPurchaseJoin(frame(vIn), frame(pIn))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val vCh = vRows.grouped((vRows.length + 2) / 3).toSeq
      val pCh = pRows.grouped((pRows.length + 2) / 3).toSeq
      for (i <- 0 until 3) {
        vIn.addData(vCh(i).toSeq); pIn.addData(pCh(i).toSeq)
        q.processAllAvailable()
      }
      val gotAll = spark.sql("SELECT purchase_id, view_id FROM ssj_out")
        .as[(Long, Long)].collect().toSeq
      assert(gotAll.length == gotAll.toSet.size, "a pair emitted more than once")
      // independent batch reference: plain range join on the same frames
      val wUs = 86400000000L
      val want = (for {
        (pid, pu, pt) <- pRows
        (vid, vu, vt) <- vRows
        if vu == pu
        pUs = pt.getTime * 1000L; vUs = vt.getTime * 1000L
        if vUs >= pUs - wUs && vUs < pUs
      } yield (pid, vid)).toSet
      assert(gotAll.toSet == want && want.nonEmpty)
      // and per-purchase counts equal the batch windowJoin operator's > 0 rows
      val wantCounts = graft.queries.EventOps.windowJoin(spark, sf)
        .filter(col("n_views") > 0).as[(Long, Long)].collect().toSet
      val gotCounts = gotAll.groupBy(_._1).map { case (p, s) => (p, s.size.toLong) }.toSet
      assert(gotCounts == wantCounts)
    } finally q.stop()
  }

  test("cross-batch arrival matches; outside-window and same-instant views don't") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vIn = MemoryStream[(Long, Long, Timestamp)]
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    def frame(in: MemoryStream[(Long, Long, Timestamp)]) =
      in.toDF().toDF("event_id", "user_id", "ts")
    val ckpt = Files.createTempDirectory("ssj-ckpt2").toString
    val q = StreamingJoin.viewPurchaseJoin(frame(vIn), frame(pIn))
      .writeStream.format("memory").queryName("ssj_out2")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      def out(): Set[(Long, Long)] =
        spark.sql("SELECT purchase_id, view_id FROM ssj_out2")
          .as[(Long, Long)].collect().toSet
      val day = 24 * 60L
      // batch 1: three views for user 7 — one in-window, one 25 h earlier
      // (outside), one that will share the purchase's exact instant
      vIn.addData((101L, 7L, ts(2 * day + 30)), (102L, 7L, ts(day + 5)),
        (103L, 7L, ts(2 * day + 60)))
      q.processAllAvailable()
      assert(out().isEmpty) // no purchase yet
      // batch 2: the purchase arrives — only the in-window earlier view
      // matches (strict v_ts < p_ts excludes 103's equal instant); a
      // different user's purchase matches nothing
      pIn.addData((900L, 7L, ts(2 * day + 60)), (901L, 8L, ts(2 * day + 60)))
      q.processAllAvailable()
      assert(out() == Set((900L, 101L)))
    } finally q.stop()
  }
}

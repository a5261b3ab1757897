package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** Tumbling-window stats: closed windows must equal the batch windowed
  * aggregation bit-for-bit (append mode emits once per window), and
  * cross-batch accumulation into one window must merge before emission.
  */
class StreamingWindowStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("closed windows == batch windowed aggregation on sf0.001") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val rows = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("user_id", "cast(ts as timestamp) as ts", "value")
      .as[(Long, Timestamp, Double)].collect().sortBy(_._2.getTime)
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val ckpt = Files.createTempDirectory("win-ckpt").toString
    val q = StreamingWindowStats.windowStats(events, horizon = "0 seconds")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val far = rows.last._2.getTime / 60000L + 24 * 60
      rows.grouped((rows.length + 2) / 3).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      input.addData((-1L, ts(far), 0.0)); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM win_out")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        // keep every real window (starts at/before the last real event —
        // exactly far-24h when that event sits on a boundary); the
        // sentinel's own window never closes, so it never emits anyway
        .filter(_._1 <= far * 60000000L - 24L * 3600 * 1000000)
        .sortBy(_._1).toSeq
      val want = spark.read.parquet(s"$sf/events.parquet")
        .select(col("ts").cast("timestamp").as("ts"),
          floor(col("value") * 1048576.0).cast("long").as("qv"))
        .groupBy(window(col("ts"), "10 minutes").as("w"))
        .agg(count(lit(1)).as("n"), sum("qv").as("qs"), min("qv").as("mn"), max("qv").as("mx"))
        .select(unix_micros(col("w.start")), unix_micros(col("w.end")),
          col("n"), col("qs"), col("mn"), col("mx"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == want)
      assert(want.nonEmpty && want.exists(_._3 > 1))
    } finally q.stop()
  }

  test("a window spanning micro-batches merges before it closes; emits exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val ckpt = Files.createTempDirectory("win-ckpt2").toString
    val q = StreamingWindowStats.windowStats(events, windowLen = "10 minutes",
      horizon = "30 minutes")
      .writeStream.format("memory").queryName("win_out2")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      def out(): Seq[(Long, Long, Long)] =
        spark.sql("SELECT start_us, n_events, qsum FROM win_out2")
          .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val b = 1000L
      // two batches landing in the SAME 10-minute window [b, b+10)
      input.addData((1L, ts(b + 1), 1.0), (2L, ts(b + 4), 2.0))
      q.processAllAvailable()
      input.addData((3L, ts(b + 7), 4.0))
      q.processAllAvailable()
      assert(out().isEmpty) // watermark hasn't passed the window end
      // advance the watermark far past b+10 + horizon
      input.addData((-1L, ts(b + 100), 0.0))
      q.processAllAvailable()
      val rows = out()
      assert(rows.size == 1)
      val (start, n, qsum) = rows.head
      assert(start == b * 60000000L && n == 3L &&
        qsum == (1L + 2L + 4L) * 1048576L)
    } finally q.stop()
  }

  test("window state survives a query restart from the checkpoint; closed windows emit exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val ckpt = Files.createTempDirectory("win-ckpt3").toString
    val outDir = Files.createTempDirectory("win-out3").toString
    // the memory sink refuses checkpoint recovery — the FILE sink is the
    // fault-tolerant one, which is exactly what this test is about
    def start() = StreamingWindowStats.windowStats(events, windowLen = "10 minutes",
      horizon = "30 minutes")
      .writeStream.format("parquet").option("path", outDir)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val schema = new org.apache.spark.sql.types.StructType()
      .add("start_us", "long").add("end_us", "long").add("n_events", "long")
      .add("qsum", "long").add("qmin", "long").add("qmax", "long")
    def out(): Seq[(Long, Long, Long, Long, Long)] =
      spark.read.schema(schema).parquet(outDir)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1 / 60000000L, r._3, r._4, r._5, r._6))
        .sortBy(_._1).toSeq
    val b = 1000L
    val Q = 1048576L
    val q1 = start()
    try {
      // a PARTIALLY-FILLED window enters Spark-owned state, then the query dies
      input.addData((1L, ts(b + 1), 1.0), (2L, ts(b + 4), 2.0))
      q1.processAllAvailable()
      assert(out().isEmpty)
    } finally q1.stop()
    val q2 = start()
    try {
      // the restarted query merges new events into the RECOVERED window...
      input.addData((3L, ts(b + 7), 4.0))
      q2.processAllAvailable()
      // ...and the watermark closes it with counts from both incarnations
      input.addData((-1L, ts(b + 100), 0.0))
      q2.processAllAvailable()
      assert(out() == Seq((b, 3L, 7L * Q, 1L * Q, 4L * Q)))
      // post-restart windows keep flowing; the recovered window re-emits
      // NOTHING (exactly-once across the restart is the full sorted set)
      input.addData((4L, ts(b + 200), 8.0))
      q2.processAllAvailable()
      input.addData((-1L, ts(b + 400), 0.0))
      q2.processAllAvailable()
      assert(out() == Seq(
        (b, 3L, 7L * Q, 1L * Q, 4L * Q),          // spans the restart
        (b + 100, 1L, 0L, 0L, 0L),                 // first sentinel's window
        (b + 200, 1L, 8L * Q, 8L * Q, 8L * Q)))    // post-restart window
    } finally q2.stop()
  }
}

package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming exact quantile locator: after every micro-batch the
  * complete-mode ladder must equal the shared locate walk over a local
  * histogram of the full prefix, the final ladder must agree with batch
  * q_auto_thresholds (same k, and the selected threshold value lives in
  * the located bucket), and the histogram state must recover from the
  * checkpoint across a kill-restart.
  */
class StreamingQuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def valuesLocal(): Seq[Double] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("value").as[Double].collect().toSeq
  }

  private def ladderLocal(vs: Seq[Double]): Seq[(Double, Long, Long, Long)] = {
    val hist = vs.groupBy(v => if (v.isNaN) Long.MaxValue else math.floor(v).toLong)
      .map { case (b, xs) => (b, xs.size.toLong) }.toArray.sortBy(_._1)
    graft.queries.StatsOps.locateLadder(hist)
  }

  test("per-batch ladder == local prefix locate; final agrees with batch q_auto_thresholds") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = valuesLocal()
    val input = MemoryStream[Double]
    val ckpt = Files.createTempDirectory("quant-ckpt").toString
    val q = StreamingQuantile.quantileLadder(input.toDF().toDF("value"))
      .writeStream.format("memory").queryName("quant_out")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      def out(): Seq[(Double, Long, Long, Long)] =
        spark.sql("SELECT * FROM quant_out").as[(Double, Long, Long, Long)]
          .collect().toSeq.sortBy(_._1)
      var seen = Vector.empty[Double]
      rows.grouped((rows.length + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
        seen ++= b
        assert(out() == ladderLocal(seen), s"prefix ladder mismatch at |seen|=${seen.length}")
      }
      // batch agreement: same target rank per quantile, and the batch
      // operator's selected VALUE lands in the located bucket
      val batch = graft.queries.StatsOps.autoThresholds(spark, sf).collect()
        .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2))).toSeq.sortBy(_._1)
      val ladder = out()
      assert(ladder.map(l => (l._1, l._2)) == batch.map(b => (b._1, b._2)))
      ladder.zip(batch).foreach { case ((_, _, bucket, _), (_, _, thr)) =>
        assert(math.floor(thr).toLong == bucket, s"threshold $thr outside bucket $bucket")
      }
    } finally q.stop()
  }

  test("quantile histogram state recovers from the checkpoint across a kill-restart") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = valuesLocal()
    val (first, second) = rows.splitAt(rows.length / 2)
    val ckpt = Files.createTempDirectory("quant-ckpt2").toString

    val input1 = MemoryStream[Double]
    val q1 = StreamingQuantile.quantileLadder(input1.toDF().toDF("value"))
      .writeStream.format("memory").queryName("quant_r1")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try { input1.addData(first); q1.processAllAvailable() } finally q1.stop()

    val input2 = MemoryStream[Double]
    input2.addData(first) // MemoryStream replays its own buffer on recovery
    input2.addData(second)
    val q2 = StreamingQuantile.quantileLadder(input2.toDF().toDF("value"))
      .writeStream.format("memory").queryName("quant_r2")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      val got = spark.sql("SELECT * FROM quant_r2").as[(Double, Long, Long, Long)]
        .collect().toSeq.sortBy(_._1)
      assert(got == ladderLocal(rows), "post-restart ladder != full-history locate")
    } finally q2.stop()
  }
}

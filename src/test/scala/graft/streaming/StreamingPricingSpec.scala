package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming fixed-point pricing rollup: after every micro-batch the
  * complete-mode table must equal a local cents-quantized recompute of
  * the full prefix, and the keyed sums must recover from the checkpoint
  * across a kill-restart.
  */
class StreamingPricingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private type Li = (String, String, Double, Double, Double, Double)

  private def linesLocal(): Seq[Li] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      .as[Li].collect().toSeq
  }

  private def q100(x: Double): Long = math.floor(x * 100.0).toLong

  private def rollupLocal(ls: Seq[Li]): Seq[(String, String, Long, Long, Long, Long, Long)] =
    ls.groupBy(l => (l._1, l._2)).toSeq.map { case ((rf, st), xs) =>
      (rf, st, xs.size.toLong,
        xs.map(l => q100(l._3)).sum,
        xs.map(l => q100(l._4)).sum,
        xs.map(l => q100(l._4) * (100L - q100(l._5))).sum,
        xs.map(l => BigInt(q100(l._4) * (100L - q100(l._5))) * (100L + q100(l._6))).sum.toLong)
    }.sortBy(r => (r._1, r._2))

  private def toDf(in: MemoryStream[Li]) =
    in.toDF().toDF("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax")

  test("per-batch table == local prefix rollup; final == batch fixed-point sums") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = linesLocal()
    val input = MemoryStream[Li]
    val ckpt = Files.createTempDirectory("pricing-ckpt").toString
    val q = StreamingPricing.pricingTotals(toDf(input))
      .writeStream.format("memory").queryName("pricing_out")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      def out() = spark.sql("SELECT * FROM pricing_out")
        .as[(String, String, Long, Long, Long, Long, Long)]
        .collect().toSeq.sortBy(r => (r._1, r._2))
      var seen = Vector.empty[Li]
      rows.grouped((rows.length + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
        seen ++= b
        assert(out() == rollupLocal(seen), s"prefix rollup mismatch at |seen|=${seen.length}")
      }
      assert(out() == rollupLocal(rows))
    } finally q.stop()
  }

  test("pricing sums recover from the checkpoint across a kill-restart") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = linesLocal()
    val (first, second) = rows.splitAt(rows.length / 2)
    val ckpt = Files.createTempDirectory("pricing-ckpt2").toString

    val input1 = MemoryStream[Li]
    val q1 = StreamingPricing.pricingTotals(toDf(input1))
      .writeStream.format("memory").queryName("pricing_r1")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try { input1.addData(first); q1.processAllAvailable() } finally q1.stop()

    val input2 = MemoryStream[Li]
    input2.addData(first) // MemoryStream replays its own buffer on recovery
    input2.addData(second)
    val q2 = StreamingPricing.pricingTotals(toDf(input2))
      .writeStream.format("memory").queryName("pricing_r2")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      val got = spark.sql("SELECT * FROM pricing_r2")
        .as[(String, String, Long, Long, Long, Long, Long)]
        .collect().toSeq.sortBy(r => (r._1, r._2))
      assert(got == rollupLocal(rows), "post-restart rollup != full-history rollup")
    } finally q2.stop()
  }
}

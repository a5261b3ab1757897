package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Stream-static enrichment rollup: after every micro-batch the
  * complete-mode margin table must equal a local recompute of the full
  * prefix joined to the static part dimension, and it must recover from
  * the checkpoint across a kill-restart.
  */
class StreamingMarginSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private type Li = (Long, Double, Double, Double)

  private def q100(x: Double): Long = math.floor(x * 100.0).toLong

  private lazy val partDim = spark.read.parquet(s"$sf/part.parquet")
    .selectExpr("p_partkey", "p_type", "p_retailprice")

  private lazy val partLocal: Map[Long, (String, Long)] = {
    import spark.implicits._
    partDim.as[(Long, String, Double)].collect()
      .map(p => p._1 -> (p._2, q100(p._3))).toMap
  }

  private def linesLocal(): Seq[Li] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .as[Li].collect().toSeq
  }

  private def rollupLocal(ls: Seq[Li]): Seq[(String, Long, Long, Long)] =
    ls.groupBy(l => partLocal(l._1)._1).toSeq.map { case (t, xs) =>
      val revs = xs.map(l => BigInt(q100(l._3) * (100L - q100(l._4))))
      val costs = xs.map(l => BigInt(partLocal(l._1)._2 * q100(l._2)))
      (t, xs.size.toLong, revs.sum.toLong, (revs.sum - costs.sum).toLong)
    }.sortBy(_._1)

  private def toDf(in: MemoryStream[Li]) =
    in.toDF().toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")

  test("per-batch table == local prefix enrich+rollup; complete coverage of part types") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = linesLocal()
    val input = MemoryStream[Li]
    val ckpt = Files.createTempDirectory("margin-ckpt").toString
    val q = StreamingMargin.marginTotals(toDf(input), partDim)
      .writeStream.format("memory").queryName("margin_out")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      def out() = spark.sql("SELECT * FROM margin_out")
        .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      var seen = Vector.empty[Li]
      rows.grouped((rows.length + 2) / 3).foreach { b =>
        input.addData(b); q.processAllAvailable()
        seen ++= b
        assert(out() == rollupLocal(seen), s"prefix mismatch at |seen|=${seen.length}")
      }
      assert(out() == rollupLocal(rows))
      assert(out().size == 6, "all six part types must appear")
    } finally q.stop()
  }

  test("margin sums recover from the checkpoint across a kill-restart") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = linesLocal()
    val (first, second) = rows.splitAt(rows.length / 2)
    val ckpt = Files.createTempDirectory("margin-ckpt2").toString

    val input1 = MemoryStream[Li]
    val q1 = StreamingMargin.marginTotals(toDf(input1), partDim)
      .writeStream.format("memory").queryName("margin_r1")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try { input1.addData(first); q1.processAllAvailable() } finally q1.stop()

    val input2 = MemoryStream[Li]
    input2.addData(first) // MemoryStream replays its own buffer on recovery
    input2.addData(second)
    val q2 = StreamingMargin.marginTotals(toDf(input2), partDim)
      .writeStream.format("memory").queryName("margin_r2")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      val got = spark.sql("SELECT * FROM margin_r2")
        .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got == rollupLocal(rows), "post-restart rollup != full-history rollup")
    } finally q2.stop()
  }
}

package graft.streaming

import graft.SparkTestSession
import graft.lake.Lake
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming IVM: after every micro-batch the lake-resident materialized
  * rollup must equal a local recompute of the full prefix; the view's own
  * snapshot history IS the per-batch rollup ladder (time travel); replay
  * of an applied batch id is a no-op; and a kill-restart never folds a
  * batch twice.
  */
class StreamingIvmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def rollupLocal(rows: Seq[(String, Long)]): Seq[(String, Long, Long)] =
    rows.groupBy(_._1).toSeq.map { case (k, xs) =>
      (k, xs.size.toLong, xs.map(_._2).sum)
    }.sortBy(_._1)

  private def view(table: String): Seq[(String, Long, Long)] = {
    import spark.implicits._
    StreamingIvm.readView(spark, table)
      .select("k", "n_rows", "a_sum").as[(String, Long, Long)]
      .collect().toSeq.sortBy(_._1)
  }

  test("per-batch view == local prefix rollup; snapshot ladder is the history; replay no-ops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val table = Files.createTempDirectory("ivm-view").toString
    val ckpt = Files.createTempDirectory("ivm-ckpt").toString
    val in = MemoryStream[(String, Long)]
    val q = StreamingIvm.start(in.toDF().toDF("k", "a"), table, Seq("k"), Seq("a"), ckpt)
    val b0 = Seq(("x", 1L), ("x", 2L), ("y", 10L))
    val b1 = Seq(("y", 20L), ("z", 100L))
    val b2 = Seq(("x", 3L), ("z", -100L))
    try {
      var seen = Vector.empty[(String, Long)]
      Seq(b0, b1, b2).foreach { b =>
        in.addData(b); q.processAllAvailable()
        seen ++= b
        assert(view(table) == rollupLocal(seen), s"view != prefix rollup at |seen|=${seen.length}")
      }
      // the view table's own history: snapshot s is the rollup of batches 0..s
      val snaps = Lake.snapshots(spark, table)
      assert(snaps.map(_.op) == Seq("ivm-batch-0", "ivm-batch-1", "ivm-batch-2"))
      assert(Lake.readAt(spark, table, 0L).select("k", "n_rows", "a_sum")
        .as[(String, Long, Long)].collect().toSeq.sortBy(_._1) == rollupLocal(b0))
      // replay of an applied id must commit nothing and change nothing
      val before = view(table)
      assert(!StreamingIvm.applyBatch(b2.toDF("k", "a"), 2L, table, Seq("k"), Seq("a")))
      assert(Lake.snapshots(spark, table).size == 3 && view(table) == before)
    } finally q.stop()
  }

  test("kill-restart never folds a batch twice") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val table = Files.createTempDirectory("ivm-view2").toString
    val ckpt = Files.createTempDirectory("ivm-ckpt2").toString
    val in = MemoryStream[(String, Long)]
    val first = Seq(("a", 5L), ("b", 7L), ("a", 5L))
    val q1 = StreamingIvm.start(in.toDF().toDF("k", "a"), table, Seq("k"), Seq("a"), ckpt)
    try { in.addData(first); q1.processAllAvailable() } finally q1.stop()
    // restart from the same checkpoint; the recovered query may re-deliver
    // batch 0 — the id probe must absorb it, or sums double silently
    val q2 = StreamingIvm.start(in.toDF().toDF("k", "a"), table, Seq("k"), Seq("a"), ckpt)
    try {
      in.addData(("b", -7L)); q2.processAllAvailable()
      assert(view(table) == rollupLocal(first :+ (("b", -7L))),
        "post-restart view must be the exactly-once rollup")
      val ops = Lake.snapshots(spark, table).map(_.op)
      assert(ops.distinct == ops, s"duplicate ivm snapshot: $ops")
    } finally q2.stop()
  }
}

package graft.streaming

import graft.SparkTestSession
import graft.lake.Lake
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming -> lake sink: one snapshot per micro-batch, exactly-once
  * rows through readTable, replay of an already-committed batch id is a
  * no-op, and a kill-restart continues the log without duplicating rows.
  */
class StreamingLakeSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("one snapshot per batch; readTable is the exactly-once union; replay no-ops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val table = Files.createTempDirectory("lake-sink").toString
    val ckpt = Files.createTempDirectory("lake-sink-ckpt").toString
    val in = MemoryStream[Long]
    val q = StreamingLakeSink.start(in.toDF().toDF("x"), table, ckpt)
    try {
      in.addData(1L, 2L, 3L); q.processAllAvailable()
      in.addData(4L, 5L); q.processAllAvailable()
      val snaps = Lake.snapshots(spark, table)
      assert(snaps.map(_.op) == Seq("stream-batch-0", "stream-batch-1"))
      assert(snaps.map(_.rows) == Seq(3L, 2L))
      assert(StreamingLakeSink.readTable(spark, table)
        .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      // simulate Structured Streaming's post-crash re-delivery: same batch
      // id arrives again (content-identical by the replay contract) — the
      // sink must not commit a second snapshot
      StreamingLakeSink.commitBatch(Seq(4L, 5L).toDF("x"), 1L, table)
      assert(Lake.snapshots(spark, table).size == 2)
      assert(StreamingLakeSink.readTable(spark, table).count() == 5)
    } finally q.stop()
  }

  test("kill-restart continues the batch log without duplicating rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val table = Files.createTempDirectory("lake-sink2").toString
    val ckpt = Files.createTempDirectory("lake-sink2-ckpt").toString
    val in = MemoryStream[Long]
    val q1 = StreamingLakeSink.start(in.toDF().toDF("x"), table, ckpt)
    try {
      in.addData(10L, 11L); q1.processAllAvailable()
    } finally q1.stop()
    // restart from the same checkpoint; MemoryStream keeps its backlog, so
    // the recovered query may REPLAY batch 0 before processing new data —
    // exactly the delivery the idempotent commit absorbs
    val q2 = StreamingLakeSink.start(in.toDF().toDF("x"), table, ckpt)
    try {
      in.addData(12L); q2.processAllAvailable()
      val rows = StreamingLakeSink.readTable(spark, table)
        .as[Long].collect().sorted.toSeq
      assert(rows == Seq(10L, 11L, 12L), s"got $rows")
      val ops = Lake.snapshots(spark, table).map(_.op)
      assert(ops.distinct == ops, s"duplicate batch snapshot: $ops")
    } finally q2.stop()
  }
}

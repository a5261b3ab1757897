package graft.streaming

import graft.SparkTestSession
import graft.core.Goldens
import graft.docs.DocCodec
import graft.engine.GridSynth
import graft.model.{ContourRow, JobConfig}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class StreamingContourSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("appended grids are re-contoured per micro-batch, matching batch output") {
    implicit val s = spark
    import spark.implicits._
    val inDir = Files.createTempDirectory("stream-in").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    val results = new java.util.concurrent.ConcurrentLinkedQueue[ContourRow]()

    DocCodec.encode(GridSynth.tilesFromArray(spark, "gA", Goldens.simpleGrid, 10, 10, 5, 5))
      .write.mode("append").parquet(inDir)
    val q = StreamingContour.start(spark, inDir, ckpt, JobConfig(Seq(0.5), smooth = true)) {
      (cts, _) => cts.collect().foreach(results.add)
    }
    try {
      q.processAllAvailable()
      assert(results.size == 1)
      val first = results.peek()
      assert(first.gridId == "gA")
      assert(first.polygons.head.exterior == Goldens.simpleExpected.toSeq)

      // append a second grid -> only the new grid is contoured in batch 2
      DocCodec.encode(GridSynth.tilesFromArray(spark, "gB", Goldens.multiGrid, 10, 10, 5, 5))
        .write.mode("append").parquet(inDir)
      q.processAllAvailable()
      assert(results.size == 2)
      assert(results.toArray(Array.empty[ContourRow]).exists(r =>
        r.gridId == "gB" && r.polygons.length == 2))
    } finally q.stop()
  }
}

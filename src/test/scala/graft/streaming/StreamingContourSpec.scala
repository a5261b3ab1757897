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
    val inDir = Files.createTempDirectory("stream-in")
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    val results = new java.util.concurrent.ConcurrentLinkedQueue[ContourRow]()

    // a grid's tiles must land atomically (the lake snapshot commit gives
    // this in production): stage as a single file, then move into the
    // watched dir — FileStreamSource would otherwise split one grid's
    // multi-file write across micro-batches and the merge would (correctly)
    // refuse to close its rings
    def appendGrid(name: String, grid: Array[Double]): Unit = {
      val staging = Files.createTempDirectory(s"stage-$name")
      DocCodec.encode(GridSynth.tilesFromArray(spark, name, grid, 10, 10, 5, 5))
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val file = Files.list(staging).iterator()
      var moved = false
      while (file.hasNext && !moved) {
        val p = file.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          Files.move(p, inDir.resolve(s"$name.parquet"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          moved = true
        }
      }
      assert(moved)
    }

    appendGrid("gA", Goldens.simpleGrid)
    val q = StreamingContour.start(spark, inDir.toString, ckpt, JobConfig(Seq(0.5), smooth = true)) {
      (cts, _) => cts.collect().foreach(results.add)
    }
    try {
      q.processAllAvailable()
      assert(results.size == 1)
      val first = results.peek()
      assert(first.gridId == "gA")
      assert(first.polygons.head.exterior == Goldens.simpleExpected.toSeq)

      // append a second grid -> only the new grid is contoured in batch 2
      appendGrid("gB", Goldens.multiGrid)
      q.processAllAvailable()
      assert(results.size == 2)
      assert(results.toArray(Array.empty[ContourRow]).exists(r =>
        r.gridId == "gB" && r.polygons.length == 2))
    } finally q.stop()
  }

  test("stateful stream: one grid's tiles split across two micro-batches == batch") {
    implicit val s = spark
    import spark.implicits._
    val inDir = Files.createTempDirectory("sstream-in")
    val ckpt = Files.createTempDirectory("sstream-ckpt").toString
    val results = new java.util.concurrent.ConcurrentLinkedQueue[ContourRow]()
    val tiles = GridSynth.tilesFromArray(spark, "gH", Goldens.multiHoleGrid, 10, 10, 5, 5)
    val docs = DocCodec.encode(tiles).collect().sortBy(_.doc_id).toSeq
    assert(docs.length == 4)
    def writeDocs(name: String, ds: Seq[graft.model.Doc]): Unit = {
      val staging = Files.createTempDirectory(s"stage-$name")
      spark.createDataset(ds).coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val file = Files.list(staging).iterator()
      var moved = false
      while (file.hasNext && !moved) {
        val p = file.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          Files.move(p, inDir.resolve(s"$name.parquet"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          moved = true
        }
      }
      assert(moved)
    }
    writeDocs("part1", docs.take(2))
    val q = StreamingContour.startStateful(spark, inDir.toString, ckpt,
      JobConfig(Seq(0.5), smooth = true)) { (cts, _) => cts.collect().foreach(results.add) }
    try {
      q.processAllAvailable()
      assert(results.isEmpty, "incomplete grid must not emit")
      writeDocs("part2", docs.drop(2))
      q.processAllAvailable()
      assert(results.size == 1)
      val got = results.peek()
      val want = new graft.engine.ContourEngine(spark, JobConfig(Seq(0.5), smooth = true))
        .contours(GridSynth.tilesFromArray(spark, "gH", Goldens.multiHoleGrid, 10, 10, 5, 5))
        .collect().head
      assert(got == want, "cross-batch output must be byte-identical to batch")
    } finally q.stop()
  }
}

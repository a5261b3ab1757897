package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("metadata extraction is typed and consistent with blob sizes") {
    import spark.implicits._
    val media = MultimodalOps.syntheticMedia(spark, 90)
    val metas = MultimodalOps.extractMeta(spark, media).collect()
    assert(metas.length == 90)
    assert(metas.map(_.kind).toSet == Set("image", "audio", "video"))
    metas.foreach { m =>
      m.kind match {
        case "image" => assert(m.nBytes == 16 + m.width * m.height * m.channels)
        case "audio" => assert(m.nBytes == 12 + m.frames * 2 && m.sampleRate == 8000)
        case "video" => assert(m.nBytes == 16 + m.frames.toLong * m.width * m.height)
      }
    }
  }

  test("resize produces requested dims; non-images untouched") {
    val media = MultimodalOps.syntheticMedia(spark, 45)
    val resized = MultimodalOps.resizeImages(spark, media, 4, 4)
    val metas = MultimodalOps.extractMeta(spark, resized).collect()
    metas.filter(_.kind == "image").foreach { m =>
      assert(m.width == 4 && m.height == 4 && m.nBytes == 16 + 4 * 4 * m.channels)
    }
    // audio/video blobs byte-identical to input
    val orig = MultimodalOps.extractMeta(spark, media).collect()
      .filter(m => m.kind != "image").map(m => m.mediaId -> m.nBytes).toMap
    metas.filter(_.kind != "image").foreach(m => assert(orig(m.mediaId) == m.nBytes))
  }

  test("frame sampling keeps ceil(frames/n) frames, deterministic") {
    val media = MultimodalOps.syntheticMedia(spark, 45)
    val before = MultimodalOps.extractMeta(spark, media).collect()
      .filter(_.kind == "video").map(m => m.mediaId -> m.frames).toMap
    val sampled = MultimodalOps.sampleFrames(spark, media, 3)
    MultimodalOps.extractMeta(spark, sampled).collect()
      .filter(_.kind == "video").foreach { m =>
        assert(m.frames == (before(m.mediaId) + 2) / 3, s"media ${m.mediaId}")
      }
    // repeatable: same output twice
    val a = MultimodalOps.mediaFeatures(spark, sampled).collect().sortBy(_.getLong(0)).toSeq
    val b = MultimodalOps.mediaFeatures(spark,
      MultimodalOps.sampleFrames(spark, media, 3)).collect().sortBy(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("audio resample halves rate and keeps every n-th sample") {
    val media = MultimodalOps.syntheticMedia(spark, 45)
    val before = MultimodalOps.extractMeta(spark, media).collect()
      .filter(_.kind == "audio").map(m => m.mediaId -> m).toMap
    val res = MultimodalOps.resamplePcm(spark, media, 2)
    MultimodalOps.extractMeta(spark, res).collect().filter(_.kind == "audio").foreach { m =>
      val b = before(m.mediaId)
      assert(m.sampleRate == b.sampleRate / 2)
      assert(m.frames == (b.frames + 1) / 2, s"media ${m.mediaId}")
    }
    // images/videos untouched
    val untouchedBefore = MultimodalOps.extractMeta(spark, media).collect()
      .filter(_.kind != "audio").map(m => m.mediaId -> m.nBytes).toMap
    MultimodalOps.extractMeta(spark, res).collect().filter(_.kind != "audio")
      .foreach(m => assert(untouchedBefore(m.mediaId) == m.nBytes))
  }

  test("features are integer-exact and deterministic") {
    val f = MultimodalOps.mediaFeatures(spark, MultimodalOps.syntheticMedia(spark, 30))
      .collect().sortBy(_.getLong(0))
    assert(f.length == 30)
    f.foreach(r => assert(r.getLong(3) >= 0))
  }

  test("mediaPhash == local aHash + band-LSH + popcount recompute") {
    import spark.implicits._
    val media = MultimodalOps.syntheticMedia(spark, 300)
    val blobs = media.as[(Long, Array[Byte])].collect()
      .filter(b => new String(b._2, 0, 4) == "IMG1").sortBy(_._1)
    val hashes = blobs.map { case (id, blob) =>
      val bb = java.nio.ByteBuffer.wrap(blob).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.position(4)
      val w = bb.getInt; val h = bb.getInt
      val g = (0 until 64).map { i =>
        val p = 16 + (((i / 8) * h / 8) * w + ((i % 8) * w / 8)) * 3
        ((blob(p) & 0xff) + (blob(p + 1) & 0xff) + (blob(p + 2) & 0xff)).toLong
      }
      val tot = g.sum
      id -> (0 until 64).foldLeft(0L)((acc, b) =>
        if (g(b) * 64L > tot) acc | (1L << b) else acc)
    }.toMap
    val ids = hashes.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      ha = hashes(ids(i)); hb = hashes(ids(j))
      if (0 until 8).exists(k => ((ha >>> (8 * k)) & 255) == ((hb >>> (8 * k)) & 255))
      d = java.lang.Long.bitCount(ha ^ hb).toLong
      if d <= MultimodalOps.PhashHamMax
    } yield (ids(i), ids(j), d)).toSet
    val got = MultimodalOps.mediaPhash(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.nonEmpty, "the deterministic corpus must yield near pairs")
  }
}

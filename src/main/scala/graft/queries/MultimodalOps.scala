package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}

/** Multimodal columns: image/audio/video travel as opaque BINARY columns
  * with typed metadata structs. The container ships no image/audio codecs,
  * so the byte-level "decode" is a deterministic fake container format
  * (documented below) — the Spark-side plumbing (schemas, per-partition
  * batch processing, column pruning over the binary payloads) is real and
  * is what these operators exercise:
  *
  *   IMG1 | w:int32 | h:int32 | c:int32 | pixels  (w*h*c bytes, row-major)
  *   AUD1 | rate:int32 | samples:int32 | pcm      (samples int16 LE)
  *   VID1 | w:int32 | h:int32 | frames:int32 | frame0 | frame1 | ...
  *
  * At production scale the fake parser is swapped for a real codec inside
  * the same mapPartitions batch loop; nothing else changes.
  */
object MultimodalOps {

  final case class MediaMeta(mediaId: Long, kind: String, width: Int, height: Int,
                             channels: Int, sampleRate: Int, frames: Int, nBytes: Long)

  private val LE = ByteOrder.LITTLE_ENDIAN

  // ---- deterministic fake blobs (md5-derived; no external data) ----
  // All "random" content derives from md5 so a SQL oracle can predict every
  // byte: dimensions come from the first 8 hex chars of md5("<id>:<tag>"),
  // payload byte p is byte (p % 16) of md5("<id>:<tag>:<p / 16>").

  private def md5Bytes(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))

  private def h32(s: String): Long =
    java.lang.Long.parseLong(
      md5Bytes(s).take(4).map("%02x".format(_)).mkString, 16)

  private def fillStream(id: Long, tag: String, out: Array[Byte]): Unit = {
    var block = 0
    var off = 0
    while (off < out.length) {
      val d = md5Bytes(s"$id:$tag:$block")
      val n = math.min(16, out.length - off)
      System.arraycopy(d, 0, out, off, n)
      off += n
      block += 1
    }
  }

  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, math.max(2, n / 64)).map { i =>
      val blob = (i % 3) match {
        case 0 => // image
          val w = 8 + (h32(s"$i:w") % 24).toInt
          val h = 8 + (h32(s"$i:h") % 24).toInt
          val c = 3
          val bb = ByteBuffer.allocate(16 + w * h * c).order(LE)
          bb.put("IMG1".getBytes); bb.putInt(w); bb.putInt(h); bb.putInt(c)
          val px = new Array[Byte](w * h * c); fillStream(i, "px", px); bb.put(px)
          bb.array()
        case 1 => // audio
          val rate = 8000
          val samples = 64 + (h32(s"$i:n") % 192).toInt
          val bb = ByteBuffer.allocate(12 + samples * 2).order(LE)
          bb.put("AUD1".getBytes); bb.putInt(rate); bb.putInt(samples)
          val pcm = new Array[Byte](samples * 2); fillStream(i, "pcm", pcm); bb.put(pcm)
          bb.array()
        case _ => // video
          val w = 8; val h = 8
          val frames = 4 + (h32(s"$i:f") % 12).toInt
          val bb = ByteBuffer.allocate(16 + frames * w * h).order(LE)
          bb.put("VID1".getBytes); bb.putInt(w); bb.putInt(h); bb.putInt(frames)
          val fr = new Array[Byte](frames * w * h); fillStream(i, "fr", fr); bb.put(fr)
          bb.array()
      }
      (i, blob)
    }.toDF("media_id", "blob")
  }

  private def parseMeta(id: Long, blob: Array[Byte]): MediaMeta = {
    val bb = ByteBuffer.wrap(blob).order(LE)
    val magic = new String(blob, 0, 4)
    bb.position(4)
    magic match {
      case "IMG1" => MediaMeta(id, "image", bb.getInt, bb.getInt, bb.getInt, 0, 1, blob.length)
      case "AUD1" => MediaMeta(id, "audio", 0, 0, 1, bb.getInt, bb.getInt, blob.length)
      case "VID1" => MediaMeta(id, "video", bb.getInt, bb.getInt, 1, 0, bb.getInt, blob.length)
      case _ => MediaMeta(id, "unknown", 0, 0, 0, 0, 0, blob.length)
    }
  }

  /** Typed metadata extraction: binary -> MediaMeta struct per row. */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("media_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) => parseMeta(id, blob) })
  }

  /** Nearest-neighbor image resize on the raw bytes (images only, others
    * pass through untouched) — the batch shape of a real decode+resize.
    */
  def resizeImages(spark: SparkSession, media: DataFrame, ow: Int, oh: Int): DataFrame = {
    import spark.implicits._
    media.select("media_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        if (blob.length >= 16 && new String(blob, 0, 4) == "IMG1") {
          val bb = ByteBuffer.wrap(blob).order(LE); bb.position(4)
          val w = bb.getInt; val h = bb.getInt; val c = bb.getInt
          val out = ByteBuffer.allocate(16 + ow * oh * c).order(LE)
          out.put("IMG1".getBytes); out.putInt(ow); out.putInt(oh); out.putInt(c)
          var y = 0
          while (y < oh) {
            val sy = y * h / oh
            var x = 0
            while (x < ow) {
              val sx = x * w / ow
              var ch = 0
              while (ch < c) {
                out.put(blob(16 + (sy * w + sx) * c + ch))
                ch += 1
              }
              x += 1
            }
            y += 1
          }
          (id, out.array())
        } else (id, blob)
      }).toDF("media_id", "blob")
  }

  /** Keep every n-th frame of video blobs (frame sampling). */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyN: Int): DataFrame = {
    import spark.implicits._
    media.select("media_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        if (blob.length >= 16 && new String(blob, 0, 4) == "VID1") {
          val bb = ByteBuffer.wrap(blob).order(LE); bb.position(4)
          val w = bb.getInt; val h = bb.getInt; val frames = bb.getInt
          val keep = (0 until frames by everyN).toArray
          val out = ByteBuffer.allocate(16 + keep.length * w * h).order(LE)
          out.put("VID1".getBytes); out.putInt(w); out.putInt(h); out.putInt(keep.length)
          keep.foreach(f => out.put(blob, 16 + f * w * h, w * h))
          (id, out.array())
        } else (id, blob)
      }).toDF("media_id", "blob")
  }

  /** Decimate audio PCM by keeping every n-th sample (sample rate divided
    * accordingly); non-audio blobs pass through untouched.
    */
  def resamplePcm(spark: SparkSession, media: DataFrame, everyN: Int): DataFrame = {
    import spark.implicits._
    media.select("media_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        if (blob.length >= 12 && new String(blob, 0, 4) == "AUD1") {
          val bb = ByteBuffer.wrap(blob).order(LE); bb.position(4)
          val rate = bb.getInt; val samples = bb.getInt
          val kept = (0 until samples by everyN).toArray
          val out = ByteBuffer.allocate(12 + kept.length * 2).order(LE)
          out.put("AUD1".getBytes); out.putInt(rate / everyN); out.putInt(kept.length)
          kept.foreach(k => out.putShort(
            ByteBuffer.wrap(blob, 12 + k * 2, 2).order(LE).getShort))
          (id, out.array())
        } else (id, blob)
      }).toDF("media_id", "blob")
  }

  /** Feature extraction: per-media integer-exact summary (channel byte sums
    * for images, absolute PCM sum for audio, per-frame byte sum count for
    * video) — the shape of an embedding/feature stage with deterministic
    * outputs.
    */
  def mediaFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val meta = parseMeta(id, blob)
        val payloadOff = meta.kind match {
          case "image" | "video" => 16
          case "audio" => 12
          case _ => 0
        }
        var sum = 0L
        var i = payloadOff
        while (i < blob.length) { sum += blob(i) & 0xff; i += 1 }
        (id, meta.kind, blob.length.toLong, sum)
      }).toDF("media_id", "kind", "n_bytes", "byte_sum")
  }

  /** Hamming cutoff for [[mediaPhash]] pairs, shared with the oracle. */
  val PhashHamMax = 26L

  /** Perceptual near-duplicate pairs over the IMAGE media by average-hash:
    * each image resizes to 8x8 with the pipeline's nearest-neighbor rule,
    * per-pixel gray = the 3 channel bytes summed (0..765), and aHash bit b
    * is `gray_b * 64 > total` — the mean comparison cross-multiplied so
    * the whole hash is integer-exact. Candidate pairs come from 8-bit
    * BAND LSH (8 equality-joined bands — two hashes within Hamming 7 of
    * each other ALWAYS share a band by pigeonhole, so recall is exact at
    * small radii and the reported cutoff filters candidates by true
    * popcount distance). Shape at scale: per-media hashing is one narrow
    * pass over blobs; the only shuffle is the (band, key)-keyed equi-join
    * whose fan-out is band-bucket bounded (salting applies under
    * adversarial skew); distinct dedups multi-band matches before the
    * bit_count filter. Emits (media_a, media_b, hamming).
    */
  def mediaPhash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val hashes = media.select("media_id", "blob").as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        if (blob.length < 16 || new String(blob, 0, 4) != "IMG1") None
        else {
          val bb = ByteBuffer.wrap(blob).order(LE)
          bb.position(4)
          val w = bb.getInt; val h = bb.getInt; bb.getInt // channels = 3
          val g = new Array[Long](64)
          var tot = 0L
          var i = 0
          while (i < 64) {
            val p = 16 + (((i / 8) * h / 8) * w + ((i % 8) * w / 8)) * 3
            val gv = ((blob(p) & 0xff) + (blob(p + 1) & 0xff) + (blob(p + 2) & 0xff)).toLong
            g(i) = gv; tot += gv; i += 1
          }
          var hsh = 0L
          i = 0
          while (i < 64) { if (g(i) * 64L > tot) hsh |= 1L << i; i += 1 }
          Some((id, hsh))
        }
      }.toDF("media_id", "ahash")
    val bands = hashes
      .select(col("media_id"), col("ahash"), explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("bkey", expr("shiftrightunsigned(ahash, band * 8) & 255"))
    val a = bands.select(col("media_id").as("media_a"), col("ahash").as("ha"),
      col("band"), col("bkey"))
    val b = bands.select(col("media_id").as("media_b"), col("ahash").as("hb"),
      col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("media_a") < col("media_b"))
      .select("media_a", "media_b", "ha", "hb").distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= PhashHamMax)
      .select("media_a", "media_b", "hamming")
      .orderBy("media_a", "media_b")
  }
}

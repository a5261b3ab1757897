package graft.docs

import graft.model.{Doc, Span, TileRow}
import org.apache.spark.sql.{Dataset, SparkSession}

import java.nio.{ByteBuffer, ByteOrder}
import java.util.Base64

/** Codec between the interleaved text+media document table
  * (doc_id, spans: array<struct<kind,text,media_ref,offset>>) and decoded
  * raster tiles. One document per tile; each doc interleaves a text metadata
  * span with exactly one media span whose media_ref embeds the tile raster:
  *
  *   raster://{gridId}/{tileY}/{tileX}?gdx&gdy&sx0&sy0&tw&th&vw&vh&d=<base64 f64 LE>
  *
  * The codec never reorders or mutates existing spans; engine outputs are
  * appended as NEW text spans with fresh offsets (span-sequence invariant).
  */
object DocCodec {

  def encodeValues(values: Array[Double]): String = {
    val bb = ByteBuffer.allocate(values.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asDoubleBuffer().put(values)
    Base64.getEncoder.encodeToString(bb.array())
  }

  def decodeValues(b64: String): Array[Double] = {
    val bytes = Base64.getDecoder.decode(b64)
    val out = new Array[Double](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().get(out)
    out
  }

  def mediaRef(t: TileRow): String =
    s"raster://${t.gridId}/${t.tileY}/${t.tileX}?gdx=${t.gdx}&gdy=${t.gdy}" +
      s"&sx0=${t.sx0}&sy0=${t.sy0}&tw=${t.tw}&th=${t.th}&vw=${t.vw}&vh=${t.vh}" +
      s"&d=${encodeValues(t.values)}"

  def tileToDoc(t: TileRow): Doc = {
    val meta = s"""{"grid":"${t.gridId}","tile":[${t.tileX},${t.tileY}],""" +
      s""""w":${t.tw},"h":${t.th},"gdx":${t.gdx},"gdy":${t.gdy}}"""
    Doc(s"g${t.gridId}-t${t.tileY}_${t.tileX}",
      Seq(Span("text", meta, "", 0), Span("media", "", mediaRef(t), 1)))
  }

  def docToTiles(d: Doc): Iterator[TileRow] =
    d.spans.iterator.filter(s => s.kind == "media" && s.media_ref.startsWith("raster://"))
      .map(s => parseMediaRef(s.media_ref))

  def parseMediaRef(ref: String): TileRow = {
    val body = ref.stripPrefix("raster://")
    val qIx = body.indexOf('?')
    val path = body.substring(0, qIx).split('/')
    val q = body.substring(qIx + 1).split('&').map { kv =>
      val i = kv.indexOf('=')
      kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap
    TileRow(path(0), path(2).toInt, path(1).toInt,
      q("sx0").toInt, q("sy0").toInt, q("tw").toInt, q("th").toInt,
      q("vw").toInt, q("vh").toInt, q("gdx").toInt, q("gdy").toInt,
      decodeValues(q("d")))
  }

  def encode(tiles: Dataset[TileRow])(implicit spark: SparkSession): Dataset[Doc] = {
    import spark.implicits._
    tiles.map(tileToDoc)
  }

  // ---- external (blob-store) payloads ------------------------------------
  // At scale the raster bytes do NOT travel inside media_ref: the span
  // carries a short reference ("...&blob=<key>") and the payload lives in a
  // sidecar table (blob_ref, payload BINARY). Parquet then stores the
  // raster as a real binary column: ~25% fewer bytes than base64, no
  // UTF8String inflation in the scan, and the multi-MB per-task working
  // sets that thrashed shared cache at 16 threads disappear.

  def blobKey(t: TileRow): String = s"${t.gridId}/${t.tileY}/${t.tileX}"

  def valuesToBytes(values: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(values.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asDoubleBuffer().put(values)
    bb.array()
  }

  def bytesToValues(payload: Array[Byte]): Array[Double] = {
    val out = new Array[Double](payload.length / 8)
    ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().get(out)
    out
  }

  def mediaRefExternal(t: TileRow): String =
    s"raster://${t.gridId}/${t.tileY}/${t.tileX}?gdx=${t.gdx}&gdy=${t.gdy}" +
      s"&sx0=${t.sx0}&sy0=${t.sy0}&tw=${t.tw}&th=${t.th}&vw=${t.vw}&vh=${t.vh}" +
      s"&blob=${blobKey(t)}"

  def tileToDocExternal(t: TileRow): Doc = {
    val meta = s"""{"grid":"${t.gridId}","tile":[${t.tileX},${t.tileY}],""" +
      s""""w":${t.tw},"h":${t.th},"gdx":${t.gdx},"gdy":${t.gdy}}"""
    Doc(s"g${t.gridId}-t${t.tileY}_${t.tileX}",
      Seq(Span("text", meta, "", 0), Span("media", "", mediaRefExternal(t), 1)))
  }

  /** Doc table (exact contract schema, short media_refs) + blob sidecar. */
  def encodeExternal(tiles: Dataset[TileRow])
                    (implicit spark: SparkSession): (Dataset[Doc], org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val docs = tiles.map(tileToDocExternal)
    val blobs = tiles.map(t => (blobKey(t), valuesToBytes(t.values))).toDF("blob_ref", "payload")
    (docs, blobs)
  }

  /** Header-only parse of an external media_ref (no payload in the string). */
  def parseMediaRefHeader(ref: String, payload: Array[Byte]): TileRow = {
    val body = ref.stripPrefix("raster://")
    val qIx = body.indexOf('?')
    val path = body.substring(0, qIx).split('/')
    val q = body.substring(qIx + 1).split('&').map { kv =>
      val i = kv.indexOf('=')
      kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap
    TileRow(path(0), path(2).toInt, path(1).toInt,
      q("sx0").toInt, q("sy0").toInt, q("tw").toInt, q("th").toInt,
      q("vw").toInt, q("vh").toInt, q("gdx").toInt, q("gdy").toInt,
      bytesToValues(payload))
  }

  /** Decode against a blob sidecar: the parsed media spans are the SMALL
    * side (a few hundred bytes per doc) and are broadcast, so the payload
    * table streams through a narrow BroadcastHashJoin — no shuffle ever
    * carries raster bytes. At 10^12 docs (where the span set outgrows a
    * broadcast) the same operator runs as a bucketed sort-merge join with
    * both tables bucketed by blob_ref; the plan shape below is the
    * broadcast fast path.
    */
  def decodeExternal(docs: Dataset[Doc], blobs: org.apache.spark.sql.DataFrame)
                    (implicit spark: SparkSession): Dataset[TileRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val refs = docs.toDF()
      .select(explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media" && substring(col("s.media_ref"), 1, 9) === "raster://")
      .select(regexp_extract(col("s.media_ref"), "blob=([^&]+)", 1).as("blob_ref"),
        col("s.media_ref").as("ref"))
    blobs.join(broadcast(refs), Seq("blob_ref"))
      .select(col("ref"), col("payload"))
      .as[(String, Array[Byte])]
      .map { case (ref, payload) => parseMediaRefHeader(ref, payload) }
  }

  /** Columnar decode: explode spans, slice the (small) metadata prefix and
    * the base64 payload with byte-level substring ops, unbase64 natively,
    * and only then build the typed TileRow. Avoids inflating the ~1MB
    * media_ref into UTF-16 Strings in the hot path (the payload travels as
    * UTF8String bytes -> binary end to end).
    */
  def decode(docs: Dataset[Doc])(implicit spark: SparkSession): Dataset[TileRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ref = col("s.media_ref")
    docs.toDF()
      .select(explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media" && substring(ref, 1, 9) === "raster://")
      .select(
        substring(ref, lit(1), instr(ref, "&d=") - 1).as("meta"),
        unbase64(expr("substring(s.media_ref, instr(s.media_ref, '&d=') + 3)")).as("payload"))
      .select(
        regexp_extract(col("meta"), "^raster://([^/]+)/(\\d+)/(\\d+)\\?", 1).as("gridId"),
        regexp_extract(col("meta"), "^raster://[^/]+/(\\d+)/", 1).cast("int").as("tileY"),
        regexp_extract(col("meta"), "^raster://[^/]+/\\d+/(\\d+)\\?", 1).cast("int").as("tileX"),
        regexp_extract(col("meta"), "sx0=(-?\\d+)", 1).cast("int").as("sx0"),
        regexp_extract(col("meta"), "sy0=(-?\\d+)", 1).cast("int").as("sy0"),
        regexp_extract(col("meta"), "tw=(\\d+)", 1).cast("int").as("tw"),
        regexp_extract(col("meta"), "th=(\\d+)", 1).cast("int").as("th"),
        regexp_extract(col("meta"), "vw=(\\d+)", 1).cast("int").as("vw"),
        regexp_extract(col("meta"), "vh=(\\d+)", 1).cast("int").as("vh"),
        regexp_extract(col("meta"), "gdx=(\\d+)", 1).cast("int").as("gdx"),
        regexp_extract(col("meta"), "gdy=(\\d+)", 1).cast("int").as("gdy"),
        col("payload"))
      .as[(String, Int, Int, Int, Int, Int, Int, Int, Int, Int, Int, Array[Byte])]
      .map { case (gridId, tileY, tileX, sx0, sy0, tw, th, vw, vh, gdx, gdy, payload) =>
        val values = new Array[Double](payload.length / 8)
        java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          .asDoubleBuffer().get(values)
        TileRow(gridId, tileX, tileY, sx0, sy0, tw, th, vw, vh, gdx, gdy, values)
      }
  }

  /** Append GeoJSON features as new text spans on every doc of the grid,
    * after the existing spans, in the given deterministic order. Existing
    * spans are untouched (the per-row span-sequence invariant).
    */
  def appendFeatures(docs: Dataset[Doc], features: Dataset[(String, Seq[String])])
                    (implicit spark: SparkSession): Dataset[Doc] = {
    import spark.implicits._
    val byGrid = features.withColumnRenamed("_1", "gridId").withColumnRenamed("_2", "feats")
    docs.toDF().withColumn("gridId",
        org.apache.spark.sql.functions.regexp_extract(
          org.apache.spark.sql.functions.col("doc_id"), "^g(.*)-t\\d+_\\d+$", 1))
      .join(byGrid, Seq("gridId"), "left")
      .as[(String, String, Seq[Span], Option[Seq[String]])]
      .map { case (_, docId, spans, feats) =>
        val base = spans.map(_.offset).foldLeft(-1)(math.max) + 1
        val extra = feats.getOrElse(Nil).zipWithIndex.map { case (f, i) =>
          Span("text", f, "", base + i)
        }
        Doc(docId, spans ++ extra)
      }
  }

  /** Span-sequence invariant: every original doc's span sequence must be an
    * exact prefix (kind, text, media_ref, offset order) of the output doc's.
    * Returns violations (empty == invariant holds).
    */
  def spanInvariantViolations(before: Dataset[Doc], after: Dataset[Doc])
                             (implicit spark: SparkSession): Dataset[String] = {
    import spark.implicits._
    before.joinWith(after, before("doc_id") === after("doc_id"), "full_outer")
      .flatMap { case (b, a) =>
        if (b == null) Some(s"unexpected doc ${a.doc_id}")
        else if (a == null) Some(s"missing doc ${b.doc_id}")
        else {
          val bs = b.spans
          val as = a.spans.take(bs.length)
          if (bs != as) Some(s"span prefix mutated for ${b.doc_id}")
          else if (a.spans.map(_.offset) != a.spans.map(_.offset).sorted)
            Some(s"span offsets not increasing for ${a.doc_id}")
          else None
        }
      }
  }
}

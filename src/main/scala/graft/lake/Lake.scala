package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets

/** Minimal Iceberg-style snapshot layer over parquet directories (the
  * environment ships no Iceberg jar, so snapshot semantics are built
  * in-repo):
  *
  *   table/
  *     data/<snapshotId>/...parquet
  *     snapshots/<seq>%012d-<snapshotId>.json   (manifest)
  *
  * A manifest records the operation, parent snapshot (lineage chain), row
  * count and per-partition row metrics. Readers resolve the latest manifest
  * (or a pinned snapshot id).
  *
  * All filesystem access goes through the Hadoop FileSystem API, so tables
  * live on whatever store the path's scheme resolves to — local posix,
  * HDFS, or an object store — matching the parquet data files, which Spark
  * already writes through the same API. The manifest commit is RENAME-FREE
  * (object stores have no atomic rename): the manifest is created at its
  * final name with overwrite=false (a second committer of the same
  * sequence fails loudly instead of clobbering), written, closed, then
  * read back and VERIFIED byte-for-byte; readers additionally require the
  * `"eof":true` trailer, so a torn or in-flight manifest is never
  * observed as a snapshot — it is simply skipped until complete.
  */
object Lake {

  final case class Snapshot(seq: Long, id: String, parent: String, op: String,
                            path: String, rows: Long,
                            partitionRows: Seq[Long], ts: Long)

  private def conf(spark: SparkSession) = spark.sessionState.newHadoopConf()
  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(conf(spark))

  private def snapshotsDir(table: String): Path = new Path(table, "snapshots")
  private def dataDir(table: String, id: String): Path =
    new Path(new Path(table, "data"), id)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def readFully(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Commit a DataFrame as a new snapshot; returns the manifest. */
  def commit(spark: SparkSession, table: String, df: DataFrame, op: String): Snapshot = {
    val parent = latest(spark, table).map(_.id).getOrElse("")
    val seq = latest(spark, table).map(_.seq + 1).getOrElse(0L)
    val id = java.util.UUID.randomUUID().toString.take(12)
    val dd = dataDir(table, id)
    df.write.mode("overwrite").parquet(dd.toString)
    // per-partition metrics from the committed parquet FOOTERS — metadata
    // reads only, no second scan of the snapshot's data
    val hc = conf(spark)
    val fs = dd.getFileSystem(hc)
    val parts = fs.listStatus(dd).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .toSeq.sortBy(_.getPath.getName)
      .map { st =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, hc))
        try r.getRecordCount finally r.close()
      }
    val rows = parts.sum
    val snap = Snapshot(seq, id, parent, op, dd.toString, rows, parts,
      System.currentTimeMillis())
    val json =
      s"""{"seq":$seq,"id":"${esc(id)}","parent":"${esc(parent)}","op":"${esc(op)}",""" +
        s""""path":"${esc(snap.path)}","rows":$rows,""" +
        s""""partitionRows":[${parts.mkString(",")}],"ts":${snap.ts},"eof":true}"""
    val sd = snapshotsDir(table)
    val sfs = fsOf(spark, sd)
    sfs.mkdirs(sd)
    val manifest = new Path(sd, f"$seq%012d-$id.json")
    // rename-free commit: create-no-overwrite at the FINAL name, then
    // verify the readback — see class doc
    val out = sfs.create(manifest, false)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val back = readFully(sfs, manifest)
    require(back == json, s"manifest readback mismatch for $manifest")
    snap
  }

  def snapshots(spark: SparkSession, table: String): Seq[Snapshot] = {
    val dir = snapshotsDir(table)
    val fs = fsOf(spark, dir)
    val listed =
      try fs.listStatus(dir)
      catch { case _: java.io.FileNotFoundException => return Nil }
    listed.iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".json"))
      .map(st => readFully(fs, st.getPath))
      // a torn or in-flight manifest lacks the eof trailer -> not a snapshot
      .filter(_.endsWith("\"eof\":true}"))
      .map(parse)
      .toSeq.sortBy(_.seq)
  }

  private def parse(json: String): Snapshot = {
    def str(k: String): String =
      s""""$k":"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    def num(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L)
    val parts = """"partitionRows":\[([^\]]*)\]""".r.findFirstMatchIn(json)
      .map(_.group(1)).filter(_.nonEmpty)
      .map(_.split(",").map(_.trim.toLong).toSeq).getOrElse(Nil)
    Snapshot(num("seq"), str("id"), str("parent"), str("op"), str("path"),
      num("rows"), parts, num("ts"))
  }

  def latest(spark: SparkSession, table: String): Option[Snapshot] =
    snapshots(spark, table).lastOption

  /** Latest snapshot whose op matches, if any (resume lookup). */
  def latestFor(spark: SparkSession, table: String, op: String): Option[Snapshot] =
    snapshots(spark, table).filter(_.op == op).lastOption

  def read(spark: SparkSession, snap: Snapshot): DataFrame =
    spark.read.parquet(snap.path)

  /** Lineage chain of a snapshot, oldest first. */
  def lineage(spark: SparkSession, table: String, id: String): Seq[Snapshot] = {
    val byId = snapshots(spark, table).map(s => s.id -> s).toMap
    Iterator.iterate(byId.get(id))(cur => cur.flatMap(s => byId.get(s.parent)))
      .takeWhile(_.isDefined).map(_.get).toSeq.reverse
  }
}

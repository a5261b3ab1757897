package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Minimal Iceberg-style snapshot layer over parquet directories (the
  * environment ships no Iceberg jar, so snapshot semantics are built
  * in-repo):
  *
  *   table/
  *     data/<snapshotId>/...parquet
  *     snapshots/<seq>%012d-<snapshotId>.json   (manifest, atomic rename)
  *
  * A manifest records the operation, parent snapshot (lineage chain), row
  * count and per-partition row metrics. Readers resolve the latest manifest
  * (or a pinned snapshot id); a torn write can never be observed because the
  * manifest is moved into place atomically after the data commit.
  */
object Lake {

  final case class Snapshot(seq: Long, id: String, parent: String, op: String,
                            path: String, rows: Long,
                            partitionRows: Seq[Long], ts: Long)

  private def snapshotsDir(table: String): Path = Paths.get(table, "snapshots")
  private def dataDir(table: String, id: String): Path = Paths.get(table, "data", id)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Commit a DataFrame as a new snapshot; returns the manifest. */
  def commit(spark: SparkSession, table: String, df: DataFrame, op: String): Snapshot = {
    import org.apache.spark.sql.functions._
    val parent = latest(spark, table).map(_.id).getOrElse("")
    val seq = latest(spark, table).map(_.seq + 1).getOrElse(0L)
    val id = java.util.UUID.randomUUID().toString.take(12)
    val dd = dataDir(table, id)
    df.write.mode("overwrite").parquet(dd.toString)
    // per-partition metrics from the committed parquet FOOTERS — metadata
    // reads only, no second scan of the snapshot's data
    val conf = spark.sessionState.newHadoopConf()
    val parts = Files.list(dd).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)
      .map { p =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p.toString), conf))
        try r.getRecordCount finally r.close()
      }
    val rows = parts.sum
    val snap = Snapshot(seq, id, parent, op, dd.toString, rows, parts,
      System.currentTimeMillis())
    val json =
      s"""{"seq":$seq,"id":"${esc(id)}","parent":"${esc(parent)}","op":"${esc(op)}",""" +
        s""""path":"${esc(snap.path)}","rows":$rows,""" +
        s""""partitionRows":[${parts.mkString(",")}],"ts":${snap.ts}}"""
    Files.createDirectories(snapshotsDir(table))
    val tmp = snapshotsDir(table).resolve(f".tmp-$seq%012d-$id")
    Files.writeString(tmp, json)
    Files.move(tmp, snapshotsDir(table).resolve(f"$seq%012d-$id.json"),
      StandardCopyOption.ATOMIC_MOVE)
    snap
  }

  def snapshots(spark: SparkSession, table: String): Seq[Snapshot] = {
    val dir = snapshotsDir(table)
    if (!Files.isDirectory(dir)) return Nil
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".json"))
      .map(p => parse(Files.readString(p)))
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

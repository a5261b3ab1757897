package graft.engine

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Hive-style partitioned layout — the directory-pruning half of the
  * storage-layout story (RangeLayoutSpec is the in-file ordering half): a
  * write partitioned by a low-cardinality key must let a key-filtered read
  * scan ONLY that key's directory. The contract is asserted on the scan
  * node itself: the predicate lands in PartitionFilters (not PushedFilters
  * — it prunes directories before any file is opened) and the scan's
  * selected partition count is exactly 1 of 5.
  */
class PartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("partitioned write + key filter: directory pruning on the scan node, counts intact") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-hivepart").toString
    val src = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    src.write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val scan = pruned.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.nonEmpty, "expected a file scan")
    val pf = scan.head.partitionFilters.mkString(";")
    assert(pf.contains("event_type"),
      s"the key predicate must land in PartitionFilters, got: $pf")
    // selected partitions: exactly the one matching directory (of 5 types)
    val selected = scan.head.selectedPartitions.partitionCount
    assert(selected == 1, s"must scan exactly 1 of 5 type directories, scanned $selected")

    val want = src.filter(col("event_type") === "purchase").count()
    assert(pruned.count() == want, "pruning must not change the row set")
    assert(want > 0L)
  }
}

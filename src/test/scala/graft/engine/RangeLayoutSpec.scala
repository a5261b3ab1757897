package graft.engine

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Ordered OUTPUT LAYOUT at scale: repartitionByRange + sortWithinPartitions
  * writes a globally-ordered dataset with NO single-task global sort — the
  * range exchange samples split points and every partition sorts locally,
  * so the layout cost is fully parallel. The contract: per-file key ranges
  * are totally ordered and pairwise disjoint across files (so a reader can
  * binary-search files by min/max footer stats — the parquet row-group
  * pruning a 100 TB time-ordered table depends on), the plan shows a
  * RANGE partitioning and no global Sort above the exchange, and the row
  * multiset is unchanged.
  */
class RangeLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("range-partitioned write: disjoint ordered per-file key ranges, no global sort, multiset preserved") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-range").toString
    val src = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val laid = src.repartitionByRange(6, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey", "l_linenumber")

    val sp = laid.queryExecution.sparkPlan
    val partitionings = sp.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning
    }
    assert(partitionings.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]),
      s"the exchange must be a RANGE partitioning:\n$sp")
    val sortGlobals = sp.collect {
      case s: org.apache.spark.sql.execution.SortExec => s.global
    }
    assert(sortGlobals.nonEmpty && sortGlobals.forall(_ == false),
      s"every sort on the layout path must be partition-local, never global:\n$sp")

    laid.write.mode("overwrite").parquet(dir)

    // per-file ranges: totally ordered and pairwise disjoint
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length > 1, "the layout must actually produce multiple files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_orderkey"), max("l_orderkey")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file ranges overlap: hi=$hi lo2=$lo2")
      case _ =>
    }

    // multiset preserved (order-free checksum)
    def sums(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = df.selectExpr("count(*)", "sum(l_orderkey)", "sum(floor(l_quantity * 100))").head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(sums(spark.read.parquet(dir)) == sums(src))
  }
}

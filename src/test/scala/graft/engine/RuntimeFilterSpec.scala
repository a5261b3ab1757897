package graft.engine

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter semi-join reduction — the shuffle-volume member
  * of the pruning family (PartitionPruneSpec prunes directories, the
  * lake zone maps prune files; this prunes ROWS before the exchange): a
  * selective dimension predicate makes Catalyst inject a bloom-filter
  * subquery (`might_contain`) onto the fact side of a shuffle join, so
  * fact rows that cannot find a partner are dropped at the scan, before
  * paying the shuffle. Thresholds are lowered to trigger at test scale;
  * at warehouse scale the defaults (10 GB application-side scan) fire on
  * exactly the 100 TB fact scans the rule exists for. The bloom filter
  * is probabilistic with NO false negatives, so results must be
  * IDENTICAL with the rule on and off.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a selective dim predicate injects might_contain on the fact side; rows unchanged") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("rtf").toString
    spark.range(0, 200000).select((col("id") % 10000L).as("k"), col("id").as("payload"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(0, 10000).select(col("id").as("k"), (col("id") % 100L).as("grp"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    def q() = {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").where(col("grp") === 7L)
      fact.join(dim, "k")
        .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
    }
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val on = q()
      val planOn = on.queryExecution.optimizedPlan.toString
      assert(planOn.contains("might_contain"),
        s"no runtime bloom filter injected into:\n$planOn")
      val rowsOn = on.collect().toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val off = q()
      assert(!off.queryExecution.optimizedPlan.toString.contains("might_contain"),
        "disabled rule must leave no bloom filter behind")
      assert(rowsOn == off.collect().toSeq && rowsOn.nonEmpty,
        "bloom reduction must not change the join result")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

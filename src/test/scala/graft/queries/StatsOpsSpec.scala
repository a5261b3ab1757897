package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** autoThresholds must select EXACT order statistics — equal to a local
  * full sort of the value column — without any global sort in the plan
  * (two-pass bucketed selection).
  */
class StatsOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("autoThresholds == k-th order statistics of a local full sort") {
    import spark.implicits._
    val values = spark.read.parquet(s"$sf/events.parquet")
      .select("value").as[Double].collect().sorted
    val n = values.length
    val expected = StatsOps.Qs.map { q =>
      val k = math.floor(q * (n - 1).toDouble).toLong + 1L
      (q, k, values((k - 1).toInt))
    }
    val got = StatsOps.autoThresholds(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
    // order statistics are monotone in q, and each is an actual data value
    assert(got.map(_._3) == got.map(_._3).sorted)
    val vset = values.toSet
    assert(got.forall(r => vset.contains(r._3)))
  }

  test("autoThresholds plan has no global sort before the selection joins") {
    // the only Sort allowed is the final presentation orderBy over 4 rows;
    // assert no Exchange feeds a global Sort of the full events scan by
    // checking the ranked side sorts WITHIN bucket partitions only
    // (window spec partitioned by bkt), i.e. the physical plan contains a
    // Window over partitioning on bkt rather than a global Sort of value
    val plan = StatsOps.autoThresholds(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(500))
    assert(plan.contains("partitionBy") || plan.contains("bkt"), plan.take(500))
  }
}

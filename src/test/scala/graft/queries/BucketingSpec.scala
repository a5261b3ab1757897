package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Bucketed co-location contract: two tables written bucketed by the join
  * key join with ZERO exchange (per-bucket sort-merge), and the co-located
  * join's results equal the plain shuffled join's.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("same-bucketed join plans a SortMergeJoin with no exchange; results equal the shuffled join") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-bucketed").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey AS o_orderkey", "l_quantity", "l_extendedprice")
    Bucketing.writeBucketed(orders, "bkt_orders", s"$dir/orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "bkt_lineitem", s"$dir/lineitem", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "bkt_orders", "bkt_lineitem", "o_orderkey")
      def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.selectExpr("count(*)", "sum(floor(l_quantity * 100))").head
        (r.getLong(0), r.getLong(1))
      }
      val gotSum = checksum(joined)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-located join must not exchange either side:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scans must report bucketed reads:\n$plan")

      val plain = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
      val wantSum = {
        val r = plain.selectExpr("count(*)", "sum(floor(l_quantity * 100))").head
        (r.getLong(0), r.getLong(1))
      }
      assert(gotSum == wantSum, "co-located join checksum must equal the shuffled join's")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed CO-LOCATION — the warehouse-scale join strategy for repeated
  * big-big joins: both tables are written bucketed (and sorted) by the
  * join key into the same bucket count, so every subsequent join on that
  * key is a per-bucket sort-merge with ZERO exchange on either side — the
  * shuffle is paid once at write time and amortized across every later
  * join, exactly the layout a 100 TB fact/fact pipeline wants. Tables are
  * EXTERNAL (caller-owned path); only bucketing metadata lives in the
  * session catalog.
  *
  * The contract (spec-proven in BucketingSpec): joining two tables written
  * by [[writeBucketed]] with the same (key, buckets) produces a plan with
  * a SortMergeJoin and NO ShuffleExchange, and results identical to the
  * plain shuffled join.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted parquet table. Overwrites
    * both the catalog entry and the path.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** The co-located equi-join of two same-bucketed tables on `key`. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}

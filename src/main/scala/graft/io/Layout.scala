package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout tools for the 100 TB path: bucketing (pre-shuffled,
  * co-located joins — a fact⋈fact join on the bucket key needs NO exchange
  * at query time) and date-partitioned layout (partition pruning: a day
  * filter touches only that day's files).
  *
  * The reference has no physical layout at all (BigQuery hides it); these
  * are the Spark-native equivalents of its staging/feature tables laid out
  * for scale.
  */
object Layout {

  /** Write `df` bucketed+sorted by `key` into the session catalog. Joins
    * between two tables bucketed the same way on the same key skip both
    * shuffle AND sort in sort-merge join.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Write `df` partitioned by `partitionCol` (directory-per-value layout;
    * predicate on the column prunes at file listing time).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** True if the executed plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Scan width in input splits — partition pruning shows up directly as
    * fewer splits (files) feeding the scan RDD.
    */
  def scanSplits(df: DataFrame): Int = df.rdd.getNumPartitions
}

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

  /** Compact a frame to files of roughly `targetBytes` each before
    * writing — the small-files antidote. A 100 TB table accreted from
    * streaming micro-batches or daily appends degenerates into millions
    * of KB-scale files (listing cost, task-per-file scheduling, parquet
    * footer overhead); periodic compaction rewrites it at a sane file
    * size. Partition count comes from Catalyst's size estimate of the
    * input plan, so the caller doesn't need to know the data volume —
    * and crucially WITHOUT executing anything: reading `df.rdd` under AQE
    * finalizes the adaptive plan by running every shuffle stage, so a
    * partition-count peek would execute the query once inside compact and
    * again at the caller's write.
    *
    * Default is `coalesce` (no shuffle; a target above the current
    * partition count is a no-op — the safe reading of "cap the file
    * count"). Pass `allowShuffle = true` to force an exact round-robin
    * repartition when under-partitioned input must be SPLIT to reach the
    * target file size.
    */
  def compact(df: DataFrame, targetBytes: Long = 128L << 20,
      allowShuffle: Boolean = false): DataFrame = {
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // clamp BEFORE the Int narrowing: Catalyst's estimate can be
    // Long.MaxValue (unknown stats) and the quotient would wrap to 0 or
    // negative; 1M partitions is already past any sane job size
    val parts = (BigInt(1).max(
      estBytes / targetBytes + (if (estBytes % targetBytes > 0) 1 else 0))
      .min(BigInt(1000000))).toInt
    if (allowShuffle) df.repartition(parts) else df.coalesce(parts)
  }

  /** Z-order (Morton) interleaved clustering on two columns — the layout
    * that makes parquet min/max row-group pruning effective for filters
    * on EITHER column: a range-sort by one key clusters that key
    * perfectly and leaves the other scattered across every file; the
    * z-curve gives both keys ~sqrt-of-file-count locality, so a
    * selective predicate on either skips most files/row groups at scan
    * time. At 100 TB this is the difference between a point lookup
    * reading one file and reading the whole table — and it composes with
    * `compact` (cluster, then size files).
    *
    * Values min-max-normalize into `bits`-bit grid cells (one tiny
    * aggregate, broadcast back — zero extra scans of the data beyond the
    * write's own); the z-value is a pure bit-interleave column expression
    * (shift/and/or tree, whole-stage codegen), range-partitioned and
    * sorted within partitions so file k holds a contiguous z-range.
    * Min-max cells inherit value skew — for pathological distributions
    * substitute rank-based cell ids (percent_rank per column) at the
    * cost of two window passes.
    */
  def zOrdered(df: DataFrame, c1: String, c2: String, files: Int,
      bits: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions._
    require(df.columns.contains(c1) && df.columns.contains(c2),
      s"zOrdered: $c1/$c2 must be columns of the frame")
    require(bits >= 1 && bits <= 31, "zOrdered: bits must be in [1, 31]")
    val bounds = df.agg(
      min(col(c1)).cast("double").as("__mn1"), max(col(c1)).cast("double").as("__mx1"),
      min(col(c2)).cast("double").as("__mn2"), max(col(c2)).cast("double").as("__mx2"))
    val cells = (1L << bits) - 1L
    def cell(c: String, mn: String, mx: String) =
      when(col(mx) <= col(mn), lit(0L)).otherwise(
        ((col(c).cast("double") - col(mn)) / (col(mx) - col(mn)) * cells)
          .cast("long"))
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(col("__zx"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(col("__zy"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
    df.crossJoin(broadcast(bounds))
      .withColumn("__zx", cell(c1, "__mn1", "__mx1"))
      .withColumn("__zy", cell(c2, "__mn2", "__mx2"))
      .withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__zx", "__zy", "__z", "__mn1", "__mx1", "__mn2", "__mx2")
  }

  /** True if the executed plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Scan width in input splits — partition pruning shows up directly as
    * fewer splits (files) feeding the scan RDD.
    */
  def scanSplits(df: DataFrame): Int = df.rdd.getNumPartitions
}

package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayoutSpec extends SparkSpec {

  test("bucketed join on the bucket key runs without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Sources.table(spark, dir, "orders")
      val customer = Sources.table(spark, dir, "customer")
      Layout.writeBucketed(orders, "orders_b", "o_custkey", 8)
      Layout.writeBucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey", 8)

      val plain = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      assert(Layout.hasShuffle(plain), "unbucketed shuffle-join expected as control")

      val bucketed = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
      bucketed.write.format("noop").mode("overwrite").save()
      assert(!Layout.hasShuffle(bucketed),
        "bucketed join must be co-located (no exchange)")
      // same answer either way
      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("compaction sizes partitions from plan stats, coalescing without shuffle") {
    val orders = Sources.table(spark, "/root/testdata/sf0.001", "orders")
      .repartition(64) // simulate the many-small-files shape
    val est = orders.queryExecution.optimizedPlan.stats.sizeInBytes
    // target = ~quarter of the table → expect ~4 partitions, always < 64
    val compacted = Layout.compact(orders, targetBytes = (est / 4).toLong max 1L)
    val n = compacted.rdd.getNumPartitions
    assert(n >= 2 && n <= 8, s"expected ~4 partitions, got $n (est=$est)")
    // shrinking must coalesce, not shuffle: the Coalesce node must be in
    // the plan (the input's own repartition exchange is still there, so
    // "no exchange anywhere" would be the wrong assertion)
    assert(compacted.queryExecution.executedPlan.toString.contains("Coalesce"),
      "compact without allowShuffle must plan a Coalesce")
    assert(compacted.count() == orders.count())
    // growing: splitting under-partitioned input needs the explicit
    // shuffle opt-in (coalesce cannot raise the partition count)
    val grown = Layout.compact(orders.coalesce(1), targetBytes = (est / 8).toLong max 1L,
      allowShuffle = true)
    assert(grown.rdd.getNumPartitions > 1)
  }

  test("partitioned layout prunes to the filtered day's files") {
    val base = Files.createTempDirectory("graft_layout").toString
    val orders = Sources.table(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
    Layout.writePartitioned(orders, s"$base/orders_p", "order_month")

    val all = spark.read.parquet(s"$base/orders_p")
    val filtered = all.where(col("order_month") === "1997-03")
    // pruning shows in the physical plan's partition filters AND in the
    // scan width (splits for one month vs ~80 months)
    val planStr = filtered.queryExecution.executedPlan.toString
    assert(planStr.contains("order_month"), planStr.take(400))
    val prunedSplits = Layout.scanSplits(filtered.select(col("o_orderkey")))
    val totalSplits = Layout.scanSplits(all.select(col("o_orderkey")))
    // small files bin-pack into few splits; the pruned scan must still be
    // strictly narrower (one month's file vs all ~80 months)
    assert(prunedSplits > 0 && prunedSplits < totalSplits,
      s"pruning must cut the scan: $prunedSplits of $totalSplits splits")
    // and the filtered count is exactly that month's rows
    val expected = orders.where(col("order_month") === "1997-03").count()
    assert(filtered.count() == expected)
  }

  test("z-order clusters BOTH columns; linear sort clusters only one") {
    val base = Files.createTempDirectory("graft_zorder").toString
    val orders = Sources.table(spark, "/root/testdata/sf0.01", "orders")
    val nFiles = 16

    Layout.zOrdered(orders, "o_custkey", "o_orderkey", nFiles)
      .write.parquet(s"$base/z")
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.parquet(s"$base/linear")

    // per-file fraction of each column's global range (the min/max span
    // parquet row-group pruning keys on): a file whose span is 0.2 lets a
    // point predicate skip it 80% of the time
    def avgSpan(path: String, c: String): Double = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(c)).cast("double").as("mn"), max(col(c)).cast("double").as("mx"))
        .crossJoin(broadcast(spark.read.parquet(path)
          .agg(min(col(c)).cast("double").as("gmn"), max(col(c)).cast("double").as("gmx"))))
        .select(((col("mx") - col("mn")) / (col("gmx") - col("gmn"))).as("span"))
        .agg(avg(col("span"))).head().getDouble(0)
      stats
    }
    // linear layout: near-perfect on the sort key, useless on the other
    assert(avgSpan(s"$base/linear", "o_custkey") < 0.2)
    assert(avgSpan(s"$base/linear", "o_orderkey") > 0.8,
      "control broken: linear layout should scatter the non-sort key")
    // z-order: BOTH columns clustered well below the scattered baseline
    val zc = avgSpan(s"$base/z", "o_custkey")
    val zo = avgSpan(s"$base/z", "o_orderkey")
    assert(zc < 0.6 && zo < 0.6,
      s"z-order must localize both dims: custkey span $zc, orderkey span $zo")
    // same rows either way
    assert(spark.read.parquet(s"$base/z").count() == orders.count())
  }
}

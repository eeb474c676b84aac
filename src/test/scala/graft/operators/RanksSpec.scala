package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RanksSpec extends SparkSpec {

  test("withGlobalRank equals the naive global row_number on a tied fixture") {
    import spark.implicits._
    // heavy ties (every value appears ~7×), negative values, and a
    // non-contiguous key — the permutation must match row-for-row
    val df = (1 to 200).map(i => ((i * 37) % 29 - 14L, i * 3L))
      .toDF("v", "k")
    for (buckets <- Seq(2, 3, 16, 256)) {
      val got = Ranks.withGlobalRank(df, col("v"), col("k"), "r", buckets)
        .select("v", "k", "r").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = df.select(col("v"), col("k"),
          row_number().over(Window.orderBy(col("v"), col("k")))
            .cast("long").as("r"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === want, s"buckets=$buckets diverges from global row_number")
    }
  }

  test("withGlobalRank matches on a real table and descending via negation") {
    val feats = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * lit(100.0) + lit(0.500001))
        .cast("long")).as("m"))
    val got = Ranks.withGlobalRank(feats, -col("m"), col("o_custkey"), "r")
      .select("o_custkey", "r").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = feats.select(col("o_custkey"),
        row_number().over(Window.orderBy(col("m").desc, col("o_custkey")))
          .cast("long").as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.values.toSeq.sorted === (1L to got.size.toLong))
  }

  test("withGlobalRank plans no partition-less window and rejects bad buckets") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import spark.implicits._
    val df = Seq((1L, 1L), (2L, 2L)).toDF("v", "k")
    val lp = Ranks.withGlobalRank(df, col("v"), col("k"), "r")
      .queryExecution.optimizedPlan
    assert(lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }.isEmpty)
    intercept[IllegalArgumentException] {
      Ranks.withGlobalRank(df, col("v"), col("k"), "r", buckets = 1)
    }
  }
}

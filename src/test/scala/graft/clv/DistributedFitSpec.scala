package graft.clv

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cluster-side treeAggregate objective must land on the same optimum
  * as the driver loop — it is the same math over the same compressed
  * triples, just reduced on executors.
  */
class DistributedFitSpec extends SparkSpec {

  test("fitDistributed matches the driver-side fit on real features") {
    val feats = graft.operators.Rfm.customerFeatures(
      graft.io.Sources.table(spark, "/root/testdata/sf0.001", "orders"),
      to_date(lit("2001-08-02")), "o_custkey", "o_orderdate", "o_totalprice")
      .filter(col("frequency") > 0 && col("monetary_value") > 0)
      .cache()
    val local = BetaGeo.fitFeatures(feats, "frequency", "recency", "t")
    val compressed = feats
      .groupBy(col("frequency").cast("double").as("x"),
        col("recency").cast("double").as("tx"), col("t").cast("double").as("big"))
      .agg(count(lit(1)).cast("double").as("w"))
    val dist = BetaGeo.fitDistributed(compressed)
    assert(math.abs(dist.r - local.r) < 1e-4 * math.max(1.0, local.r), s"$dist vs $local")
    assert(math.abs(dist.alpha - local.alpha) < 1e-4 * math.max(1.0, local.alpha))
    assert(math.abs(dist.a - local.a) < 1e-4 * math.max(1.0, local.a))
    assert(math.abs(dist.b - local.b) < 1e-4 * math.max(1.0, local.b))
    feats.unpersist()
  }

  test("driver-cap routing: tiny cap forces the distributed path, same result") {
    val feats = graft.operators.Rfm.customerFeatures(
      graft.io.Sources.table(spark, "/root/testdata/sf0.001", "orders"),
      to_date(lit("2001-08-02")), "o_custkey", "o_orderdate", "o_totalprice")
      .filter(col("frequency") > 0 && col("monetary_value") > 0)
    val viaCap = BetaGeo.fitFeatures(feats, "frequency", "recency", "t", maxDriverRows = 1)
    val direct = BetaGeo.fitFeatures(feats, "frequency", "recency", "t")
    assert(math.abs(viaCap.r - direct.r) < 1e-4 * math.max(1.0, direct.r))
  }
}

package graft.quality

import graft.SparkSpec

/** Ports of the reference's firewall pytest suite
  * (tests/test_clv_logic.py:97–119) plus the DataFrame-backed arms.
  */
class FirewallSpec extends SparkSpec {

  private val goodCols = Set("customer_id", "recency", "T", "frequency",
    "monetary_value", "first_purchase", "last_purchase")

  // test_validation_fails_on_data_loss (test_clv_logic.py:97–103)
  test("ratio below 0.95 raises DATA LOSS") {
    val e = intercept[IllegalArgumentException](
      Firewall.runValidationChecks(100, 80, 0, goodCols))
    assert(e.getMessage.contains("DATA LOSS"))
  }

  // test_validation_fails_on_negative_values (test_clv_logic.py:105–111)
  test("negative rows raise SANITY ERROR") {
    val e = intercept[IllegalArgumentException](
      Firewall.runValidationChecks(100, 100, 5, goodCols))
    assert(e.getMessage.contains("SANITY ERROR"))
    assert(e.getMessage.contains("5"))
  }

  // test_validation_fails_missing_columns (test_clv_logic.py:113–119)
  test("missing required column raises SCHEMA ERROR") {
    val e = intercept[IllegalArgumentException](
      Firewall.runValidationChecks(100, 100, 0, goodCols - "frequency"))
    assert(e.getMessage.contains("SCHEMA ERROR"))
    assert(e.getMessage.contains("frequency"))
  }

  test("healthy scalars pass") {
    assert(Firewall.runValidationChecks(100, 96, 0, goodCols))
    // zero-guard: raw_c = 0 → ratio 0 → DATA LOSS, not a division error
    val e = intercept[IllegalArgumentException](
      Firewall.runValidationChecks(0, 0, 0, goodCols))
    assert(e.getMessage.contains("DATA LOSS"))
  }

  test("DataFrame arms: end-to-end gate over staging + features") {
    import spark.implicits._
    val staging = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("CustomerID", "TotalPurchase")
    val features = Seq(
      (1L, 5L, 30L, 2L, 10.0), (2L, 6L, 40L, 3L, 20.0), (3L, 7L, 50L, 4L, 30.0))
      .toDF("customer_id", "recency", "t", "frequency", "monetary_value")
      .withColumn("first_purchase", org.apache.spark.sql.functions.lit("2025-01-01"))
      .withColumn("last_purchase", org.apache.spark.sql.functions.lit("2025-02-01"))
    assert(Firewall.validateFeatures(staging, features) == "Validation Success")

    // drop a customer from features → ratio 2/3 < 0.95 → DATA LOSS
    val lossy = features.filter($"customer_id" =!= 3L)
    val e = intercept[IllegalArgumentException](
      Firewall.validateFeatures(staging, lossy))
    assert(e.getMessage.contains("DATA LOSS"))

    // negative recency → SANITY ERROR
    val negative = features.withColumn("recency",
      org.apache.spark.sql.functions.lit(-1L))
    val e2 = intercept[IllegalArgumentException](
      Firewall.validateFeatures(staging, negative))
    assert(e2.getMessage.contains("SANITY ERROR"))
  }
}

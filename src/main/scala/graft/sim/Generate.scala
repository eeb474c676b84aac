package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Seeded synthetic-transaction generator — the Spark-first rewrite of the
  * reference's per-customer Python loop (reference: dags/simulate_data.py:
  * 97–206): the loop disappears into one `spark.range`-seeded frame with an
  * explode, so generating a billion customers costs a scan, not a driver
  * loop.
  *
  * Randomness is derived from xxhash64(customerId, tag, seed) instead of
  * `rand()`: per-value deterministic (two runs are bit-identical — the
  * reproducibility E14's seeding aims for), usable inside higher-order
  * lambdas where nondeterministic expressions are banned, and stable under
  * repartitioning — `rand(seed)` is only stable per partition layout.
  *
  * Distribution parity with the reference:
  *   purchases/customer ~ U{1..14}        (simulate_data.py:163)
  *   UnitPrice ~ U[5.0, 100.0) 2dp        (:166)
  *   Quantity ~ U{1..4}                   (:167)
  *   session start ~ U[windowStart, +24h) (:173–176)
  *   inter-purchase gap ~ U{20..99}s, cumulative, first offset 0 (:180–185)
  */
object Generate {

  /** hash-uniform integer in [0, n) keyed on (cols..., tag, seed). */
  private def hmod(n: Int, seed: Long, tag: String, cols: Column*): Column =
    pmod(xxhash64((cols :+ lit(tag) :+ lit(seed)): _*), lit(n.toLong))

  /** Returning ∪ new customer-id frame for one day (reference
    * get_daily_customer_ids, simulate_data.py:97–155): seeded sample
    * without replacement from the dense pool [1, maxId], plus a sequential
    * block of brand-new ids; quota shortfall converts to extra new users.
    * Returns (dailyIds, newIds) with column `CustomerID`.
    */
  def dailyCustomerIds(spark: SparkSession, maxExistingId: Long, seed: Long,
      newUsers: Int = 10, returningUsers: Int = 200): (DataFrame, DataFrame) = {
    val canReturn = math.min(returningUsers.toLong, maxExistingId).toInt
    val usersNeeded = newUsers + (returningUsers - canReturn)
    val returning =
      if (maxExistingId == 0) spark.range(0).select(col("id").as("CustomerID"))
      else spark.range(1, maxExistingId + 1)
        .select(col("id").as("CustomerID"))
        .orderBy(hmod(1 << 30, seed, "sample", col("CustomerID")), col("CustomerID"))
        .limit(canReturn)
    val newIds = spark.range(maxExistingId + 1, maxExistingId + 1 + usersNeeded)
      .select(col("id").as("CustomerID"))
    (returning.unionAll(newIds), newIds)
  }

  /** One day of transactions for the given customer ids. Pure projection +
    * explode — zero shuffles; the plan is a scan of a range.
    */
  def transactions(dailyIds: DataFrame, windowStartUtc: String, seed: Long): DataFrame = {
    val cid = col("CustomerID")
    val perCustomer = dailyIds
      .withColumn("n_purchases", (hmod(14, seed, "npurch", cid) + 1).cast(IntegerType))
      .withColumn("session_offset_s", hmod(86400, seed, "session", cid))
    val exploded = perCustomer
      .select(cid, col("session_offset_s"),
        posexplode(sequence(lit(1), col("n_purchases"))))
      .withColumnsRenamed(Map("pos" -> "p", "col" -> "purchase_n"))
    val n = col("purchase_n")
    // cumulative gap: Σ_{j=2..n} U{20..99}(cid, j) — per-element closed form
    // instead of a window cumsum, so no shuffle (n ≤ 14 keeps it O(n²)-cheap)
    val cumGap = when(n === 1, lit(0L)).otherwise(
      aggregate(sequence(lit(2), n),
        lit(0L), (acc, j) => acc + lit(20L) + hmod(80, seed, "gap", cid, j)))
    exploded
      .withColumn("Quantity", (hmod(4, seed, "qty", cid, n) + 1).cast(IntegerType))
      .withColumn("UnitPrice",
        round(lit(5.0) + hmod(9500, seed, "price", cid, n).cast("double") / 100.0, 2))
      .withColumn("order_timestamp",
        timestamp_add("SECOND", (col("session_offset_s") + cumGap).cast(IntegerType),
          to_timestamp(lit(windowStartUtc))))
      .withColumn("TotalPurchase", col("Quantity") * col("UnitPrice"))
      .select(cid.cast(LongType).as("CustomerID"), col("Quantity"), col("UnitPrice"),
        col("order_timestamp"), col("TotalPurchase"))
  }

  /** Full daily batch (reference generate_multi_user_data_and_upload_raw_data,
    * simulate_data.py:209–259, minus the GCS hop): ids → transactions.
    * Returns (batch, newIds).
    */
  def dailyBatch(spark: SparkSession, maxExistingId: Long, windowStartUtc: String,
      seed: Long, newUsers: Int = 10, returningUsers: Int = 200): (DataFrame, DataFrame) = {
    val (daily, newIds) = dailyCustomerIds(spark, maxExistingId, seed, newUsers, returningUsers)
    (transactions(daily, windowStartUtc, seed), newIds)
  }
}

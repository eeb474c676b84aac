package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Harness entry for the generator (E14/E15/O1/O2/E6/E7 + W1-as-producer).
  *
  * Envelope-contract oracle (the q_approx_distinct pattern): the row values
  * are seeded xxhash64 draws DuckDB cannot replay, but the generator's
  * CONTRACT is SQL-expressible — 210 distinct customers (200 returning from
  * the 400-id pool + 10 new), 1-14 purchases each, Quantity in {1..4},
  * UnitPrice in [5.00, 100.00) at 2dp, TotalPurchase = Quantity*UnitPrice,
  * and every timestamp inside [windowStart, windowStart + 24h + 13*99s)
  * (session offset < 86400s plus the maximal cumulative gap). The query
  * emits those checks as scalars + flags; DuckDB returns the constants.
  * Distribution moments and bit-reproducibility are asserted in
  * GenerateSpec.
  */
object SimQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_generator" -> ((s, _) => {
      val (batch, _) = Generate.dailyBatch(s, maxExistingId = 400,
        windowStartUtc = "2026-01-24 00:00:00", seed = 42)
      val per = batch.groupBy("CustomerID").agg(
        count(lit(1)).as("n_tx"),
        min(col("Quantity")).as("min_q"), max(col("Quantity")).as("max_q"),
        min(col("UnitPrice")).as("min_p"), max(col("UnitPrice")).as("max_p"),
        max(abs(col("UnitPrice") * 100 -
          round(col("UnitPrice") * 100, 0))).as("p_2dp_err"),
        max(abs(col("TotalPurchase") -
          col("Quantity") * col("UnitPrice"))).as("tp_err"),
        min(col("order_timestamp")).as("min_ts"),
        max(col("order_timestamp")).as("max_ts"))
      per.agg(
        count(lit(1)).as("n_customers"),
        (min(col("n_tx")) >= 1 && max(col("n_tx")) <= 14)
          .cast("long").as("purchases_in_1_14"),
        (min(col("min_q")) >= 1 && max(col("max_q")) <= 4)
          .cast("long").as("quantity_in_1_4"),
        (min(col("min_p")) >= 5.0 && max(col("max_p")) < 100.0)
          .cast("long").as("price_in_5_100"),
        (max(col("p_2dp_err")) < 1e-6).cast("long").as("price_2dp"),
        (max(col("tp_err")) < 1e-9).cast("long").as("total_is_q_times_p"),
        (min(col("min_ts")) >= to_timestamp(lit("2026-01-24 00:00:00")) &&
          max(col("max_ts")) < to_timestamp(lit("2026-01-25 00:21:27")))
          .cast("long").as("ts_in_window"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // the generator contract as constants: 210 = min(200, maxExistingId=400)
    // returning + 10 new customers, every flag required true
    "q_generator" ->
      """SELECT CAST(210 AS BIGINT) AS n_customers,
        |  CAST(1 AS BIGINT) AS purchases_in_1_14,
        |  CAST(1 AS BIGINT) AS quantity_in_1_4,
        |  CAST(1 AS BIGINT) AS price_in_5_100,
        |  CAST(1 AS BIGINT) AS price_2dp,
        |  CAST(1 AS BIGINT) AS total_is_q_times_p,
        |  CAST(1 AS BIGINT) AS ts_in_window""".stripMargin
  )
}

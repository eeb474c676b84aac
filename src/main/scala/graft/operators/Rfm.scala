package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The RFM-T feature transform — the single most load-bearing query in the
  * system (SURVEY §2.4 A1 + §2.7 E1–E5; reference: dags/clv_data_dag.py:80–93).
  *
  * Semantic traps replicated exactly (SURVEY §7.3):
  *  - recency = whole days between first and last purchase *dates*
  *    (date-truncate before diffing), not timestamps;
  *  - T = customer age in days relative to a pinned `asOfDate` (the
  *    reference uses CURRENT_DATE(); parameterized here for determinism);
  *  - frequency = COUNT(DISTINCT purchase *day*) − 1 (same-day purchases
  *    collapse — the lifetimes repeat-purchase convention);
  *  - monetary_value = AVG over ALL transactions including the first
  *    (deviates from the lifetimes textbook; we replicate the reference).
  *
  * Intentional schema deviation: first_purchase/last_purchase are emitted
  * as DATE, where the reference's customer_features table stores raw
  * MIN/MAX(order_timestamp) as TIMESTAMP (dags/clv_data_dag.py:89–90).
  * Every downstream consumer (validation, model) is day-granular, and the
  * harness oracle compares dates; keep this in mind if byte-comparing our
  * snapshots against reference exports.
  *
  * Scale: a single hash aggregation — Catalyst plans partial (map-side)
  * aggregation before the shuffle on the customer key, and the distinct-day
  * count is handled by the built-in distinct-aggregate expansion. One
  * shuffle total; no window, no join. At 100 TB the input scan is pruned to
  * the three referenced columns.
  */
object Rfm {

  def customerFeatures(
      tx: DataFrame,
      asOfDate: Column,
      customerCol: String = "CustomerID",
      tsCol: String = "order_timestamp",
      amountCol: String = "TotalPurchase"): DataFrame = {
    val ts = col(tsCol)
    tx.groupBy(col(customerCol).cast(LongType).as("customer_id"))
      .agg(
        datediff(to_date(max(ts)), to_date(min(ts))).cast(LongType).as("recency"),
        datediff(asOfDate, to_date(min(ts))).cast(LongType).as("t"),
        (countDistinct(to_date(ts)) - 1).cast(LongType).as("frequency"),
        avg(col(amountCol)).as("monetary_value"),
        to_date(min(ts)).as("first_purchase"),
        to_date(max(ts)).as("last_purchase"))
  }
}

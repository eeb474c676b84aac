package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Harness entry for the generator (E14/E15/O1/O2/E6/E7 + W1-as-producer).
  * Rows-only: the output is seeded-deterministic but has no DuckDB oracle
  * (the randomness lives in xxhash64); determinism and distribution
  * envelopes are asserted in GenerateSpec instead.
  */
object SimQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_generator" -> ((s, _) => {
      val (batch, _) = Generate.dailyBatch(s, maxExistingId = 400,
        windowStartUtc = "2026-01-24 00:00:00", seed = 42)
      batch.orderBy("CustomerID", "order_timestamp")
    })
  )
}

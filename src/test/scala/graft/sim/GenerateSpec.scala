package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GenerateSpec extends SparkSpec {

  test("two runs with the same seed are bit-identical") {
    val (a, _) = Generate.dailyBatch(spark, 400, "2026-01-24 00:00:00", seed = 42)
    val (b, _) = Generate.dailyBatch(spark, 400, "2026-01-24 00:00:00", seed = 42)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val (c, _) = Generate.dailyBatch(spark, 400, "2026-01-24 00:00:00", seed = 43)
    assert(!c.exceptAll(a).isEmpty, "different seed must move the data")
  }

  test("reference distribution envelope: counts, ranges, invariants") {
    val (batch, newIds) = Generate.dailyBatch(spark, 400, "2026-01-24 00:00:00", 7)
    val rows = batch.cache()
    // 200 returning + 10 new customers
    assert(rows.select(countDistinct(col("CustomerID"))).first().getLong(0) == 210L)
    assert(newIds.count() == 10L && newIds.agg(min("CustomerID")).first().getLong(0) == 401L)
    // 1..14 purchases per customer
    val perC = rows.groupBy("CustomerID").count()
    val mm = perC.agg(min("count"), max("count")).first()
    assert(mm.getLong(0) >= 1L && mm.getLong(1) <= 14L)
    // price/quantity envelopes (simulate_data.py:166–167)
    val env = rows.agg(min("UnitPrice"), max("UnitPrice"), min("Quantity"), max("Quantity")).first()
    assert(env.getDouble(0) >= 5.0 && env.getDouble(1) < 100.0)
    assert(env.getInt(2) >= 1 && env.getInt(3) <= 4)
    // TotalPurchase invariant (P1)
    assert(rows.where(abs(col("TotalPurchase") - col("Quantity") * col("UnitPrice")) > 1e-9).isEmpty)
    // timestamps inside the generation window (+ cumulative session gaps)
    val ts = rows.agg(min("order_timestamp").cast("string"), max("order_timestamp").cast("string")).first()
    assert(ts.getString(0) >= "2026-01-24 00:00:00")
    assert(ts.getString(1) < "2026-01-25 01:00:00")
    rows.unpersist()
  }

  test("cold start: empty registry converts the returning quota to new users") {
    val (daily, newIds) = Generate.dailyCustomerIds(spark, 0, seed = 1,
      newUsers = 10, returningUsers = 200)
    assert(daily.count() == 210L && newIds.count() == 210L)
    assert(newIds.agg(min("CustomerID")).first().getLong(0) == 1L)
  }

  test("generation plan is shuffle-free (no exchange below the scan)") {
    val (daily, _) = Generate.dailyCustomerIds(spark, 400, 1)
    val plan = Generate.transactions(daily, "2026-01-24 00:00:00", 1)
      .queryExecution.executedPlan.toString
    // the id-sample sort is the only exchange source; transactions itself
    // adds none (no window, no groupBy, no join)
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("as-of semantics: latest right row at or before each left timestamp") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")),   // after r@09:00 and r@09:30 → 9:30's value
      (2L, 10L, ts("2026-01-01 09:30:00")),   // exactly at r@09:30 → matches (>=)
      (3L, 10L, ts("2026-01-01 08:00:00")),   // before any right row → null
      (4L, 20L, ts("2026-01-01 12:00:00")))   // other key, single right row
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2026-01-01 09:00:00"), 1.0),
      (10L, ts("2026-01-01 09:30:00"), 2.0),
      (10L, ts("2026-01-01 11:00:00"), 3.0),  // after all left rows for key 10
      (20L, ts("2026-01-01 11:59:00"), 9.0))
      .toDF("user_id", "ts", "value")

    val out = AsOfJoin.leftAsOf(left, right, "user_id", "ts", "ts", Seq("value"))
      .orderBy("event_id").collect()
    assert(out.length == 4)
    assert(out(0).getAs[Double]("asof_value") == 2.0)
    assert(out(1).getAs[Double]("asof_value") == 2.0)
    assert(out(2).isNullAt(out(2).fieldIndex("asof_value")))
    assert(out(3).getAs[Double]("asof_value") == 9.0)
  }

  test("a right row with a NULL value matches (its NULL carries) instead of being skipped") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")))  // newest preceding right row has NULL value
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2026-01-01 09:00:00"), Some(1.0)),
      (10L, ts("2026-01-01 09:30:00"), None))  // DuckDB ASOF would match this row
      .toDF("user_id", "ts", "value")
    val out = AsOfJoin.leftAsOf(left, right, "user_id", "ts", "ts", Seq("value")).collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(out(0).fieldIndex("asof_value")),
      "the 09:30 NULL-valued row must win, not the older 09:00 row")
  }

  test("plan shape: one sort-carry pass, no join node at all") {
    import spark.implicits._
    val l = Seq((1L, 1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 09:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    val plan = AsOfJoin.leftAsOf(l, r, "user_id", "ts", "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must be union+window, not a join")
    assert(plan.contains("Window"))
  }

  test("forward as-of: earliest right row at or after, equality included") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")),   // next right is 11:00 → 3.0
      (2L, 10L, ts("2026-01-01 09:30:00")),   // exactly at r@09:30 → matches (<=)
      (3L, 10L, ts("2026-01-01 12:00:00")),   // after every right row → null
      (4L, 20L, ts("2026-01-01 11:00:00")))   // other key → 9.0
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2026-01-01 09:00:00"), 1.0),
      (10L, ts("2026-01-01 09:30:00"), 2.0),
      (10L, ts("2026-01-01 11:00:00"), 3.0),
      (20L, ts("2026-01-01 11:59:00"), 9.0))
      .toDF("user_id", "ts", "value")

    val out = AsOfJoin.leftAsOfForward(left, right, "user_id", "ts", "ts", Seq("value"))
      .orderBy("event_id").collect()
    assert(out.length == 4)
    assert(out(0).getAs[Double]("asof_value") == 3.0)
    assert(out(1).getAs[Double]("asof_value") == 2.0,
      "equal-instant right row must match in the forward direction too")
    assert(out(2).isNullAt(out(2).fieldIndex("asof_value")))
    assert(out(3).getAs[Double]("asof_value") == 9.0)
    // and the forward plan is the same join-free union+window shape
    val plan = AsOfJoin.leftAsOfForward(left, right, "user_id", "ts", "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "forward as-of must be union+window, not a join")
  }
}

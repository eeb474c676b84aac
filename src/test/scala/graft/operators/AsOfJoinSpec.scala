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

  test("nearest as-of: closest side wins, distance ties go backward") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")),  // back@9:50 (10m) vs fwd@10:30 (30m) → back
      (2L, 10L, ts("2026-01-01 10:25:00")),  // back@9:50 (35m) vs fwd@10:30 (5m) → fwd
      (3L, 10L, ts("2026-01-01 10:10:00")),  // 20m both sides → tie → back
      (4L, 20L, ts("2026-01-01 10:00:00")),  // only a forward row exists
      (5L, 30L, ts("2026-01-01 10:00:00")))  // no right rows at all → null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2026-01-01 09:50:00"), 1.0),
      (10L, ts("2026-01-01 10:30:00"), 2.0),
      (20L, ts("2026-01-01 11:00:00"), 9.0))
      .toDF("user_id", "ts", "value")
    val out = AsOfJoin.leftAsOfNearest(left, right, "user_id", "ts", "ts", Seq("value"))
      .orderBy("event_id").collect()
    assert(out(0).getAs[Double]("asof_value") == 1.0)
    assert(out(0).getAs[Long]("asof_dt_us") == 10L * 60 * 1000000)
    assert(out(1).getAs[Double]("asof_value") == 2.0)
    assert(out(1).getAs[Long]("asof_dt_us") == -5L * 60 * 1000000)
    assert(out(2).getAs[Double]("asof_value") == 1.0, "equal distance goes backward")
    assert(out(2).getAs[Long]("asof_dt_us") == 20L * 60 * 1000000)
    assert(out(3).getAs[Double]("asof_value") == 9.0, "forward-only key matches forward")
    assert(out(3).getAs[Long]("asof_dt_us") == -60L * 60 * 1000000)
    assert(out(4).isNullAt(out(4).fieldIndex("asof_value")))
    assert(out(4).isNullAt(out(4).fieldIndex("asof_dt_us")))
  }

  test("nearest as-of: equal-instant right row matches at distance 0") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, 10L, ts("2026-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2026-01-01 10:00:00"), 5.0),
      (10L, ts("2026-01-01 10:00:01"), 6.0))
      .toDF("user_id", "ts", "value")
    val out = AsOfJoin.leftAsOfNearest(left, right, "user_id", "ts", "ts", Seq("value"))
      .collect()(0)
    assert(out.getAs[Double]("asof_value") == 5.0)
    assert(out.getAs[Long]("asof_dt_us") == 0L)
  }

  test("nearest plan: ONE exchange serves both carries, never a join") {
    import spark.implicits._
    val l = Seq((1L, 1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 09:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    val plan = AsOfJoin.leftAsOfNearest(l, r, "user_id", "ts", "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "nearest as-of must be union+window, not a join")
    // both frame passes share the (key, ts, side, rid) sort: exactly one
    // hash exchange below the Window nodes (plus nothing else)
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1,
      s"backward+forward carries must share one shuffle:\n$plan")
  }

  test("tied (key, ts) right rows: pick is deterministic under any partitioning") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // left at the SAME instant as the tied right rows — matches both
    // directions, so one fixture exercises backward and forward
    val left = Seq((1L, 10L, ts("2026-01-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val tied = Seq(
      (10L, ts("2026-01-01 09:00:00"), 1.0),
      (10L, ts("2026-01-01 09:00:00"), 2.0),
      (10L, ts("2026-01-01 09:00:00"), 3.0))
    def rightDf(rows: Seq[(Long, java.sql.Timestamp, Double)], parts: Int) =
      rows.toDF("user_id", "ts", "value").repartition(parts)
    def pick(forward: Boolean, rows: Seq[(Long, java.sql.Timestamp, Double)],
        parts: Int): Double = {
      val r = rightDf(rows, parts)
      val j = if (forward) AsOfJoin.leftAsOfForward(left, r, "user_id", "ts", "ts", Seq("value"))
              else AsOfJoin.leftAsOf(left, r, "user_id", "ts", "ts", Seq("value"))
      j.collect()(0).getAs[Double]("asof_value")
    }
    // the pinned semantics: content-hash tie-break — max-hash row wins
    // backward, min-hash row forward
    val hashed = tied.toDF("user_id", "ts", "value")
      .withColumn("h", xxhash64(col("user_id"), col("ts"), col("value")))
    val maxH = hashed.orderBy(col("h").desc).select("value").head().getDouble(0)
    val minH = hashed.orderBy(col("h").asc).select("value").head().getDouble(0)
    val backward = for (rows <- Seq(tied, tied.reverse); p <- Seq(1, 3, 7))
      yield pick(forward = false, rows, p)
    assert(backward.distinct == List(maxH),
      s"backward tie pick not deterministic/pinned: $backward (expect $maxH)")
    val fwd = for (rows <- Seq(tied, tied.reverse); p <- Seq(1, 5))
      yield pick(forward = true, rows, p)
    assert(fwd.distinct == List(minH),
      s"forward tie pick not deterministic/pinned: $fwd (expect $minH)")
  }
}

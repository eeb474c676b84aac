package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketed result equals the naive inequality join, with no nested-loop node") {
    import spark.implicits._
    val points = Seq((1L, 0.5), (2L, 10.0), (3L, 999.0), (4L, 1500.0), (5L, 2500.0))
      .toDF("id", "v")
    val intervals = Seq((100L, 0.0, 100.0), (200L, 5.0, 2000.0), (300L, 2400.0, 2600.0),
      (400L, 3000.0, 4000.0))
      .toDF("iv_id", "lo", "hi")

    val bucketed = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 500.0)
      .select("id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")
      .select("id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive, s"bucketed $bucketed vs naive $naive")
    assert(bucketed.contains((1L, 100L)) && bucketed.contains((4L, 200L)) &&
      bucketed.contains((5L, 300L)))
    assert(!bucketed.exists(_._2 == 400L), "empty band stays empty")

    val plan = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 500.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "range join must be a bucketed equi-join")
  }

  test("interval overlap ≡ naive inequality join, each pair exactly once") {
    import spark.implicits._
    // spans chosen so pairs share 1, 2, and 3 grid cells (width 10) —
    // the single-cell attribution must emit each pair exactly once
    val a = Seq((1L, 0.0, 9.0), (2L, 5.0, 35.0), (3L, 40.0, 41.0))
      .toDF("a_id", "lo", "hi")
    val b = Seq((10L, 8.0, 12.0), (20L, 0.0, 50.0), (30L, 36.0, 39.0),
      (40L, 60.0, 70.0))
      .toDF("b_id", "lo2", "hi2")

    val got = RangeJoin.intervalOverlap(a, "lo", "hi", b, "lo2", "hi2", 10.0)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = a.join(b, $"lo" <= $"hi2" && $"lo2" <= $"hi")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactly-once: multiset equality, not just set equality
    assert(got.sorted.toSeq === naive.sorted.toSeq,
      s"got ${got.toSeq.sorted} vs naive ${naive.toSeq.sorted}")
    assert(got.toSet.contains((2L, 20L)), "3-cell-span pair present")
    assert(!got.exists(_._2 == 40L), "disjoint interval stays unmatched")

    val plan = RangeJoin.intervalOverlap(a, "lo", "hi", b, "lo2", "hi2", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "interval overlap must be a bucketed equi-join")
  }
}

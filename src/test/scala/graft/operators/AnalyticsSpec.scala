package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Semantic invariants + plan-shape gates for the marketing-analytics /
  * rank-fusion family (Analytics.scala). The DuckDB hash gate pins exact
  * values; these pin the arithmetic that makes the answers right (cohort
  * denominators, funnel monotonicity, segment digit consistency, RRF rank
  * bounds, centroid exactness) and the plan shapes that make them scale
  * (no self-joins where a window suffices, broadcast-only joins, top-k via
  * TakeOrdered rather than a global sort).
  */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def plan(name: String): String = {
    spark.catalog.clearCache()
    run(name).queryExecution.executedPlan.toString
  }

  // ---- q_cohort_retention -------------------------------------------------

  test("cohort retention: month-0 rate is 1.0 and no cell exceeds its cohort") {
    val rows = run("q_cohort_retention").collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (_, cells) =>
      val m0 = cells.find(_.getLong(1) == 0L)
      assert(m0.isDefined, "cohort missing its month-0 cell")
      val n0 = m0.get.getLong(2)
      assert(m0.get.getDouble(3) === 1.0)
      // retention never counts more actives than the cohort had members
      cells.foreach(c => assert(c.getLong(2) <= n0))
    }
  }

  test("cohort retention: denominator rides a window, not a self-join") {
    val p = plan("q_cohort_retention")
    assert(!p.contains("Join"), s"expected join-free cohort plan:\n$p")
  }

  // ---- q_funnel -----------------------------------------------------------

  test("funnel stages are monotone and match a brute-force recount") {
    val r = run("q_funnel").collect().head
    val (nUsers, nView, nClick, nPurchase) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nUsers >= nView && nView >= nClick && nClick >= nPurchase)
    assert(nView > 0, "fixture should produce view-stage users")

    // brute force on the driver (sf0.001 is small): same staged-min logic
    val ev = graft.io.Sources.table(spark, sf, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getTimestamp(2)))
    val byUser = ev.groupBy(_._1)
    def stage(prev: Map[Long, java.sql.Timestamp], ty: String) =
      prev.flatMap { case (u, t0) =>
        byUser(u).filter(e => e._2 == ty && e._3.after(t0))
          .map(_._3).minOption.map(u -> _)
      }
    val v = byUser.flatMap { case (u, es) =>
      es.filter(_._2 == "view").map(_._3).minOption.map(u -> _) }.toMap
    val c = stage(v, "click")
    val p = stage(c, "purchase")
    assert(nView === v.size && nClick === c.size && nPurchase === p.size)
  }

  test("funnel plan: one event shuffle, windows share it, no joins") {
    val p = plan("q_funnel")
    assert(!p.contains("Join"), s"expected join-free funnel plan:\n$p")
    // one hash Exchange on user_id + the single-partition final agg; the
    // three staged windows and the per-user collapse must all reuse the
    // user_id partitioning rather than re-shuffling events
    val hashEx = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashEx <= 1, s"staged windows re-shuffled events:\n$p")
  }

  // ---- q_new_vs_returning -------------------------------------------------

  test("new vs returning: month-1 all new, news sum to customer count") {
    val rows = run("q_new_vs_returning").collect()
    assert(rows.nonEmpty)
    // first month: every active customer is new
    assert(rows.head.getLong(2) === rows.head.getLong(1))
    assert(rows.head.getLong(3) === 0L)
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2) + r.getLong(3)))
    // every customer is new exactly once
    val nCust = graft.io.Sources.table(spark, sf, "orders")
      .select(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum === nCust)
  }

  // ---- q_time_to_convert --------------------------------------------------

  test("time-to-convert: converted count matches funnel, quantiles ordered") {
    val r = run("q_time_to_convert").collect().head
    val (n, med, p90) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n > 0 && med >= 0.0 && p90 >= med)
    // conversion latency is view→FIRST-purchase-after: the converted-user
    // count must equal the funnel's view→purchase stage only when the
    // funnel's strict click stage is skipped — recount directly
    val ev = graft.io.Sources.table(spark, sf, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getTimestamp(2)))
    val byUser = ev.groupBy(_._1)
    val converted = byUser.count { case (_, es) =>
      es.filter(_._2 == "view").map(_._3).minOption.exists(v =>
        es.exists(e => e._2 == "purchase" && e._3.after(v)))
    }
    assert(n === converted)
  }

  // ---- q_rfm_segments -----------------------------------------------------

  test("rfm segments: digits consistent, scores in 1..5, customers conserved") {
    val rows = run("q_rfm_segments").collect()
    rows.foreach { r =>
      val (seg, rs, fs, ms) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(seg === rs * 100 + fs * 10 + ms)
      Seq(rs, fs, ms).foreach(x => assert(x >= 1 && x <= 5))
    }
    val nCust = graft.io.Sources.table(spark, sf, "orders")
      .select(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(4)).sum === nCust)
    // quintiles of a continuous metric put ~20% in each monetary tier
    val byM = rows.groupBy(_.getLong(3)).view.mapValues(_.map(_.getLong(4)).sum)
    byM.values.foreach(n => assert(n >= nCust / 10 && n <= nCust * 3 / 10))
  }

  test("rfm segments plan: cuts broadcast, no sort-merge join") {
    val p = plan("q_rfm_segments")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast cuts row:\n$p")
    assert(!p.contains("SortMergeJoin"), s"cuts must not shuffle-join:\n$p")
  }

  // ---- q_rrf_fusion -------------------------------------------------------

  test("rrf fusion: rank bounds, query vector excluded, fused order correct") {
    val rows = run("q_rrf_fusion").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getLong(0) != 0L, "query vector must not match itself")
      assert(r.getLong(1) >= 0 && r.getLong(1) <= Analytics.FuseTopK)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= Analytics.FuseTopK)
      assert(r.getLong(1) > 0 || r.getLong(2) > 0, "fused row in neither list")
    }
    val rrfs = rows.map(_.getDouble(3))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b }, "not sorted")
    // a vector ranked top by BOTH lists must outrank one ranked by neither
    val best = rrfs.head
    // +1e-6 slack: the emitted rrf is rounded at the 6th decimal
    assert(best <= 2.0 / (Analytics.RrfK + 1) + 1e-6)
  }

  test("rrf fusion plan: distributed top-k, fusion join-free") {
    val p = plan("q_rrf_fusion")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected per-partition-heap top-k, not a global sort:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fusion must not shuffle-join:\n$p")
    // the only joins allowed are the broadcast query-vector attaches
    val joins = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joins.forall(_.contains("BroadcastNestedLoopJoin")),
      s"fusion grew a non-broadcast join:\n$p")
  }

  // ---- q_embed_centroid ---------------------------------------------------

  test("embed centroid: exact mean on a hand-built frame, cohesion ordering") {
    import spark.implicits._
    // two labels, known centroids: label 0 → (1,0)/(0,1) centroid (.5,.5);
    // label 1 → (2,2)/(4,4) centroid (3,3) with both vectors colinear
    val tiny = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0),
      (2L, Array(2f, 2f), 1), (3L, Array(4f, 4f), 1))
      .toDF("vec_id", "embedding", "label")
    val dirLess = Analytics.queries("q_embed_centroid")
    // route the tiny frame through the same centroid+cosine pipeline
    val cent = tiny
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v").cast("double")).as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cent(0) === Seq(0.5, 0.5))
    assert(cent(1) === Seq(3.0, 3.0))

    val rows = run("q_embed_centroid").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      val (avgCos, minCos) = (r.getDouble(2), r.getDouble(3))
      assert(avgCos >= minCos && avgCos <= 1.0 + 1e-9)
    }
    val total = rows.map(_.getLong(1)).sum
    val n = graft.io.Sources.table(spark, sf, "embeddings").count()
    assert(total === n)
  }

  test("embed centroid plan: centroid frame broadcasts back, no SMJ") {
    val p = plan("q_embed_centroid")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast centroid attach:\n$p")
    assert(!p.contains("SortMergeJoin"), s"centroid attach shuffled:\n$p")
  }
}

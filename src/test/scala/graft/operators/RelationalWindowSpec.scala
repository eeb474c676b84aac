package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Semantic invariants for the distribution-rank window family
  * (q_window_ntile): the DuckDB hash gate pins exact values; these pin
  * the PROPERTIES that make them right — quartile balance, exact
  * percent-rank/cume-dist arithmetic, monotonicity in the order key —
  * plus the one-shuffle plan shape.
  */
class RelationalWindowSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ntile quartiles balance within 1; ranks are exact integer ratios") {
    val rows = SparkEntry.queries("q_window_ntile")(spark, sf).collect()
    val bySeg = rows.groupBy(_.getString(1))
    assert(bySeg.nonEmpty)
    bySeg.foreach { case (seg, rs) =>
      val n = rs.length
      val sizes = rs.groupBy(_.getLong(2)).map { case (q, g) => q -> g.length }
      assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L, 4L)), s"$seg: $sizes")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$seg quartiles must balance within 1: $sizes")
      // exact distribution arithmetic at every row: with the unique
      // (v, custkey) order, rank == row position; pct_rank = (r-1)/(n-1),
      // cume = r/n
      val sorted = rs.sortBy(_.getDouble(4)) // cume ascending == rank order
      sorted.zipWithIndex.foreach { case (r, i) =>
        val rank = i + 1
        def r6(x: Double) = math.floor(x * 1e6 + 0.500001) / 1e6
        assert(r.getDouble(3) === r6((rank - 1).toDouble / (n - 1)),
          s"$seg rank $rank pct_rank: $r")
        assert(r.getDouble(4) === r6(rank.toDouble / n), s"$seg cume: $r")
      }
      // quartile is non-decreasing along the rank order
      assert(sorted.map(_.getLong(2)).sliding(2).forall(p => p(0) <= p(1)))
    }
  }

  test("ntile plan: one segment shuffle, a single Window node, no join") {
    spark.catalog.clearCache()
    val p = SparkEntry.queries("q_window_ntile")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"window family is join-free:\n$p")
    val windows = p.linesIterator.count(_.contains("Window ["))
    assert(windows === 1, s"all three rank functions must share ONE Window node:\n$p")
  }
}

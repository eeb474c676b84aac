package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking WITHOUT a single-partition window.
  *
  * `row_number() OVER (ORDER BY v, tie)` is the one plan shape in the
  * engine that cannot survive a 100× scale-up: every row streams through
  * ONE task. Four queries (q_gini, q_quantile_normalize, q_kendall_w,
  * q_trimmed_mean) used it deliberately on customer-bounded frames with a
  * documented swap path; this object IS that swap — the two-level
  * prefix-sum pattern already shipped for hash-ordered sums in
  * `Sampling.tokenBudgetMix`, adapted to VALUE ordering:
  *
  *  1. bucket boundaries: `buckets−1` approx-quantile cuts of the sort key
  *     (one map-side-combining aggregate to a 1-row frame, broadcast
  *     back) — balanced buckets by construction, no collect, no RNG;
  *  2. bucket offsets: per-bucket row counts roll up map-side into a
  *     ≤`buckets`-row frame whose prefix sums are a window over that TINY
  *     frame (schema-bounded by the `buckets` constant, never data-sized —
  *     the legitimate [[BoundedWindow]] case);
  *  3. exact rank = bucket offset (broadcast back) + `row_number` within
  *     the bucket — `buckets` uniform partitions, no hot task.
  *
  * Equality to the global `row_number` is structural: the bucket function
  * `#{boundary < v_double}` is monotone non-decreasing in the sort key
  * (double cast is monotone, strictness at boundaries irrelevant), so
  * bucket order extends value order; within-bucket ordering uses the
  * ORIGINAL sort key and tie-break, so concatenating buckets in order
  * reproduces the exact global permutation row-for-row regardless of
  * where the approximate boundaries land. RanksSpec asserts equality
  * against the naive global window on tied fixtures and real tables.
  *
  * Scale: with the default 256 buckets a 10-billion-row frame puts ~40 M
  * rows per ranking task; at true 100 TB pass `buckets = 64k`. The input
  * should be cheap to recompute or checkpointed by the caller — the frame
  * is read three times (boundaries, counts, ranking).
  *
  * Contract: `sortKey` must be numeric-castable and non-null (all four
  * call sites rank non-null aggregates); rank direction is ascending —
  * callers rank descending by negating the key.
  */
object Ranks {

  /** `df` plus a BIGINT column `out` = the 1-based global rank of each row
    * under `(sortKey ASC, tie ASC)` — exactly `row_number() OVER (ORDER BY
    * sortKey, tie)`, computed with no single-partition stage.
    */
  def withGlobalRank(df: DataFrame, sortKey: Column, tie: Column,
      out: String, buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 16),
      s"buckets must be in [2, 65536]: $buckets")
    val cols = df.columns.map(col).toIndexedSeq
    val keyed = df
      .withColumn("__rk_v", sortKey)
      .withColumn("__rk_vd", sortKey.cast("double"))
      .withColumn("__rk_t", tie)
    val probs = array((1 until buckets).map(i =>
      lit(i.toDouble / buckets)): _*)
    val bnds = keyed.agg(
      percentile_approx(col("__rk_vd"), probs, lit(10000)).as("__rk_bnds"))
    val bucketed = keyed.crossJoin(broadcast(bnds))
      .withColumn("__rk_b",
        coalesce(size(filter(col("__rk_bnds"), b => b < col("__rk_vd"))),
          lit(0)))
      .drop("__rk_bnds")
    // ≤ `buckets` rows: the ONLY ordered-prefix window in the pattern runs
    // over this constant-bounded frame
    val offsets = bucketed.groupBy("__rk_b")
      .agg(count(lit(1)).as("__rk_c"))
      .withColumn("__rk_off", coalesce(
        sum(col("__rk_c")).over(
          BoundedWindow.ordered(col("__rk_b"), col("__rk_b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__rk_b", "__rk_off")
    val wLocal = Window.partitionBy(col("__rk_b"))
      .orderBy(col("__rk_v"), col("__rk_t"))
    bucketed.join(broadcast(offsets), Seq("__rk_b"))
      .withColumn(out,
        (col("__rk_off") + row_number().over(wLocal)).cast("long"))
      .select(cols :+ col(out): _*)
  }
}

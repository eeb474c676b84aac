package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the warehouse ANALYZE / data-quality
  * surface: per-column null counts, exact distinct cardinalities, and
  * min/max, computed in ONE aggregate over one scan and reshaped to a
  * row-per-column profile with stack() (an Expand projection, no shuffle
  * beyond the aggregate's own).
  *
  * Scale shape: the multi-column exact COUNT(DISTINCT) plan is Spark's
  * Expand strategy — one scan, rows multiplied by |cols| BEFORE the
  * partial aggregate, so the shuffle carries per-column partial states
  * (bounded by cardinality), never raw rows twice. At 100 TB the exact
  * distinct count is the expensive knob: swap `count_distinct` for
  * `approx_count_distinct` (the q_approx_distinct HLL path, one pass and
  * no Expand) when the profile feeds monitoring rather than contracts.
  * min/max/null-count are cheap either way (pushed partials).
  *
  * Values surface as strings so heterogeneous column types share one
  * profile schema — the lingua franca of catalog stats tables; numeric,
  * date, and string renderings are cast-stable across engines (the
  * DuckDB oracle pins them).
  */
object Profile {

  /** One row per profiled column: (col_name, n_rows, n_nulls, n_distinct,
    * min_val, max_val). `cols` must exist on `df`; fails loudly otherwise
    * (the SnapshotDiff discipline — a silently skipped column would make
    * a drift check vacuous).
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"columnProfile: columns ${missing.mkString(", ")} not in frame " +
        s"(has: ${df.columns.mkString(", ")})")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`").mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${cols.length}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy("col_name")
  }
}

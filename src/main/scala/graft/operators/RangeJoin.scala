package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join (point-in-interval) — the other time/interval operator Spark
  * has no native physical strategy for: naively it plans an inequality
  * join as BroadcastNestedLoop/Cartesian, O(|P|·|I|).
  *
  * Bucketed composition instead: quantize the value axis with `bucketWidth`,
  * explode each interval onto the buckets it covers (intervals spanning b
  * buckets emit b rows — pick the width near the median interval length so
  * b stays small), give each point its single bucket, equi-join on the
  * bucket key, then apply the exact containment predicate. Cost:
  * |P| + Σ buckets(I) shuffled rows and a hash join — no pair blowup, skew
  * bounded by points-per-bucket.
  */
object RangeJoin {

  /** Join `points` to every interval containing them:
    * lo <= point <= hi. Output: all point columns + all interval columns.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")

    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    p.join(i, "__bucket")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: every (a, b) pair whose closed intervals
    * intersect — [aLo,aHi] ∩ [bLo,bHi] ≠ ∅, i.e. aLo <= bHi AND
    * bLo <= aHi (the SCD2-history × SCD2-history shape; Spark plans the
    * raw inequality join as a nested loop).
    *
    * Both sides explode onto the grid; a pair that shares several cells
    * would duplicate, so each pair is ATTRIBUTED to exactly one cell —
    * the first cell of the overlap region, `max(bucket(aLo), bucket(bLo))`
    * — with a cell-equality predicate instead of a post-join distinct
    * (dedup by construction: no second shuffle over the matched pairs).
    * Cost: Σ buckets(A) + Σ buckets(B) shuffled rows, hash equi-join,
    * exact predicate after.
    */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")

    val ae = a.withColumn("__a_first", bucketOf(col(aLo)))
      .withColumn("__bucket", explode(sequence(bucketOf(col(aLo)), bucketOf(col(aHi)))))
    val be = b.withColumn("__b_first", bucketOf(col(bLo)))
      .withColumn("__bucket", explode(sequence(bucketOf(col(bLo)), bucketOf(col(bHi)))))
    ae.join(be, "__bucket")
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__bucket") === greatest(col("__a_first"), col("__b_first")))
      .drop("__bucket", "__a_first", "__b_first")
  }
}

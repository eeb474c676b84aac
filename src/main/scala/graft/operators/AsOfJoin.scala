package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the LATEST right row with
  * right.ts <= left.ts within the same key (the time-series join Spark's
  * built-in operators don't express directly; the composition below is the
  * standard scale shape).
  *
  * Plan: tag and union both sides, one shuffle+sort on (key, ts, side),
  * then a last-non-null carry window — cost is a single sort-merge pass
  * over |L| + |R| rows. The naive alternative (equi-join on key + ts
  * inequality filter + per-left max) materializes every (left, earlier
  * right) pair first: quadratic per key, dead at 100 TB. Equal timestamps
  * match (right sorts before left at the same instant).
  */
object AsOfJoin {

  /** Left as-of join carrying `valueCols` from the matching right row.
    * Output: all left columns + `asof_<col>` for each value column (null
    * when no right row precedes the left row).
    *
    * Each carry slot is a single-field struct wrapping the value, not the
    * bare value: CreateNamedStruct is non-null by construction, so the
    * last-ignoreNulls carry keys on the struct and a right row whose
    * value is genuinely NULL still matches (and carries its NULL) instead
    * of being skipped in favor of an older row — DuckDB ASOF semantics
    * (r2 ADVICE fix).
    */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame =
    asOf(left, right, key, leftTs, rightTs, valueCols, forward = false)

  /** Forward as-of join — for each left row, the EARLIEST right row with
    * right.ts >= left.ts within the same key (the "next reading after the
    * event" direction). Same union+sort+carry shape as [[leftAsOf]], with
    * the carry window mirrored: frame [current, following], first-non-null
    * carry, and the right side ordered AFTER the left at equal timestamps
    * so an equal-instant right row still matches.
    */
  def leftAsOfForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame =
    asOf(left, right, key, leftTs, rightTs, valueCols, forward = true)

  /** Nearest as-of join — for each left row, whichever right row (same
    * key) is temporally CLOSEST, in either direction; equal distances go
    * backward (pandas `merge_asof(direction='nearest')` semantics).
    *
    * ONE union + shuffle + sort serves BOTH directions: the backward carry
    * (last-non-null over the preceding frame) and the forward carry
    * (first-non-null over the following frame) ride the same
    * (key, ts, side, rid) sort order — one Exchange, one Sort, two Window
    * frame passes, never a join. Right rows sort BEFORE left rows at equal
    * instants, so an equal-ts right row is claimed by the backward carry
    * at distance 0, which wins every tie by definition.
    *
    * Output: all left columns + `asof_<col>` per value column + signed
    * `asof_dt_us` (left − matched-right in microseconds: ≥ 0 when the
    * match is backward, < 0 when forward, null when no right row exists
    * for the key).
    */
  def leftAsOfNearest(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val bSlots = valueCols.map(v => v -> s"__b_$v")
    val fSlots = valueCols.map(v => v -> s"__f_$v")
    def slotType(v: String) = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", right.schema(v).dataType)))
    val lSide = (bSlots ++ fSlots).foldLeft(
        left.withColumn("__side", lit(1)).withColumn("__ts", col(leftTs))
          .withColumn("__rid", lit(null).cast("long"))) {
      case (df, (v, slot)) => df.withColumn(slot, lit(null).cast(slotType(v)))
    }
    val rBase = right.select(
      (Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
        xxhash64(right.columns.map(col): _*).as("__rid")) ++
        (bSlots ++ fSlots).map { case (v, slot) =>
          struct(col(v).as("v")).as(slot) }): _*)
    val rSide = lSide.columns.foldLeft(rBase) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(lSide.schema(c).dataType))
    }
    val base = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__rid"))
    val wB = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rightTsOnly = when(col("__side") === 0, col("__ts"))
    val withCarries = bSlots.foldLeft(
        fSlots.foldLeft(lSide.unionByName(rSide)) { case (df, (_, slot)) =>
          df.withColumn(slot, first(col(slot), ignoreNulls = true).over(wF))
        }) { case (df, (_, slot)) =>
        df.withColumn(slot, last(col(slot), ignoreNulls = true).over(wB))
      }
      .withColumn("__b_ts", max(rightTsOnly).over(wB))
      .withColumn("__f_ts", min(rightTsOnly).over(wF))
    val dtB = unix_micros(col("__ts")) - unix_micros(col("__b_ts"))
    val dtF = unix_micros(col("__f_ts")) - unix_micros(col("__ts"))
    val pickB = col("__f_ts").isNull ||
      (col("__b_ts").isNotNull && dtB <= dtF)
    val chosen = valueCols.foldLeft(
        withCarries.where(col("__side") === 1)) { case (df, v) =>
      df.withColumn(s"asof_$v",
        when(pickB, col(s"__b_$v").getField("v"))
          .otherwise(col(s"__f_$v").getField("v")))
    }
    chosen
      .withColumn("asof_dt_us",
        when(col("__b_ts").isNull && col("__f_ts").isNull, lit(null).cast("long"))
          .when(pickB, dtB).otherwise(-dtF))
      .drop((Seq("__side", "__ts", "__rid", "__b_ts", "__f_ts") ++
        (bSlots ++ fSlots).map(_._2)): _*)
  }

  private def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String],
      forward: Boolean): DataFrame = {
    val carry = valueCols.map(v => v -> s"__asof_$v")
    def slotType(v: String) = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", right.schema(v).dataType)))

    // at equal __ts the matching side must sort toward the left row's
    // carry frame: right BEFORE left (0 < 1) for backward, right AFTER
    // left (2 > 1) for forward — equality matches in both directions
    val rightTag = if (forward) 2 else 0
    // left side: original columns + null-typed carry slots
    val lSide = carry.foldLeft(
        left.withColumn("__side", lit(1)).withColumn("__ts", col(leftTs))
          .withColumn("__rid", lit(null).cast("long"))) {
      case (df, (v, slot)) => df.withColumn(slot, lit(null).cast(slotType(v)))
    }
    // right side: key + ts + populated carry slots; left-only columns null.
    // __rid is a content hash of the FULL right row: when several right
    // rows tie on (key, ts) the window order below would otherwise leave
    // the winner unspecified (partition-order-dependent — r6 ADVICE); the
    // hash makes the pick deterministic run-to-run: the max-hash row wins
    // backward, the min-hash row forward. (DuckDB's native ASOF is equally
    // unspecified under ties, so the cross-engine oracle additionally
    // relies on unique (key, ts) on the right — which the fixtures hold.)
    val rBase = right.select(
      (Seq(col(key), col(rightTs).as("__ts"), lit(rightTag).as("__side"),
        xxhash64(right.columns.map(col): _*).as("__rid")) ++
        carry.map { case (v, slot) =>
          struct(col(v).as("v")).as(slot) }): _*)
    val rSide = lSide.columns.foldLeft(rBase) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(lSide.schema(c).dataType))
    }

    val base = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__rid"))
    val w =
      if (forward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def pick(c: org.apache.spark.sql.Column) =
      if (forward) first(c, ignoreNulls = true) else last(c, ignoreNulls = true)
    val carried = carry.foldLeft(lSide.unionByName(rSide)) { case (df, (_, slot)) =>
      df.withColumn(slot, pick(col(slot)).over(w))
    }
    carry.foldLeft(
        carried.where(col("__side") === 1).drop("__side", "__ts", "__rid")) {
      case (df, (v, slot)) =>
        df.withColumn(s"asof_$v", col(slot).getField("v")).drop(slot)
    }
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing (CDC between two materializations of a table):
  * classify every key as insert / delete / update / unchanged with ONE
  * full-outer join on the key — the canonical change-capture shape for
  * log/snapshot warehouses (the reference's feature and prediction tables
  * are fully-recomputed snapshots; diffing consecutive runs is how a
  * downstream consumer turns them back into a change stream).
  *
  * Scale shape: a single key-partitioned sort-merge join; value comparison
  * is null-safe (`<=>`) per column, so no hashing pass and no second scan.
  * Emits only CHANGED rows — the common case (mostly-unchanged snapshots)
  * returns a small frame from a big join, and the filter sits directly on
  * the join output (no materialization of the unchanged majority).
  */
object SnapshotDiff {

  /** Rows of `next` vs `base`, classified. Output: key columns +
    * `change` ∈ {'insert', 'delete', 'update'}; unchanged rows are
    * filtered out. `compareCols` defaults to every non-key column the two
    * frames share.
    */
  def diff(base: DataFrame, next: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val cmp = if (compareCols.nonEmpty) compareCols
      else base.columns.toSeq.filter(c =>
        !keyCols.contains(c) && next.columns.contains(c))
    val b = base.select(
      keyCols.map(col) ++ cmp.map(c => col(c).as(s"__b_$c")) :+ lit(1).as("__b"): _*)
    val n = next.select(
      keyCols.map(col) ++ cmp.map(c => col(c).as(s"__n_$c")) :+ lit(1).as("__n"): _*)
    val changed = cmp.map(c => !(col(s"__b_$c") <=> col(s"__n_$c")))
      .foldLeft(lit(false))(_ || _)
    b.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(col("__b").isNull, "insert")
          .when(col("__n").isNull, "delete")
          .when(changed, "update"))
      .where(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}

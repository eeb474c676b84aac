package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window specs over frames that are BOUNDED by construction — post-limit
  * top-k slices, per-source report frames, decile-bin summaries. A
  * partition-less `Window.orderBy(...)` is the right plan for these (the
  * whole frame fits trivially in one task), but `WindowExec` logs "No
  * Partition Defined for Window operation! Moving all data to a single
  * partition" on every run — and a literal key (`partitionBy(lit(0))`)
  * doesn't help because Catalyst constant-folds it straight back out of
  * the partition spec (verified on 4.1.2: the Window node's spec is empty
  * again after optimization).
  *
  * `key(anchor)` builds a key that is CONSTANT for every row yet anchored
  * on a data column, so the optimizer cannot fold it away: the plan keeps
  * a real partitionSpec (one hash partition holds the whole bounded
  * frame — execution identical to the partition-less form) and the
  * spurious warning disappears from driver logs, where it reads as an
  * unbounded global sort. Use ONLY where the input frame's size is bounded
  * independent of corpus scale; unbounded global windows should stay
  * partition-less so the warning fires honestly.
  */
object BoundedWindow {

  /** Constant-valued, non-foldable partition key: `pmod(hash(anchor), 1)`
    * ≡ 0 for every row. `hash` accepts any type, never fails under ANSI,
    * and never returns NULL, and Catalyst has no rule that folds the pmod
    * away — every row lands in one partition, same as SinglePartition.
    */
  def key(anchor: Column): Column = pmod(hash(anchor), lit(1))

  /** A whole-frame spec (the `SUM(x) OVER ()` shape) over a bounded frame. */
  def whole(anchor: Column): WindowSpec = Window.partitionBy(key(anchor))

  /** An ordered spec (the `row_number() OVER (ORDER BY …)` shape) over a
    * bounded frame.
    */
  def ordered(anchor: Column, by: Column*): WindowSpec =
    Window.partitionBy(key(anchor)).orderBy(by: _*)
}

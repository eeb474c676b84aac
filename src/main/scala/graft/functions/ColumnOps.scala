package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level helpers for higher-order-function pipelines.
  *
  * Spark evaluates interpreted HOF lambdas per element, and a lambda BODY
  * that references an outer expression re-evaluates that expression on
  * every element (no common-subexpression elimination in interpreted
  * eval). `transform(seq, i => slice(split(text), i, k))` therefore
  * re-splits the whole text once per position — an accidental O(n²).
  *
  * `bind` routes a value through a single-element array + lambda variable:
  * the bound expression is evaluated exactly once, and every reference to
  * the lambda variable inside the body is a constant-time read. This is
  * the expression-tree analogue of a `let`-binding.
  */
object ColumnOps {

  /** let-bind: evaluate `c` once, use it many times inside `f`. */
  def bind(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)
}

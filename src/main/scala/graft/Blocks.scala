package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of block-manager state.
  *
  * Several operators (Dedup LSH/simhash, Ann.cosineNearDuplicates,
  * connectedComponents) `localCheckpoint` an intermediate frame because the
  * result plan reads it from BOTH sides of a self-join — re-running the
  * signature/bucket lineage per branch is strictly worse at any scale. The
  * checkpointed blocks, however, must outlive the operator call (the
  * returned frame is lazy), so the operator itself cannot unpersist them.
  * Left to the GC/ContextCleaner, blocks from back-to-back operator calls
  * ratchet storage memory up for the session's lifetime — exactly the
  * cross-query contamination the round-3 bench recorded (joins at 8-10 s
  * that run in 0.5-1.1 s in a fresh session).
  *
  * The release story is therefore explicit and two-level:
  *  - [[releaseCheckpoint]] — surgical: drop the materialized RDDs behind
  *    one frame once its terminal action has run (used per-round inside
  *    iterative algorithms, where the previous round's blocks are provably
  *    dead).
  *  - [[releaseAll]] — session sweep: after a query's terminal action,
  *    clear the SQL cache and every persisted RDD (cache + localCheckpoint
  *    both pin blocks through the same mechanism). Bench/Verify call this
  *    between queries so each measurement starts from a clean block
  *    manager; a long-lived service should call it at request boundaries.
  */
object Blocks {

  /** Unpersist the materialized RDDs behind a `localCheckpoint`ed frame
    * (including frames derived from one by projection). Safe to call only
    * after the last action that reads the frame — locally-checkpointed
    * blocks ARE the data; recomputation is impossible once they are gone.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Drop the SQL cache and every persisted RDD in the session's context.
    * Returns the number of persisted RDDs swept (post-clearCache), so
    * callers can assert a clean slate.
    *
    * Blocking: callers sit OUTSIDE timed regions (Bench/Verify sweep
    * between queries), and a non-blocking sweep races its block removal
    * into the NEXT measurement — the r5 bench's irreproducible per-query
    * spikes are consistent with exactly that. Waiting here moves the
    * removal cost into the untimed gap where it belongs. */
  def releaseAll(spark: SparkSession): Int = {
    spark.catalog.clearCache()
    val rdds = spark.sparkContext.getPersistentRDDs
    rdds.valuesIterator.foreach(_.unpersist(blocking = true))
    rdds.size
  }
}

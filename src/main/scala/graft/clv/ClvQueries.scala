package graft.clv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sources
import graft.operators.Rfm

/** Harness entries for the model surface (M1–M5). Not SQL-expressible, so
  * there is no oracle entry — the driver records a rows-only check; the
  * numeric fidelity is covered by the ScalaTest suite instead (SURVEY §5).
  */
object ClvQueries {

  /** RFM features from `orders` → full reference scoring path →
    * predicted_clv-shaped output. One groupBy shuffle for features, a
    * compressed-stats collect for the two fits, then a shuffle-free scoring
    * projection.
    */
  def clvScores(s: SparkSession, dir: String): DataFrame = {
    // cache: the features feed the empty-guard and both fit compressions —
    // all EAGER actions inside runClvLogic — so the RFM aggregate runs once
    // for the three of them. The try/finally releases the cache before
    // return (r3 ADVICE: the leak ratcheted block-manager memory up per
    // invocation); the returned lazy projection then recomputes the RFM
    // aggregate once at sink time — one shuffle, the price of a query that
    // leaves zero session state behind.
    val feats = Rfm.customerFeatures(Sources.table(s, dir, "orders"),
      to_date(lit("2001-08-02")), "o_custkey", "o_orderdate", "o_totalprice")
      .cache()
    try {
      val scored = ClvModel.runClvLogic(ClvModel.prepare(feats))
      ClvModel.outputColumns(scored).orderBy("customer_id")
    } finally feats.unpersist()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clv_scores" -> (clvScores _)
  )
}

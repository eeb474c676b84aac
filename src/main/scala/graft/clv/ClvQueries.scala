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
    // cache: the features feed the empty-guard, both fit compressions, and
    // the scoring projection — without it the RFM aggregate re-runs 4×
    val feats = Rfm.customerFeatures(Sources.table(s, dir, "orders"),
      to_date(lit("2001-08-02")), "o_custkey", "o_orderdate", "o_totalprice")
      .cache()
    val scored = ClvModel.runClvLogic(ClvModel.prepare(feats))
    ClvModel.outputColumns(scored).orderBy("customer_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clv_scores" -> (clvScores _)
  )
}

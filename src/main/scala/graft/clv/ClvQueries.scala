package graft.clv

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sources
import graft.operators.Rfm

/** Harness entries for the model surface (M1–M5). The fitted scores are
  * not SQL-expressible, so the harness entry is an envelope contract (see
  * [[clvContract]]); numeric fidelity is covered by FitSpec/GoldenParitySpec
  * (SURVEY §5).
  */
object ClvQueries {

  /** RFM features from `orders` → full reference scoring path →
    * predicted_clv-shaped output. One groupBy shuffle for features, a
    * compressed-stats collect for the two fits, then a shuffle-free scoring
    * projection.
    */
  def clvScores(s: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: the features feed the empty-guard, both fit
    // compressions (eager actions inside runClvLogic) AND the returned
    // lazy scoring projection. The r17 shape cache()d + unpersisted in a
    // finally, which made the sink-time projection RECOMPUTE the whole RFM
    // aggregate (two identical scan+groupBy subtrees in the measured run).
    // One eager materialization serves all four readers; the blocks ride
    // the SparkEntry block-manager contract (callers sweep via
    // Blocks.releaseAll after the terminal action — Bench/Verify/Pipeline
    // all do), so nothing ratchets across queries (the r3 leak stays fixed).
    val feats = Rfm.customerFeatures(Sources.table(s, dir, "orders"),
      to_date(lit("2001-08-02")), "o_custkey", "o_orderdate", "o_totalprice")
      .localCheckpoint()
    val scored = ClvModel.runClvLogic(ClvModel.prepare(feats))
    ClvModel.outputColumns(scored).orderBy("customer_id")
  }

  /** Envelope-contract form of the scoring surface (the q_approx_distinct
    * pattern): the per-customer SCORES are MLE-fit outputs no SQL engine
    * reproduces (their absolute values are pinned by GoldenParitySpec
    * against published CDNOW numbers instead), but the scoring CONTRACT is
    * SQL-expressible — the scored population is exactly the returning
    * customers (frequency = distinct purchase days − 1 > 0, monetary > 0;
    * reference: dags/clv_models.py:47–50), every score is finite, and the
    * quality-fix flags are consistent with the clipped clv (negatif flag ⇒
    * clv floored to 0; outlier flag ⇔ clv > 1e6). DuckDB recomputes the
    * population count from `orders` and returns the flags as constants.
    */
  private def clvContract(s: SparkSession, dir: String): DataFrame = {
    val scored = clvScores(s, dir)
    val finite = (c: Column) => !isnan(c) && !c.isNull &&
      abs(c) < lit(Double.PositiveInfinity)
    scored.agg(
      count(lit(1)).as("n_scored"),
      min(finite(col("predicted_purchases")) && finite(col("predicted_avg_value")) &&
        finite(col("clv"))).cast("long").as("all_finite"),
      min(col("clv") >= 0 &&
        (col("negatif_clv_flag") === 0 || col("clv") === 0)).cast("long").as("neg_flag_ok"),
      min((col("outliners_flag") === 1) === (col("clv") > 1000000)).cast("long")
        .as("outlier_flag_ok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clv_scores" -> (clvContract _)
  )

  val oracleSql: Map[String, String] = Map(
    "q_clv_scores" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
        |  CAST(1 AS BIGINT) AS all_finite, CAST(1 AS BIGINT) AS neg_flag_ok,
        |  CAST(1 AS BIGINT) AS outlier_flag_ok
        |FROM (
        |  SELECT o_custkey FROM orders GROUP BY o_custkey
        |  HAVING COUNT(DISTINCT o_orderdate) - 1 > 0 AND AVG(o_totalprice) > 0
        |)""".stripMargin
  )
}

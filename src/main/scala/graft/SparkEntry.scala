package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one named entry per implemented operator family;
  * `oracleSql` holds the DuckDB-equivalent SQL for each SQL-expressible
  * entry. Implementations live in the domain objects under
  * graft.operators / graft.clv / graft.text / graft.dedup / graft.similarity.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The RFM-T customer-feature aggregate — the reference's core transform
    * (reference: dags/clv_data_dag.py:80–93).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_rfm_features")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Block-manager contract: a few entries (q_freq_items, q_gap_fill,
    * q_clv_scores' feature frame) `cache()` a small intermediate that the
    * RETURNED lazy frame still reads, so the query function itself cannot
    * unpersist it. Callers that invoke entries back-to-back in one session
    * must sweep between terminal actions via [[graft.Blocks.releaseAll]]
    * (Bench and Verify both do); otherwise cached blocks accumulate for
    * the session's lifetime.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.operators.Relational.queries ++
      graft.operators.Graph.queries ++
      graft.operators.LlmQueries.queries ++
      graft.operators.Analytics.queries ++
      graft.operators.Curation.queries ++
      graft.operators.Evaluation.queries ++
      graft.operators.Incremental.queries ++
      graft.operators.Timeseries.queries ++
      graft.operators.Stats.queries ++
      graft.clv.ClvQueries.queries ++
      graft.sim.SimQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.operators.Relational.oracleSql ++
      graft.operators.Graph.oracleSql ++
      graft.operators.LlmQueries.oracleSql ++
      graft.operators.Analytics.oracleSql ++
      graft.operators.Curation.oracleSql ++
      graft.operators.Evaluation.oracleSql ++
      graft.operators.Incremental.oracleSql ++
      graft.operators.Timeseries.oracleSql ++
      graft.operators.Stats.oracleSql ++
      graft.clv.ClvQueries.oracleSql ++
      graft.sim.SimQueries.oracleSql
}

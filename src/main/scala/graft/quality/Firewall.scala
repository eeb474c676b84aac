/** The data-quality "firewall" (reference: dags/validate_features.py —
  * README.md:21–24 calls it the gate that blocks CLV scoring on bad data).
  *
  * Brain/arms split preserved for testability (reference docstring
  * validate_features.py:31–33; README.md:58): `runValidationChecks` is pure
  * scalar logic with the reference's exact messages; `validateFeatures` is
  * the I/O layer that computes the scalars with DataFrame queries and calls
  * the brain.
  *
  * Scale: the arms make ONE pass over the features frame (countDistinct +
  * the negativity sum in a single aggregate — the round-1 double-aggregate
  * was flagged `weak` and is collapsed here) and one pass over staging for
  * the raw distinct count. Both are partial-aggregated before their single
  * shuffle; outputs are 3 scalars.
  */
package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

final case class ValidationScalars(rawCount: Long, featureCount: Long, invalidCount: Long)

object Firewall {

  /** Column contract — set-based, and (faithfully to the reference) using
    * upper-case `T` where the model path expects lower-case `t`
    * (validate_features.py:16 vs clv_models.py:47).
    */
  val requiredColumns: Set[String] =
    Set("customer_id", "recency", "T", "frequency", "monetary_value", "first_purchase", "last_purchase")

  /** THE BRAIN (reference: dags/validate_features.py:3–26). Pure logic over
    * pre-fetched scalars; raises with the reference's exact messages:
    *   ratio < 0.95            → "DATA LOSS: xx.xx% migrated."
    *   missing required column → "SCHEMA ERROR: Missing ..."
    *   any negative feature row → "SANITY ERROR: n negative rows found."
    */
  def runValidationChecks(
      rawC: Long, featC: Long, invalidCount: Long, actualCols: Set[String]): Boolean = {
    val ratio = if (rawC > 0) featC.toDouble / rawC else 0.0
    if (ratio < 0.95)
      throw new IllegalArgumentException(f"DATA LOSS: ${ratio * 100}%.2f%% migrated.")

    val missing = requiredColumns -- actualCols
    if (missing.nonEmpty)
      throw new IllegalArgumentException(s"SCHEMA ERROR: Missing ${missing.mkString("{", ", ", "}")}")

    if (invalidCount > 0)
      throw new IllegalArgumentException(s"SANITY ERROR: $invalidCount negative rows found.")
    true
  }

  /** THE ARMS & LEGS (reference: dags/validate_features.py:29–69), on
    * DataFrames instead of BigQuery round-trips. One aggregate per table.
    */
  def computeScalars(staging: DataFrame, features: DataFrame,
      rawIdCol: String = "CustomerID", featIdCol: String = "customer_id"): ValidationScalars = {
    val rawC = staging.agg(countDistinct(col(rawIdCol)).as("raw_count"))
      .first().getLong(0)
    // feature_count and invalid_count share one pass over features.
    val featRow = features.agg(
      countDistinct(col(featIdCol)).as("feature_count"),
      sum(when(col("t") < 0 || col("frequency") < 0 || col("recency") < 0 ||
        col("monetary_value") < 0, 1L).otherwise(0L)).as("invalid_count"))
      .first()
    ValidationScalars(rawC, featRow.getLong(0), Option(featRow.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
  }

  /** End-to-end gate: compute scalars, introspect schema (S9), run brain.
    * Returns "Validation Success" exactly like the reference (:69).
    * The features frame carries lower-case `t`; the brain's set check wants
    * `T`, so schema introspection maps it back — the same dance the
    * reference does between BQ's case-insensitive schema and pandas.
    */
  def validateFeatures(staging: DataFrame, features: DataFrame): String = {
    val s = computeScalars(staging, features)
    val actualCols = features.schema.fieldNames.toSet
      .map((c: String) => if (c == "t") "T" else c)
    runValidationChecks(s.rawCount, s.featureCount, s.invalidCount, actualCols)
    "Validation Success"
  }
}

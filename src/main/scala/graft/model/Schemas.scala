package graft.model

import org.apache.spark.sql.types._
import java.sql.{Date, Timestamp}

/** Typed row models + explicit StructTypes for the warehouse path.
  *
  * The reference declares every schema explicitly and disables autodetect
  * (reference: dags/clv_data_dag.py:19–25,73); we mirror that: inference is
  * never used on the warehouse path.
  */
final case class Transaction(
    CustomerID: Long,
    Quantity: Int,
    UnitPrice: Double,
    order_timestamp: Timestamp,
    TotalPurchase: Double)

/** RFM-T features, one row per customer (reference: dags/clv_data_dag.py:80–93). */
final case class CustomerFeatures(
    customer_id: Long,
    recency: Long,
    t: Long,
    frequency: Long,
    monetary_value: Double,
    first_purchase: Date,
    last_purchase: Date)

/** Model output (reference: dags/clv_models.py:93). */
final case class ClvScore(
    customer_id: Long,
    predicted_purchases: Double,
    predicted_avg_value: Double,
    clv: Double,
    negatif_clv_flag: Int,
    outliners_flag: Int)

object Schemas {

  /** transactions_staging (reference: dags/clv_data_dag.py:19–25). */
  val transactions: StructType = StructType(Seq(
    StructField("CustomerID", LongType, nullable = false),
    StructField("Quantity", IntegerType, nullable = false),
    StructField("UnitPrice", DoubleType, nullable = false),
    StructField("order_timestamp", TimestampType, nullable = false),
    StructField("TotalPurchase", DoubleType, nullable = false)))

  /** Permissive CSV-read schema absorbing the corpus quirks (SURVEY §1.4):
    * CustomerID is float-formatted ("209.0") in the three oldest files, so it
    * is read as double and cast to long downstream; timestamps carry
    * nanosecond precision + "+00:00" offsets and truncate to µs on parse.
    */
  val transactionsCsvRaw: StructType = StructType(Seq(
    StructField("CustomerID", DoubleType, nullable = true),
    StructField("Quantity", IntegerType, nullable = true),
    StructField("UnitPrice", DoubleType, nullable = true),
    StructField("order_timestamp", TimestampType, nullable = true),
    StructField("TotalPurchase", DoubleType, nullable = true)))

  val customerFeatures: StructType = StructType(Seq(
    StructField("customer_id", LongType, nullable = false),
    StructField("recency", LongType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("frequency", LongType, nullable = false),
    StructField("monetary_value", DoubleType, nullable = false),
    StructField("first_purchase", DateType, nullable = false),
    StructField("last_purchase", DateType, nullable = false)))

  /** Ordered column contract checked by the model path — order-sensitive,
    * unlike the firewall's set-based check (reference: dags/clv_models.py:47–49
    * vs dags/validate_features.py:16).
    */
  val modelInputColumns: Seq[String] =
    Seq("customer_id", "recency", "t", "frequency", "monetary", "first_purchase", "last_purchase")

  val predictedClv: StructType = StructType(Seq(
    StructField("customer_id", LongType, nullable = false),
    StructField("predicted_purchases", DoubleType, nullable = false),
    StructField("predicted_avg_value", DoubleType, nullable = false),
    StructField("clv", DoubleType, nullable = false),
    StructField("negatif_clv_flag", IntegerType, nullable = false),
    StructField("outliners_flag", IntegerType, nullable = false)))

  /** master_users (reference: dags/simulate_data.py:56–58). */
  val masterUsers: StructType = StructType(Seq(
    StructField("CustomerID", LongType, nullable = false)))
}

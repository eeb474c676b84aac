package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Catalog/metadata operations (SURVEY §2.1 S8/S9) over path-addressed
  * parquet tables — the reference's table-exists / create-empty-if-needed /
  * schema-introspection dance (reference: dags/simulate_data.py:62–73,
  * dags/clv_data_dag.py:69, dags/validate_features.py:58–59).
  */
object Catalog {

  def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Idempotent DDL (C4): write an empty frame with the declared schema if
    * the table doesn't exist yet — `exists_ok=True` semantics.
    */
  def createIfNotExists(spark: SparkSession, path: String, schema: StructType): Unit =
    if (!tableExists(spark, path))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(path)

  /** Schema introspection (S9): table column names, as the validation layer
    * reads them (reference: dags/validate_features.py:58–59).
    */
  def fieldNames(spark: SparkSession, path: String): Set[String] =
    spark.read.parquet(path).schema.fieldNames.toSet

  /** Read table at `path` if present, else an empty frame with `schema`. */
  def readOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame =
    if (tableExists(spark, path)) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
}

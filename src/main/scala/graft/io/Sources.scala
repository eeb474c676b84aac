package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.model.Schemas

/** Sources/sinks (SURVEY §2.1, S1–S9).
  *
  * The reference's wire formats are CSV (generator → GCS) and BigQuery
  * tables; here the store is parquet on the local FS and CSV for the
  * reference corpus. All loads use explicit schemas — autodetect is
  * deliberately off, matching the reference (dags/clv_data_dag.py:73).
  */
object Sources {

  /** Scan one testdata table: `spark.read.parquet(dir/name.parquet)`.
    * Column pruning + predicate pushdown reach the parquet scan because the
    * schema comes from parquet metadata and filters stay declarative.
    *
    * `events.ts` has shipped in two physical layouts across testdata
    * generations: TIMESTAMP(NANOS) (read as long nanos via the legacy conf
    * and truncated to Spark's µs precision — the same truncation DuckDB
    * applies on cast) and TIMESTAMP(MICROS) without UTC adjustment (read as
    * TIMESTAMP_NTZ). Both normalize to a session-UTC TIMESTAMP here, so
    * every downstream query sees one canonical type regardless of which
    * generator wrote the files.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // nanosAsLong is set at session build (graft.Sessions); this is an
      // idempotent safety net for sessions built elsewhere, set before any
      // query in this lineage executes (not flipped mid-flight).
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // session tz is UTC (graft.Sessions), so this cast relabels the
          // same wall-clock instant — no offset arithmetic happens
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Ingest the reference CSV corpus (S3): explicit schema, header skipped,
    * float-formatted CustomerID absorbed via double→long cast, nanosecond
    * timestamps truncated to Spark's µs precision, session in UTC.
    * (reference: dags/clv_data_dag.py:58–75; quirks per SURVEY §1.4)
    */
  def referenceTransactionsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.transactionsCsvRaw)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSSSSS][XXX]")
      .option("mode", "PERMISSIVE")
      .csv(path)
      .withColumn("CustomerID", col("CustomerID").cast(LongType))

  /** Append-only staging write (reference WRITE_APPEND, dags/clv_data_dag.py:68). */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Snapshot write (reference CREATE OR REPLACE / WRITE_TRUNCATE,
    * dags/clv_data_dag.py:80, dags/clv_models.py:96–97).
    */
  def overwriteParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** CSV sink (S1: the generator's batch file, header on, no index column —
    * reference: dags/simulate_data.py:233).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}

package graft

import org.apache.spark.sql.SparkSession

/** One place to build the local session so every entry point (Bench, Verify,
  * Pipeline, tests) runs with identical, scale-minded settings.
  */
object Sessions {

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS), which vanilla Spark rejects;
      // reading it as long nanos is a session-wide decision made HERE, once,
      // not mid-query (round-1 set it inside Sources.table on every read —
      // flagged as racey session-state mutation).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // engine extension functions (native codegen expressions)
    graft.clv.Hyp2f1Expression.register(spark)
    graft.similarity.VecOps.register(spark)
    graft.dedup.DedupKernels.register(spark)
    spark
  }
}

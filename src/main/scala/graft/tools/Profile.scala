package graft.tools

/** Scratch profiler: run named queries N times each, print per-run secs —
  * separates per-query plan/codegen/JVM-warmup cost (run 1) from steady
  * state (runs 2-3) when deciding what is actually worth optimizing.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_ann_brute", "q_clv_scores", "q_lang_id")
    val spark = graft.Sessions.local()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}

package graft.tools

import graft.Sessions

/** Print or dump the formatted physical plan of harness queries — the
  * .explain feedback loop from the brief, wired to the harness surface.
  *
  *  - `runMain graft.tools.PlanProbe <query> [sfDir]` — print one plan.
  *  - `runMain graft.tools.PlanProbe --out <dir> <suffix> <q1,q2,..> [sfDir]`
  *    — write `<dir>/<query>_<suffix>.txt` per query in ONE JVM (the r17
  *    plans/ evidence workflow: before/after files for every touched query
  *    without paying a session spin-up per plan).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--out")) {
      val outDir = args(1)
      val suffix = args(2)
      val names = args(3).split(",").toSeq
      val dir = if (args.length > 4) args(4) else "/root/testdata/sf0.1"
      val spark = Sessions.local()
      new java.io.File(outDir).mkdirs()
      names.foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        graft.Blocks.releaseAll(spark)
        System.err.println(s"[plan] wrote $outDir/${name}_$suffix.txt")
      }
      spark.stop()
    } else {
      val name = args(0)
      val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
      val spark = Sessions.local()
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
      spark.stop()
    }
  }
}

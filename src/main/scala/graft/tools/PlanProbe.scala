package graft.tools

import graft.Sessions

/** Print the formatted physical plan of one harness query:
  * `runMain graft.tools.PlanProbe <query> [sfDir]`. The .explain feedback
  * loop from the brief, wired to the harness surface.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local()
    graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}

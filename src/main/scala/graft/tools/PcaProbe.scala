package graft.tools

import graft.Sessions
import graft.io.Sources
import graft.similarity.Pca

/** Measures the PCA explained-variance profile at every SF so the q_pca
  * contract floors are set from evidence (the RecallProbe discipline:
  * floors = measured min − margin, re-measured whenever testdata changes).
  */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = Sources.table(spark, s"/root/testdata/$sf", "embeddings")
      val m = Pca.fit(emb, "embedding")
      val evr = m.eigenvalues.map(_ / m.trace)
      val pv = Pca.projectionVariances(emb, "embedding", m, 8)
      val maxDev = (0 until 8).map(i => math.abs(pv(i) - m.eigenvalues(i))).max
      println(f"$sf%8s n=${m.n}%6d evr1=${evr(0)}%.4f cum8=${evr.take(8).sum}%.4f " +
        f"cum16=${evr.take(16).sum}%.4f projvar_maxdev=${maxDev}%.3e " +
        f"lam1=${m.eigenvalues(0)}%.6e trace=${m.trace}%.6e")
    }
    spark.stop()
  }
}

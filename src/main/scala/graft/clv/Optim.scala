package graft.clv

/** Shared optimizer-support utilities. */
object Optim {

  /** Sum (ll, w) partials over [0, n) split into fixed 1024-element chunks,
    * evaluated in parallel but REDUCED IN CHUNK ORDER — results are
    * bit-identical to a sequential left fold over the same chunking, run
    * after run, regardless of thread scheduling. Small inputs stay on the
    * calling thread.
    */
  def chunkedParallelSum(n: Int)(chunk: (Int, Int) => (Double, Double)): (Double, Double) = {
    val chunkSize = 1024
    if (n <= chunkSize) chunk(0, n)
    else {
      val bounds = (0 until n by chunkSize).map(s => (s, math.min(s + chunkSize, n)))
      val partials = new Array[(Double, Double)](bounds.length)
      java.util.stream.IntStream.range(0, bounds.length).parallel().forEach { ci =>
        partials(ci) = chunk(bounds(ci)._1, bounds(ci)._2)
      }
      var ll = 0.0
      var w = 0.0
      var i = 0
      while (i < partials.length) { ll += partials(i)._1; w += partials(i)._2; i += 1 }
      (ll, w)
    }
  }
}

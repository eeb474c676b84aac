package graft

import org.apache.spark.sql.Observation

/** Bounded read of an [[Observation]]'s metrics.
  *
  * `Observation.get` blocks until the attached action's metrics are
  * delivered over the listener bus — normally sub-millisecond after the
  * action returns (measured: eager `localCheckpoint` delivers reliably),
  * but unbounded by API contract. Iterative operators that fold their
  * convergence signal into a checkpoint job (see
  * `Dedup.connectedComponents`) must not hang the driver on a listener-bus
  * anomaly, so reads go through this helper: a bounded wait that returns
  * None on timeout, letting the caller fall back to an explicit job.
  */
object Observe {

  def metric(obs: Observation, key: String, timeoutMs: Long = 10000L): Option[Long] = {
    @volatile var res: Option[Long] = None
    val th = new Thread(() => {
      // Observation.get blocks; values of count() metrics are Longs
      res = obs.get.get(key).map(_.asInstanceOf[Number].longValue())
    })
    th.setDaemon(true) // a timed-out reader must not pin JVM shutdown
    th.start()
    th.join(timeoutMs)
    res
  }

  /** Same bounded read for floating-point metrics (sum/avg observations —
    * e.g. the pagerank L1 residual). */
  def metricDouble(obs: Observation, key: String, timeoutMs: Long = 10000L): Option[Double] = {
    @volatile var res: Option[Double] = None
    val th = new Thread(() => {
      res = obs.get.get(key).map(_.asInstanceOf[Number].doubleValue())
    })
    th.setDaemon(true)
    th.start()
    th.join(timeoutMs)
    res
  }
}

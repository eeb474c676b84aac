package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fitted L2-regularized logistic model over a fixed feature list.
  *
  * Scoring is pure column arithmetic (standardize → dot → sigmoid), so it
  * compiles into whole-stage codegen as a shuffle-free projection — the
  * model "deploys" as an expression, exactly like the CLV scoring path
  * (graft.clv.ClvModel) and the language-ID scorer. No UDF, no join.
  */
case class LogisticModel(featureCols: Seq[String], means: Array[Double],
    stds: Array[Double], weights: Array[Double], intercept: Double) {
  require(featureCols.length == weights.length && weights.length == means.length
    && means.length == stds.length, "model arity mismatch")

  /** P(label=1 | features) as a column over the named feature columns. */
  def probability: Column = {
    val z = featureCols.indices.map { i =>
      lit(weights(i)) * ((col(featureCols(i)).cast("double") - lit(means(i))) / lit(stds(i)))
    }.foldLeft(lit(intercept))(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** The frame with `quality_prob` and thresholded `quality_pred` added. */
  def score(df: DataFrame, threshold: Double = 0.5): DataFrame =
    df.withColumn("quality_prob", probability)
      .withColumn("quality_pred", (col("quality_prob") >= lit(threshold)).cast("long"))
}

/** Trainable corpus-quality classifier: L2-penalized logistic regression on
  * document statistics — the trainable rung above the heuristic
  * [[graft.text.TextOps.qualityScore]] gates, and the shape of the classic
  * "classifier-filtered corpus" stage (a linear model over cheap per-doc
  * features scoring every document; cf. the quality-classifier filtering
  * described publicly in GPT-3 appendix A and the CCNet pipeline paper).
  *
  * Optimization follows the repo's two-tier convention
  * (graft.clv.BetaGeo.fitFeatures):
  *  - features that fit the driver are collected ONCE in sorted order
  *    (bit-reproducible FP summation) and fitted locally;
  *  - above the cap, each gradient evaluation is one `treeAggregate` pass
  *    over the cached feature matrix — driver memory stays O(dim), the
  *    same iterate-over-the-cluster pattern Spark MLlib's own
  *    LogisticRegression uses (public), so the fit survives any corpus
  *    size the cluster survives.
  * The solver is plain gradient descent with Barzilai–Borwein steps — the
  * objective is convex and 5-10 dimensional, where BB converges in tens of
  * iterations without line-search bookkeeping.
  */
object QualityClassifier {

  /** Fit from a frame: `featureCols` numeric, `labelCol` in {0,1}. */
  def fit(df: DataFrame, featureCols: Seq[String], labelCol: String,
      l2: Double = 1e-3, maxIter: Int = 200, tol: Double = 1e-8,
      maxDriverRows: Long = 500000L): LogisticModel = {
    require(featureCols.nonEmpty, "need at least one feature column")
    val d = featureCols.length
    // one aggregation pass for the standardization constants; zero-variance
    // features get std=1 (their weight then just absorbs into the intercept
    // direction instead of dividing by zero)
    val statsRow = df.select(
      featureCols.flatMap(c => Seq(
        avg(col(c).cast("double")).as(s"m_$c"),
        stddev_pop(col(c).cast("double")).as(s"s_$c"))): _*).head()
    val means = Array.tabulate(d)(i => statsRow.getDouble(2 * i))
    val stds = Array.tabulate(d) { i =>
      val s = statsRow.getDouble(2 * i + 1); if (s > 1e-12) s else 1.0
    }
    val std = df.select(
      (col(labelCol).cast("double").as("y") +:
        featureCols.zipWithIndex.map { case (c, i) =>
          ((col(c).cast("double") - lit(means(i))) / lit(stds(i))).as(s"f$i")
        }): _*)
    // bounded probe, BetaGeo-style: limit(cap+1) both answers "fits the
    // driver?" and fetches the rows when it does; sorted for reproducible
    // FP summation order
    val capped = std.sort((0 to d).map(i => col(std.columns(i))): _*)
      .limit(maxDriverRows.toInt + 1).collect()
    val (w, b) =
      if (capped.length <= maxDriverRows) {
        val y = capped.map(_.getDouble(0))
        val x = capped.map(r => Array.tabulate(d)(i => r.getDouble(i + 1)))
        descend(d, maxIter, tol) { wb =>
          lossGrad(wb, l2, d, y.length.toLong) { (acc, dotF) =>
            var k = 0
            while (k < y.length) { dotF(acc, y(k), x(k)); k += 1 }
            acc
          }
        }
      } else {
        val rdd = std.rdd.map { r =>
          (r.getDouble(0), Array.tabulate(d)(i => r.getDouble(i + 1)))
        }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val n = rdd.count()
          descend(d, maxIter, tol) { wb =>
            lossGrad(wb, l2, d, n) { (zero, dotF) =>
              rdd.treeAggregate(zero)(
                seqOp = { case (acc, (y, x)) => dotF(acc, y, x); acc },
                combOp = { (a, c) =>
                  var i = 0; while (i < a.length) { a(i) += c(i); i += 1 }; a
                })
            }
          }
        } finally rdd.unpersist()
      }
    LogisticModel(featureCols, means, stds, w, b)
  }

  /** One (loss, gradient) evaluation. `sweep` folds every (y, x) row into
    * the accumulator `[lossSum, grad_0..grad_{d-1}, gradB]` via the
    * supplied per-row op — the same closure drives the local loop and the
    * treeAggregate, so the two fit paths share all FP arithmetic.
    */
  private[graft] def lossGrad(wb: Array[Double], l2: Double, d: Int, n: Long)(
      sweep: (Array[Double], (Array[Double], Double, Array[Double]) => Unit) => Array[Double])
      : (Double, Array[Double]) = {
    val dot = (acc: Array[Double], y: Double, x: Array[Double]) => {
      var z = wb(d)
      var i = 0
      while (i < d) { z += wb(i) * x(i); i += 1 }
      // stable softplus: log(1+e^z) without overflow on either sign
      val softplus = if (z > 0) z + math.log1p(math.exp(-z)) else math.log1p(math.exp(z))
      acc(0) += softplus - y * z
      val p = 1.0 / (1.0 + math.exp(-z))
      val err = p - y
      i = 0
      while (i < d) { acc(1 + i) += err * x(i); i += 1 }
      acc(1 + d) += err
      ()
    }
    val acc = sweep(new Array[Double](d + 2), dot)
    var loss = acc(0) / n
    val grad = new Array[Double](d + 1)
    var i = 0
    while (i < d) {
      loss += 0.5 * l2 * wb(i) * wb(i)
      grad(i) = acc(1 + i) / n + l2 * wb(i)
      i += 1
    }
    grad(d) = acc(1 + d) / n // intercept unpenalized, the usual convention
    (loss, grad)
  }

  /** Barzilai–Borwein gradient descent on the (d+1)-vector [w, b]. */
  private def descend(d: Int, maxIter: Int, tol: Double)(
      eval: Array[Double] => (Double, Array[Double])): (Array[Double], Double) = {
    var wb = new Array[Double](d + 1)
    var (_, g) = eval(wb)
    var step = 1.0
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val wbNext = Array.tabulate(d + 1)(i => wb(i) - step * g(i))
      val (_, gNext) = eval(wbNext)
      var sy = 0.0; var yy = 0.0; var gn = 0.0
      var i = 0
      while (i < d + 1) {
        val s = wbNext(i) - wb(i); val yv = gNext(i) - g(i)
        sy += s * yv; yy += yv * yv; gn += gNext(i) * gNext(i)
        i += 1
      }
      // BB2 step with safeguards: convex objective, but the first steps can
      // overshoot — clamp instead of line-searching
      step = if (yy > 1e-300) math.min(math.max(sy / yy, 1e-4), 1e4) else 1.0
      wb = wbNext; g = gNext
      converged = gn < tol
      it += 1
    }
    (wb.take(d), wb(d))
  }
}

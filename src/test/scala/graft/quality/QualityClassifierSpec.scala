package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {

  // linear ground truth in 2 features with deterministic 5%-ish flips:
  // the fit must recover the boundary and misclassify ~only the flips
  private def planted(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val f1 = (i % 97).toDouble / 97.0 - 0.5
      val f2 = (i % 53).toDouble / 53.0 - 0.5
      val clean = 2.0 * f1 - 1.0 * f2 > 0.0
      val flip = (i * 2654435761L % 100) < 5
      (i.toLong, f1, f2, if (clean != flip) 1L else 0L, if (clean) 1L else 0L)
    }.toDF("id", "f1", "f2", "label", "label_clean")
  }

  test("recovers a planted linear boundary through 5% label noise") {
    val df = planted(4000)
    val m = QualityClassifier.fit(df, Seq("f1", "f2"), "label")
    val scored = m.score(df)
    val accClean = scored
      .agg(avg((col("quality_pred") === col("label_clean")).cast("double")))
      .head().getDouble(0)
    assert(accClean >= 0.97, s"clean-boundary accuracy $accClean")
    // boundary direction: the planted rule weights f1 positively at ~2x
    // the magnitude of f2's negative weight (features already ~same scale)
    assert(m.weights(0) > 0 && m.weights(1) < 0,
      s"weight signs wrong: ${m.weights.toSeq}")
  }

  test("driver-side and treeAggregate fit paths agree") {
    val df = planted(1200)
    val local = QualityClassifier.fit(df, Seq("f1", "f2"), "label")
    val dist = QualityClassifier.fit(df, Seq("f1", "f2"), "label",
      maxDriverRows = 10L) // force the cluster-side gradient path
    // both optimize the same convex objective with the same row-level FP
    // ops; only summation order differs — probabilities must agree tightly
    val delta = local.score(df).select(col("id"), col("quality_prob").as("p1"))
      .join(dist.score(df).select(col("id"), col("quality_prob").as("p2")), "id")
      .agg(max(abs(col("p1") - col("p2")))).head().getDouble(0)
    assert(delta < 1e-4, s"fit paths diverge: max |dp| = $delta")
  }

  test("zero-variance feature does not poison the fit") {
    val df = planted(800).withColumn("f_const", lit(3.14))
    val m = QualityClassifier.fit(df, Seq("f1", "f2", "f_const"), "label")
    val acc = m.score(df)
      .agg(avg((col("quality_pred") === col("label_clean")).cast("double")))
      .head().getDouble(0)
    assert(acc >= 0.95, s"constant feature broke the fit: acc $acc")
    assert(m.weights.forall(w => java.lang.Double.isFinite(w)))
  }

  test("scoring is a shuffle-free projection") {
    val df = planted(100)
    val m = QualityClassifier.fit(df, Seq("f1", "f2"), "label")
    val plan = m.score(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"model scoring must not shuffle:\n$plan")
  }
}

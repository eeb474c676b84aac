package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("hash split: stable under data growth, fractions approximately honored") {
    import spark.implicits._
    val small = (0L until 500L).toDF("id")
    val big = (0L until 2000L).toDF("id")
    def assign(df: org.apache.spark.sql.DataFrame) =
      Sampling.hashSplit(df, col("id")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assign(small)
    val b = assign(big)
    // content-addressed: every row keeps its split when the corpus grows
    a.foreach { case (id, s) => assert(b(id) == s, s"row $id moved splits") }
    // fractions within sampling noise (binomial sd ≈ 0.9% at n=2000)
    val counts = b.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05, counts.toString)
    assert(math.abs(counts("val") / 2000.0 - 0.1) < 0.04, counts.toString)
    assert(math.abs(counts("test") / 2000.0 - 0.1) < 0.04, counts.toString)
  }

  test("weighted sample keeps per-group fractions and drops unlisted groups") {
    import spark.implicits._
    val df = (0L until 3000L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val kept = Sampling.weightedSample(df, col("id"), col("g"),
        Seq("g0" -> 1.0, "g1" -> 0.5))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("g2"), "unlisted group must be dropped")
    assert(kept("g0") >= 999, s"g0 should keep ~all 1000, got ${kept.get("g0")}")
    assert(math.abs(kept("g1") - 500) < 80, s"g1 should keep ~half, got ${kept.get("g1")}")
    // determinism: same rows survive on a rerun
    val again = Sampling.weightedSample(df, col("id"), col("g"),
        Seq("g0" -> 1.0, "g1" -> 0.5)).collect().map(_.getLong(0)).toSet
    val first = Sampling.weightedSample(df, col("id"), col("g"),
        Seq("g0" -> 1.0, "g1" -> 0.5)).collect().map(_.getLong(0)).toSet
    assert(again == first)
  }

  test("hash split boundaries quantize cumulative fractions to hex prefixes") {
    assert(Sampling.hexBoundary(0.8) == "cccccccc")
    assert(Sampling.hexBoundary(0.9) == "e6666666")
    assert(Sampling.hexBoundary(1.0) == "ffffffff")
    intercept[IllegalArgumentException](
      Sampling.splitColumn(col("x"), Seq("a" -> 0.5, "b" -> 0.4)))
  }
}

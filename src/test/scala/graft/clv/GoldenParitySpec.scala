package graft.clv

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-parity fixtures: the scoring formulas pinned against PUBLISHED
  * worked examples, not against our own implementation (FitSpec's recovery
  * tests verify shape; these verify absolute numbers an independent
  * implementation produced).
  *
  * Sources (public):
  *  - BG/NBD: Fader, Hardie & Lee (2005) "Counting Your Customers the Easy
  *    Way", CDNOW MLE (r, α, a, b) = (0.243, 4.414, 0.793, 2.426); the
  *    companion note's worked example — customer with x = 2, t_x = 30.43
  *    weeks, T = 38.86 weeks — expects 1.226 transactions over the next 39
  *    weeks (also the lifetimes library's documentation example).
  *  - Gamma-Gamma: Fader & Hardie (2013) "The Gamma-Gamma Model of Monetary
  *    Value", CDNOW MLE (p, q, γ) = (6.25, 3.74, 15.44); conditional mean
  *    E[M | m_x, x] = (γ + m_x·x)·p / (p·x + q − 1) evaluated by hand for
  *    m_x = 35.59, x = 2:  (15.44 + 71.18)·6.25 / (12.5 + 2.74)
  *    = 541.375 / 15.24 = 35.5233…
  */
class GoldenParitySpec extends SparkSpec {

  private val cdnowBg = BetaGeoParams(r = 0.243, alpha = 4.414, a = 0.793, b = 2.426)
  private val cdnowGg = GammaGammaParams(p = 6.25, q = 3.74, v = 15.44)

  test("scalar BG/NBD expected purchases reproduces the published CDNOW example") {
    val e = BetaGeo.expectedPurchases(cdnowBg, t = 39.0, x = 2.0, tx = 30.43, big = 38.86)
    // the published 1.226 is quoted to 3 dp from params themselves rounded
    // to 3 dp — 5e-3 absorbs that input rounding, nothing else
    assert(math.abs(e - 1.226) < 5e-3, s"E[X(39)|x=2,tx=30.43,T=38.86] = $e, expected 1.226")
  }

  test("the codegen column path (native hyp2f1) matches the published example too") {
    val e = spark.range(1)
      .select(ClvModel.expectedPurchasesCol(cdnowBg,
        lit(39.0), lit(2.0), lit(30.43), lit(38.86)).as("e"))
      .head().getDouble(0)
    assert(math.abs(e - 1.226) < 5e-3, s"column-path E = $e, expected 1.226")
    // and it agrees with the scalar path to FP noise, not just to 3 dp
    val scalar = BetaGeo.expectedPurchases(cdnowBg, 39.0, 2.0, 30.43, 38.86)
    assert(math.abs(e - scalar) < 1e-12)
  }

  test("integrated scoring pins the Gamma-Gamma conditional mean to the hand value") {
    import spark.implicits._
    val returning = Seq((1516L, 30.43, 38.86, 2.0, 35.59))
      .toDF("customer_id", "recency", "t", "frequency", "monetary")
    val out = ClvModel.score(returning, FittedClvModel(cdnowBg, cdnowGg))
      .select("predicted_avg_value", "predicted_purchases", "clv").head()
    assert(math.abs(out.getDouble(0) - 35.5233) < 1e-3,
      s"E[M|m=35.59,x=2] = ${out.getDouble(0)}, expected 35.5233")
    // 30-unit horizon: strictly less than the 39-unit figure, positive
    assert(out.getDouble(1) > 0 && out.getDouble(1) < 1.226)
    // CLV must compose exactly as predict(365) * E[M] * 0.99, with the
    // 365-unit expectation taken from the independent scalar path
    val e365 = BetaGeo.expectedPurchases(cdnowBg, 365.0, 2.0, 30.43, 38.86)
    assert(math.abs(out.getDouble(2) - e365 * out.getDouble(0) * 0.99) < 1e-9,
      s"clv ${out.getDouble(2)} != $e365 * ${out.getDouble(0)} * 0.99")
  }
}

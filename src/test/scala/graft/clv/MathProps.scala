package graft.clv

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the model math (SURVEY §5's property-test
  * plan) — sbt runs Properties suites natively alongside ScalaTest.
  */
object MathProps extends Properties("clv.math") {

  private val par = Gen.choose(0.1, 6.0)
  private val z = Gen.choose(0.0, 0.9)

  property("hyp2f1 symmetry in a,b") = Prop.forAll(par, par, par, z) { (a, b, c, zz) =>
    val lhs = Hyp2f1.hyp2f1(a, b, c, zz)
    val rhs = Hyp2f1.hyp2f1(b, a, c, zz)
    math.abs(lhs - rhs) <= 1e-10 * math.max(1.0, math.abs(lhs))
  }

  property("hyp2f1 monotone in z for positive params") =
    Prop.forAll(par, par, par, Gen.choose(0.0, 0.8)) { (a, b, c, zz) =>
      Hyp2f1.hyp2f1(a, b, c, zz + 0.05) >= Hyp2f1.hyp2f1(a, b, c, zz)
    }

  private val bgParams = for {
    r <- Gen.choose(0.3, 2.0); alpha <- Gen.choose(2.0, 20.0)
    a <- Gen.choose(0.3, 1.5); b <- Gen.choose(1.0, 4.0)
  } yield BetaGeoParams(r, alpha, a, b)

  property("expected purchases: nonnegative and monotone in horizon t") =
    Prop.forAll(bgParams, Gen.choose(1, 10), Gen.choose(10.0, 300.0)) { (p, x, tx) =>
      val big = tx + 30.0
      val e30 = BetaGeo.expectedPurchases(p, 30, x.toDouble, tx, big)
      val e365 = BetaGeo.expectedPurchases(p, 365, x.toDouble, tx, big)
      e30 >= -1e-12 && e365 >= e30 - 1e-12
    }

  property("expected purchases increase with recency (fresher customers buy more)") =
    Prop.forAll(bgParams, Gen.choose(2, 10)) { (p, x) =>
      val big = 200.0
      val recent = BetaGeo.expectedPurchases(p, 30, x.toDouble, 190.0, big)
      val stale = BetaGeo.expectedPurchases(p, 30, x.toDouble, 20.0, big)
      recent >= stale - 1e-12
    }

  property("Gamma-Gamma E[M|m,x] is a convex combination of m and the population mean") =
    Prop.forAll(Gen.choose(1.5, 8.0), Gen.choose(1.5, 8.0), Gen.choose(1.0, 40.0),
        Gen.choose(1, 20), Gen.choose(1.0, 500.0)) { (p, q, v, x, m) =>
      val g = GammaGammaParams(p, q, v)
      val e = GammaGamma.expectedAvgProfit(g, x.toDouble, m)
      val pop = p * v / (q - 1)
      val lo = math.min(m, pop) - 1e-9
      val hi = math.max(m, pop) + 1e-9
      Prop(q <= 1 || (e >= lo && e <= hi))
    }

  property("BG/NBD NLL is finite on valid observations") =
    Prop.forAll(Gen.choose(0, 15), Gen.choose(0.0, 300.0), Gen.choose(0.0, 60.0)) {
      (x, tx, extra) =>
        val obs = Array(BetaGeo.Obs(x.toDouble, if (x > 0) tx else 0.0, tx + extra + 1.0, 1.0))
        java.lang.Double.isFinite(BetaGeo.negLogLikelihood(Array(0.1, 0.1, 0.1, 0.1), obs, 0.1))
    }
}

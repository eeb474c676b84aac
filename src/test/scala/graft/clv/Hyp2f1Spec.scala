package graft.clv

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Numerical fidelity of the ₂F₁ series via closed-form identities
  * (Abramowitz & Stegun ch. 15) — the offline-cross-check strategy SURVEY
  * §7.3 calls for, since scipy isn't available in this container. Seeded
  * random sweeps stand in for scalacheck properties.
  */
class Hyp2f1Spec extends AnyFunSuite {
  import Hyp2f1.hyp2f1

  private def sweep(n: Int, seed: Long)(body: Random => Unit): Unit = {
    val rng = new Random(seed)
    (1 to n).foreach(_ => body(rng))
  }

  test("F(a,b;c;0) = 1") {
    sweep(200, 1) { r =>
      assert(hyp2f1(0.05 + r.nextDouble * 8, 0.05 + r.nextDouble * 8,
        0.05 + r.nextDouble * 8, 0.0) == 1.0)
    }
  }

  test("F(1,1;2;z) = -ln(1-z)/z") {
    sweep(200, 2) { r =>
      val z = 1e-6 + r.nextDouble * 0.95
      val expect = -math.log1p(-z) / z
      assert(math.abs(hyp2f1(1, 1, 2, z) - expect) < 1e-9 * math.abs(expect))
    }
  }

  test("F(a,b;b;z) = (1-z)^(-a)") {
    sweep(200, 3) { r =>
      val a = 0.05 + r.nextDouble * 8
      val b = 0.05 + r.nextDouble * 8
      val z = r.nextDouble * 0.95
      val expect = math.pow(1 - z, -a)
      assert(math.abs(hyp2f1(a, b, b, z) - expect) < 1e-8 * math.abs(expect))
    }
  }

  test("Euler transformation: F(a,b;c;z) = (1-z)^(c-a-b) F(c-a,c-b;c;z)") {
    // keep c-a, c-b positive so both series are plain convergent sums
    sweep(200, 4) { r =>
      val a = 0.1 + r.nextDouble * 1.9
      val b = 0.1 + r.nextDouble * 1.9
      val c = 4.5 + r.nextDouble * 4.5
      val z = r.nextDouble * 0.9
      val lhs = hyp2f1(a, b, c, z)
      val rhs = math.pow(1 - z, c - a - b) * hyp2f1(c - a, c - b, c, z)
      assert(math.abs(lhs - rhs) < 1e-7 * math.max(1.0, math.abs(lhs)))
    }
  }

  test("BG/NBD parameter range: z near 1 still converges") {
    // large t (365) with small alpha+T stresses z → 1
    val v = hyp2f1(3.2, 4.1, 6.3, 0.99)
    assert(!v.isNaN && !v.isInfinite && v > 0)
  }
}

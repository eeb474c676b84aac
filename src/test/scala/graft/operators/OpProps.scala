package graft.operators

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String
import graft.dedup.DedupKernels
import graft.similarity.VecOps
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** ScalaCheck properties for the operator kernels and sampling math —
  * the driver-independent invariants the DataFrame tests build on.
  */
object OpProps extends Properties("graft.ops") {

  private val frac = Gen.choose(0.0, 1.0)
  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
  private val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))

  property("hexBoundary: 8 lowercase hex chars, monotone in the fraction") =
    Prop.forAll(frac, frac) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val (bl, bh) = (Sampling.hexBoundary(lo), Sampling.hexBoundary(hi))
      bl.length == 8 && bl.forall(c => c.isDigit || ('a' to 'f').contains(c)) &&
        bl <= bh
    }

  property("hexBoundary endpoints") = Prop {
    Sampling.hexBoundary(0.0) == "00000000" && Sampling.hexBoundary(1.0) == "ffffffff"
  }

  property("shingleHashes: deterministic, sorted, bounded by positions") =
    Prop.forAll(text, Gen.choose(1, 5)) { (t, k) =>
      val u = UTF8String.fromString(t)
      val a = DedupKernels.shingleHashes(u, k).toLongArray()
      val b = DedupKernels.shingleHashes(u, k).toLongArray()
      val nTokens = t.trim.split("\\s+").length
      (a sameElements b) && (a sameElements a.sorted) &&
        a.length <= math.max(nTokens - k + 1, 1) && a.nonEmpty
    }

  property("simhash64: deterministic; identical texts at hamming 0") =
    Prop.forAll(text) { t =>
      val u = UTF8String.fromString(t)
      DedupKernels.simhash64(u) == DedupKernels.simhash64(u)
    }

  property("winnowFingerprint is a subset of the k-gram hash universe") =
    Prop.forAll(text, Gen.choose(2, 6)) { (t, w) =>
      val u = UTF8String.fromString(t)
      val fp = DedupKernels.winnowFingerprint(u, 3, w).toLongArray().toSet
      // every winnowed min must be one of the document's k-gram hashes,
      // which the shingle kernel enumerates (distinct by construction)
      val universe = DedupKernels.shingleHashes(u, 3).toLongArray().toSet
      fp.subsetOf(universe) && fp.nonEmpty
    }

  private val vec = Gen.listOfN(8, Gen.choose(-5.0, 5.0)).map(_.toArray)

  property("vec_dot: symmetric and bilinear within FP tolerance") =
    Prop.forAll(vec, vec, Gen.choose(-3.0, 3.0)) { (a, b, s) =>
      def d(x: Array[Double], y: Array[Double]) =
        VecOps.dot(new GenericArrayData(x), new GenericArrayData(y), false, false)
      val sym = math.abs(d(a, b) - d(b, a)) < 1e-9
      val scaled = math.abs(d(a.map(_ * s), b) - s * d(a, b)) < 1e-7
      sym && scaled
    }

  // the same Java-regex chain Spark's regexp_replace executes — pure
  // mirror of TextOps.redactPii for property testing without a session
  private def redact(s: String): String =
    graft.text.TextOps.piiPatterns.foldLeft(s) { case (t, (pat, tok)) =>
      t.replaceAll(pat, tok)
    }

  // adversarial fragment soup: clean words, bare/overlong digit runs,
  // '+'-prefixed runs, email-ish and ip-ish shapes, stray @ . < >
  private val piiFragment = Gen.oneOf(
    word,
    Gen.choose(1, 22).flatMap(n => Gen.listOfN(n, Gen.numChar).map(_.mkString)),
    Gen.choose(5, 18).flatMap(n => Gen.listOfN(n, Gen.numChar).map("+" + _.mkString)),
    for { a <- word; b <- word; tld <- Gen.oneOf("com", "io", "co.uk") }
      yield s"$a@$b.$tld",
    Gen.listOfN(4, Gen.choose(0, 999)).map(_.mkString(".")),
    Gen.oneOf("@", ".", "<", ">", "+", "a@b", "1.2.3"))
  private val piiText = Gen.nonEmptyListOf(piiFragment).map(_.mkString(" "))

  // the classifier's analytic gradient against central finite differences
  // on random points — the whole fit rests on this derivative being right,
  // and an e2e accuracy test can mask a subtly wrong gradient (the
  // optimizer limps to a worse optimum instead of failing)
  private val lrCase = for {
    n <- Gen.choose(5, 25)
    d <- Gen.choose(1, 4)
    xs <- Gen.listOfN(n, Gen.listOfN(d, Gen.choose(-2.0, 2.0)))
    ys <- Gen.listOfN(n, Gen.oneOf(0.0, 1.0))
    wb <- Gen.listOfN(d + 1, Gen.choose(-1.5, 1.5))
    l2 <- Gen.choose(0.0, 0.1)
  } yield (ys.toArray, xs.map(_.toArray).toArray, wb.toArray, l2, d)

  property("logistic lossGrad matches central finite differences") =
    Prop.forAll(lrCase) { case (y, x, wb, l2, d) =>
      def sweep(acc: Array[Double],
          dotF: (Array[Double], Double, Array[Double]) => Unit): Array[Double] = {
        var k = 0
        while (k < y.length) { dotF(acc, y(k), x(k)); k += 1 }
        acc
      }
      def eval(w: Array[Double]) =
        graft.quality.QualityClassifier.lossGrad(w, l2, d, y.length.toLong)(sweep)
      val (_, g) = eval(wb)
      val eps = 1e-6
      (0 to d).forall { i =>
        val up = wb.clone(); up(i) += eps
        val dn = wb.clone(); dn(i) -= eps
        val numeric = (eval(up)._1 - eval(dn)._1) / (2 * eps)
        math.abs(numeric - g(i)) <= 1e-5 * math.max(1.0, math.abs(g(i))) ||
          { println(s"dim $i: analytic ${g(i)} vs numeric $numeric"); false }
      }
    }

  property("redactPii chain is idempotent and leaves no residual match") =
    Prop.forAll(piiText) { t =>
      val once = redact(t)
      val residual = graft.text.TextOps.piiPatterns.exists { case (pat, _) =>
        java.util.regex.Pattern.compile(pat).matcher(once).find()
      }
      redact(once) == once && !residual
    }
}

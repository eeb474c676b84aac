package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the bench adjudication selection rules —
  * the example-based AdjudicateSpec pins the historical escapes
  * (q_alpha_sampling, q_chow, q_assoc_rules, the r15 cap-eviction band);
  * these properties assert the CONTRACTS over arbitrary runs:
  *
  *  - every row above the bare contract line, and every row over its
  *    hard-trigger ratio, leaves a record (breach, hard, control, or
  *    watch) — the "nothing ships recordless" invariant the watch rule
  *    exists for;
  *  - the four record classes are pairwise disjoint (a double-recorded
  *    row falsifies the "watch rows are not re-run" contract);
  *  - recheck controls never include a watch or rule-flagged row, at any
  *    top-up k — the r16 ADVICE #3 invariant, which the example spec
  *    only exercises at k == MinControls.
  */
object AdjudicateProps extends Properties("graft.adjudicate") {

  /** a synthetic run: unique names, positive medians, per-row ratios that
    * are mostly quiet with a contended tail, and ~10% of rows missing a
    * committed median (new queries between envelope refreshes) */
  private val runGen: Gen[(Vector[(String, Double)], Map[String, Double])] =
    for {
      n <- Gen.choose(0, 40)
      medians <- Gen.listOfN(n, Gen.choose(0.05, 5.0))
      ratios <- Gen.listOfN(n, Gen.frequency(
        7 -> Gen.choose(0.5, 1.5),
        2 -> Gen.choose(1.5, 3.0),
        1 -> Gen.choose(3.0, 6.0)))
      known <- Gen.listOfN(n, Gen.frequency(9 -> Gen.const(true),
                                            1 -> Gen.const(false)))
    } yield {
      val ordered = Vector.tabulate(n)(i => s"q$i" -> medians(i) * ratios(i))
      val medMap = (0 until n).collect {
        case i if known(i) => s"q$i" -> medians(i)
      }.toMap
      (ordered, medMap)
    }

  property("selection classes are pairwise disjoint and in range") =
    Prop.forAll(runGen) { case (ordered, medians) =>
      val s = Adjudicate.select(ordered, medians)
      val classes = List(s.breaches, s.hard, s.controls, s.watch)
      val all = classes.flatten
      all.forall(i => i >= 0 && i < ordered.size) &&
        all.size == all.distinct.size &&
        classes.map(_.toSet).combinations(2).forall {
          case Seq(a, b) => (a & b).isEmpty
        }
    }

  property("every bare-line or hard-ratio row leaves a record") =
    Prop.forAll(runGen) { case (ordered, medians) =>
      val s = Adjudicate.select(ordered, medians)
      val recorded =
        (s.breaches ++ s.hard ++ s.controls ++ s.watch).toSet
      ordered.indices.forall { i =>
        val (name, t) = ordered(i)
        medians.get(name) match {
          case None => true // no envelope — nothing to adjudicate against
          case Some(m) =>
            val bare = t > math.max(2.0 * m, m + 1.0)
            val ratio = t / math.max(m, 0.05)
            val overTrigger = m > 0 && ratio > (if (t < Adjudicate.SmallAbsSec)
              Adjudicate.HardRatioSmall else Adjudicate.HardRatio)
            !(bare || overTrigger) || recorded.contains(i)
        }
      }
    }

  property("hard is capped and every hard row is over its trigger ratio") =
    Prop.forAll(runGen) { case (ordered, medians) =>
      val s = Adjudicate.select(ordered, medians)
      s.hard.size <= Adjudicate.HardCap && s.hard.forall { i =>
        val (name, t) = ordered(i)
        medians.get(name).exists { m =>
          m > 0 && t / math.max(m, 0.05) > (if (t < Adjudicate.SmallAbsSec)
            Adjudicate.HardRatioSmall else Adjudicate.HardRatio)
        }
      }
    }

  property("breach rows exceed their lf-scaled contract line") =
    Prop.forAll(runGen) { case (ordered, medians) =>
      val s = Adjudicate.select(ordered, medians)
      s.breaches.forall { i =>
        val (name, t) = ordered(i)
        medians.get(name).exists { m =>
          val lf = math.max(s.g, s.localF(i))
          t > lf * math.max(2.0 * m, m + 1.0)
        }
      }
    }

  property("controls: bounded, enveloped, topped up when re-runs pend") =
    Prop.forAll(runGen) { case (ordered, medians) =>
      val s = Adjudicate.select(ordered, medians)
      val flagged = (s.breaches ++ s.hard).toSet
      val eligible = ordered.indices.count { i =>
        !flagged.contains(i) && medians.contains(ordered(i)._1)
      }
      s.controls.size <= 3 &&
        s.controls.forall(i => medians.contains(ordered(i)._1)) &&
        (flagged.isEmpty ||
          s.controls.size >= math.min(Adjudicate.MinControls, eligible))
    }

  property("inflation factors are never deflationary") =
    Prop.forAll(runGen) { case (ordered, medians) =>
      val s = Adjudicate.select(ordered, medians)
      s.g >= 1.0 && s.localF.size == ordered.size && s.localF.forall(_ >= 1.0)
    }

  property("recheck controls exclude watch and flagged rows at any k") =
    Prop.forAll(runGen, Gen.choose(0, 6)) { case ((ordered, medians), k) =>
      val s = Adjudicate.select(ordered, medians)
      val flagged = (s.breaches ++ s.hard).toSet
      val rctl = Adjudicate.recheckControls(
        ordered, medians, s.watch, s.controls, flagged, k)
      rctl.size <= k &&
        rctl.size == rctl.distinct.size &&
        rctl.forall { i =>
          (!s.watch.contains(i) && !flagged.contains(i) &&
            medians.get(ordered(i)._1).exists(_ > 0)) ||
            s.controls.contains(i) // base rows carry their own history
        }
    }

  property("med: permutation-invariant, bounded by extremes, 1.0 on empty") =
    Prop.forAll(Gen.listOf(Gen.choose(0.0, 10.0))) { xs =>
      val m = Adjudicate.med(xs)
      if (xs.isEmpty) m == 1.0
      else m >= xs.min && m <= xs.max &&
        Adjudicate.med(scala.util.Random.shuffle(xs)) == m
    }
}

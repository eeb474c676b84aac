package graft

/** Pure selection logic for the bench's post-sweep contention
  * adjudication — extracted from Bench.main (round 13) so the trigger
  * rules are unit-testable with synthetic slowdowns (AdjudicateSpec).
  *
  * Three selection rules over the run-ordered (name, seconds) vector and
  * the committed 3-run medians:
  *
  *  1. locally-corrected breach (round 10): a row re-runs in isolation
  *     when t > lf * max(2·median, median + 1), where lf is the larger of
  *     the whole-run inflation g and the ±5-run-order-neighbor median
  *     ratio — a contention window inflates the whole neighborhood, a
  *     genuine regression moves one query while its neighbors sit at
  *     baseline.
  *  2. hard trigger (round 13): ANY row above HardRatio × its median
  *     re-runs in isolation REGARDLESS of lf. Round 12's
  *     q_alpha_sampling showed the escape this closes: a 3.29×-median
  *     row rode a 1.03 local factor past both rule 1 (threshold
  *     1.45·lf ≈ 1.49 vs t = 1.48) and the 3-slot control backstop.
  *     Round 14 lowers the trigger to HardRatioSmall for rows under
  *     SmallAbsSec in-run: both escapes to date were sub-2 s rows just
  *     under 2.5× (q_alpha_sampling 3.29× pre-trigger in r12, q_chow
  *     2.49× in r13), and an isolated re-run of a sub-2 s query is
  *     nearly free — spend it. The set is capped at HardCap by
  *     descending absolute excess (t − median) — the rows a reviewer
  *     would most want isolated.
  *  (+watch, round 15): any row above the BARE rule-1 contract line that
  *     rules 1–2 left un-isolated is returned in `watch` — not re-run,
  *     but committed to BENCH_FULL so the 2.0–2.5× band between the
  *     lf-scaled rule-1 threshold and the hard trigger (where r14's
  *     q_assoc_rules breach shipped recordless) always leaves a record.
  *
  *  3. controls (round 10 ADVICE): of the rows rules 1–2 did NOT select,
  *     the ones local_f shielded hardest (lf > max(1.25, g), up to 3,
  *     slowest-weighted first) also re-run — isolated ≈ median means the
  *     contention the factor exists to forgive; isolated ≈ in-run means
  *     a cluster regression lf wrongly absorbed. When any rule-1/2
  *     re-runs happen, controls are topped up to MinControls so the
  *     isolation phase always carries a contemporaneous speed reference:
  *     round 12's sampled controls showed that phase itself running
  *     ~1.4× slow, silently inflating committed adjudication triples.
  *     Bench divides each isolated time by the control-derived factor
  *     and commits it as iso_norm alongside the raw number.
  */
object Adjudicate {

  val HardRatio = 2.5
  /** whole-run inflation above which the watch rows re-measure once after
    * a cooldown (r15 "next" #5): three rounds of end-of-round driver
    * benches landed on g ≥ 1.13 boxes while morning triples read 1.00, so
    * every watch row shipped needing a NEXT-round subset-triple
    * adjudication. On an inflated run the bench now spends one cooldown +
    * one re-run per watch row and commits both readings — the
    * adjudication happens in the same run that produced the breach. */
  val RecheckG = 1.15
  /** tighter trigger for rows whose in-run time is below [[SmallAbsSec]]:
    * their isolated re-runs cost milliseconds, and both historical
    * escapes were sub-2 s rows riding just under 2.5× (r14) */
  val HardRatioSmall = 2.0
  val SmallAbsSec = 2.0
  val HardCap = 12
  val MinControls = 2

  /** median of xs; 1.0 on empty (a neutral inflation factor) */
  def med(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 1.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  final case class Selection(
      g: Double,
      localF: Vector[Double],
      breaches: Vector[Int],
      hard: Vector[Int],
      controls: Vector[Int],
      /** rows above the BARE rule-1 contract line — t > max(2·median,
        * median + 1) with NO local_f shield — that rules 1–2 did not
        * select for isolation (local_f lifted the rule-1 threshold past
        * them and they sat under the hard trigger), PLUS hard-trigger
        * rows the HardCap cut evicted (r15 ADVICE: a cap-evicted sub-2 s
        * row with median < 1 sits UNDER the bare line — 2.0·m < m+1 — and
        * would otherwise ship recordless through the very overflow path
        * the watch rule backstops). Round 14 proved the band live:
        * q_assoc_rules at 2.09× median breached the contract line yet
        * shipped with no adjudication record. Watch rows are NOT re-run
        * by the selection itself (local_f shielding is usually right) —
        * control rows, which DO re-run and carry their own triple, are
        * excluded (r15 ADVICE) — but on a run with whole-run inflation
        * g > [[RecheckG]] the bench re-measures each watch row once after
        * a cooldown and commits both readings. Either way every row above
        * the bare line leaves a record a reviewer can adjudicate. */
      watch: Vector[Int])

  def select(ordered: Vector[(String, Double)],
             medians: Map[String, Double]): Selection = {
    val ratios: Vector[Option[Double]] = ordered.map { case (n, t) =>
      medians.get(n).filter(_ > 0).map(m => t / math.max(m, 0.05)) }
    val g = math.max(1.0, med(ratios.flatten))
    val localF = ordered.indices.toVector.map { i =>
      val neigh = ((i - 5) to (i + 5)).filter(j =>
        j != i && j >= 0 && j < ordered.size).flatMap(j => ratios(j))
      math.max(1.0, if (neigh.isEmpty) 1.0 else med(neigh))
    }
    val breaches = ordered.indices.toVector.filter { i =>
      val (name, t) = ordered(i)
      medians.get(name).exists { m =>
        val lf = math.max(g, localF(i))
        t > lf * math.max(2.0 * m, m + 1.0)
      }
    }
    val breachSet = breaches.toSet
    val hardAll = ordered.indices.toVector
      .filter { i =>
        val (name, t) = ordered(i)
        !breachSet.contains(i) &&
          medians.get(name).filter(_ > 0).exists { m =>
            val ratio = t / math.max(m, 0.05)
            ratio > (if (t < SmallAbsSec) HardRatioSmall else HardRatio)
          }
      }
      .sortBy { i =>
        val (name, t) = ordered(i)
        -(t - medians(name))
      }
    val hard = hardAll.take(HardCap)
    // hard-trigger rows the cap evicted: still over their trigger ratio,
    // just outrun by HardCap larger absolute excesses — they join watch
    // below REGARDLESS of the bare-line test (r15 ADVICE: for median < 1
    // the hard trigger 2.0·m sits under the bare line m+1, so a
    // cap-evicted row there passes neither gate)
    val capEvicted = hardAll.drop(HardCap)
    val selected = breachSet ++ hard
    val shielded = ordered.indices.toVector
      .filter { i =>
        val (name, _) = ordered(i)
        !selected.contains(i) && medians.contains(name) &&
          localF(i) > math.max(1.25, g)
      }
      .sortBy { i => -localF(i) * ordered(i)._2 }
      .take(3)
    // top-up: with isolated re-runs pending, guarantee a contemporaneous
    // control pair even on a run where nothing crossed the 1.25 shield bar
    val controls =
      if (selected.isEmpty || shielded.size >= MinControls) shielded
      else {
        val extra = ordered.indices.toVector
          .filter { i =>
            val (name, _) = ordered(i)
            !selected.contains(i) && !shielded.contains(i) &&
              medians.contains(name)
          }
          .sortBy { i => (-localF(i), -ordered(i)._2) }
          .take(MinControls - shielded.size)
        shielded ++ extra
      }
    // controls re-run in isolation and commit their own triple, so a
    // control row above the bare line already carries a record — listing
    // it in watch too would double-record it AND falsify the "watch rows
    // are not re-run" contract (r15 ADVICE #1)
    val recorded = selected ++ controls
    val watch = ordered.indices.toVector.filter { i =>
      val (name, t) = ordered(i)
      !recorded.contains(i) &&
        (capEvicted.contains(i) ||
          medians.get(name).exists(m => t > math.max(2.0 * m, m + 1.0)))
    }
    Selection(g, localF, breaches, hard, controls, watch)
  }

  /** r15 "next" #5 — schedule-proofing against the afternoon box: fire the
    * in-run watch recheck (cooldown + one re-measurement per watch row,
    * both readings committed) only when the run itself measured inflated.
    * On a clean box (g ≤ RecheckG) a watch row's record is already
    * adjudicable against the committed envelope, and the re-run would be
    * measuring the same quiet box twice. */
  def recheckNeeded(g: Double, watch: Vector[Int]): Boolean =
    g > RecheckG && watch.nonEmpty

  /** Controls for the watch-recheck phase: the recheck re-measures rows
    * AFTER a cooldown, so it needs its own contemporaneous speed
    * reference (the original ctl_f measured a phase that ended a cooldown
    * ago). Prefer the already-chosen control rows (their isolated history
    * makes cross-phase comparison free); top up to k with rows whose
    * committed median is closest to 1 s — large enough to be
    * jitter-resistant, small enough to cost little. Watch rows AND the
    * selection's breach/hard rows are excluded: a control must be a row
    * the rules did NOT flag — a flagged (possibly genuinely regressed) row
    * used as the speed reference would absorb the very slowdown the
    * recheck normalizes away (r16 ADVICE #3: the old top-up only excluded
    * watch rows, unreachable today solely because controls are topped up
    * to MinControls == k; `flagged` makes the documented invariant hold
    * for any future k > MinControls caller). */
  def recheckControls(ordered: Vector[(String, Double)],
                      medians: Map[String, Double],
                      watch: Vector[Int],
                      controls: Vector[Int],
                      flagged: Set[Int],
                      k: Int): Vector[Int] = {
    val watchSet = watch.toSet
    val base = controls.filterNot(watchSet).take(k)
    if (base.size >= k) base
    else {
      val taken = base.toSet
      val extra = ordered.indices.toVector
        .filter { i =>
          val (name, _) = ordered(i)
          !watchSet.contains(i) && !taken.contains(i) &&
            !flagged.contains(i) && medians.get(name).exists(_ > 0)
        }
        .sortBy(i => math.abs(medians(ordered(i)._1) - 1.0))
        .take(k - base.size)
      base ++ extra
    }
  }
}

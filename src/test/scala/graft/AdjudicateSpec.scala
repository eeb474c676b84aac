package graft

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic-slowdown tests for the bench adjudication trigger rules
  * (r12 "Next round" #2 — the rules must be unit-testable, not only
  * exercised by live driver runs). No SparkSession needed: the selection
  * logic is pure.
  */
class AdjudicateSpec extends AnyFunSuite {

  /** n queries, every median = m, in-run time = median unless overridden */
  private def flatRun(n: Int, m: Double,
                      over: Map[Int, Double] = Map.empty)
      : (Vector[(String, Double)], Map[String, Double]) = {
    val names = (0 until n).map(i => f"q_$i%03d")
    val ordered = names.zipWithIndex.map { case (nm, i) =>
      nm -> over.getOrElse(i, m) }.toVector
    (ordered, names.map(_ -> m).toMap)
  }

  test("locally-corrected breach fires on a lone 3x-median slow row") {
    // median 2.0 ⇒ threshold max(2m, m+1) = 4.0; a 6.1 s row breaches
    val (ordered, medians) = flatRun(20, 2.0, Map(7 -> 6.1))
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.breaches == Vector(7))
    assert(sel.hard.isEmpty) // already selected by rule 1
  }

  test("hard trigger closes the local_f escape (the q_alpha_sampling case)") {
    // the r12 escape, reconstructed: median 0.45 ⇒ rule-1 base threshold
    // m+1 = 1.45; inflate the ±5 neighborhood to 1.03× so local_f ≈ 1.03
    // and the threshold ≈ 1.49 — a 1.48 s row (3.29× median) slips rule 1.
    // Rule 2 (t > 2.5×median regardless of lf) must select it.
    val idx = 10
    val neighborhood = ((idx - 5) to (idx + 5)).filter(_ != idx)
      .map(_ -> 0.45 * 1.03).toMap
    val (ordered, medians) = flatRun(21, 0.45, neighborhood + (idx -> 1.48))
    val sel = Adjudicate.select(ordered, medians)
    assert(!sel.breaches.contains(idx),
      "precondition: rule 1 must NOT fire, or this test is not the escape")
    assert(sel.hard.contains(idx))
  }

  test("sub-2s rows hard-trigger at the tighter 2.0x (the q_chow case)") {
    // r13's escape replayed: 1.5 s at 2.1× its 0.714 median — under 2.5×
    // (old trigger silent) but sub-2 s absolute, so the r14 tightening
    // must select it
    val (ordered, medians) = flatRun(20, 0.714, Map(7 -> 1.5)) // 2.1x, <2s
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.breaches.isEmpty, "rule-1 additive floor absorbs a sub-2s row")
    assert(sel.hard == Vector(7))
  }

  test("at-or-above 2s rows keep the 2.5x trigger (2.44x does not fire)") {
    // mild neighborhood inflation (1.3x) keeps rule 1 silent (threshold
    // 2m·lf = 2.6 > 2.44) so only the hard trigger is under test; at
    // t >= 2 s the threshold stays 2.5x, so 2.44x must NOT fire
    val idx = 10
    val neighborhood = ((idx - 5) to (idx + 5)).filter(_ != idx)
      .map(_ -> 1.3).toMap
    val (ordered, medians) = flatRun(21, 1.0, neighborhood + (idx -> 2.44))
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.breaches.isEmpty, "precondition: rule 1 shielded by local_f")
    assert(sel.hard.isEmpty)
  }

  test("hard trigger does not fire at or below 2.0x in any regime") {
    val (ordered, medians) =
      flatRun(20, 0.45, Map(7 -> 0.89, 11 -> 0.9)) // 1.98x and 2.0x, <2s
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.hard.isEmpty && sel.breaches.isEmpty)
  }

  test("hard set is capped by descending absolute excess") {
    // 15 rows all at 3x their medians (rule-1 threshold m+1=1.5 vs t=1.5?
    // use m=1.2 ⇒ rule-1 threshold max(2.4, 2.2)·lf; t=3.6 breaches rule 1,
    // so push medians down: m=0.2 ⇒ threshold 1.2·lf, t=0.6 does NOT breach
    // rule 1 (0.6 < 1.2) but 0.6/0.2 = 3 > 2.5 hard-triggers). Stagger the
    // excesses so the cap keeps the LARGEST.
    val over = (0 until 15).map(i => i * 2 -> (0.6 + i * 0.01)).toMap
    val (ordered, medians) = flatRun(40, 0.2, over)
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.breaches.isEmpty)
    assert(sel.hard.size == Adjudicate.HardCap)
    val excess = sel.hard.map(i => ordered(i)._2 - 0.2)
    assert(excess == excess.sorted.reverse, "ordered by excess desc")
    assert(sel.hard.contains(28), "slowest row kept") // i=14 → idx 28
    assert(!sel.hard.contains(0) && !sel.hard.contains(2) &&
      !sel.hard.contains(4), "three smallest excesses dropped by the cap")
  }

  test("a query with no committed median can neither breach nor hard-trigger") {
    val (ordered, medians0) = flatRun(10, 0.5, Map(3 -> 9.9))
    val medians = medians0 - "q_003"
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.breaches.isEmpty && sel.hard.isEmpty)
  }

  test("controls top up to MinControls when isolated re-runs happen") {
    // clean neighborhoods (local_f = 1) ⇒ the shield filter selects
    // nothing, but one breaching row means the isolation phase runs —
    // so ≥2 controls must still be chosen for the ctl_f reference
    val (ordered, medians) = flatRun(20, 2.0, Map(7 -> 6.1))
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.breaches == Vector(7))
    assert(sel.controls.size >= Adjudicate.MinControls)
    assert(!sel.controls.contains(7), "a selected row is not its own control")
  }

  test("no re-runs, no forced controls: a clean run stays a clean run") {
    val (ordered, medians) = flatRun(20, 2.0)
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.breaches.isEmpty && sel.hard.isEmpty && sel.controls.isEmpty)
  }

  test("watch records every bare-line breach that escaped isolation (the q_assoc_rules band)") {
    // r14's live escape, reconstructed: median 2.01, in-run 4.21 s = 2.09×.
    // Above the bare rule-1 line (4.02) but: ≥2 s so the hard trigger
    // needs 2.5× (5.03), and a 1.16× neighborhood lifts rule 1's lf-scaled
    // threshold past 4.21 — no isolation. The watch set must carry it.
    val idx = 10
    val neighborhood = ((idx - 5) to (idx + 5)).filter(_ != idx)
      .map(_ -> 2.01 * 1.16).toMap
    val (ordered, medians) = flatRun(21, 2.01, neighborhood + (idx -> 4.21))
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.breaches.isEmpty && sel.hard.isEmpty,
      "precondition: the row must escape both isolation rules")
    assert(sel.watch == Vector(idx))
  }

  test("watch excludes rows already selected for isolation and rows under the bare line") {
    // one rule-1 breach (clean neighborhood) + one clean row: the breach
    // is isolated, so watch — records for rows withOUT an adjudication
    // entry — must be empty
    val (ordered, medians) = flatRun(20, 2.0, Map(7 -> 6.1))
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.breaches == Vector(7))
    assert(sel.watch.isEmpty)
  }

  test("cap-evicted hard-trigger rows land in watch even under the bare line (r15 ADVICE overflow path)") {
    // the capped scenario again: median 0.2 ⇒ the bare watch line is
    // m+1 = 1.2, ABOVE the ~0.6 s readings — so a cap-evicted 3×-median
    // row passes neither the hard gate (evicted) nor the bare-line test,
    // the exact recordless overflow the advice named. The three smallest
    // excesses (indices 0, 2, 4) must surface in watch anyway.
    val over = (0 until 15).map(i => i * 2 -> (0.6 + i * 0.01)).toMap
    val (ordered, medians) = flatRun(40, 0.2, over)
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.hard.size == Adjudicate.HardCap)
    val evicted = Vector(0, 2, 4)
    assert(evicted.forall(i => !sel.hard.contains(i)),
      "precondition: the three smallest excesses are cap-evicted")
    assert(evicted.forall(i => ordered(i)._2 <= 0.2 + 1.0),
      "precondition: evicted rows sit UNDER the bare watch line")
    assert(evicted.forall(sel.watch.contains),
      s"cap-evicted rows missing from watch: ${sel.watch}")
  }

  test("a control row above the bare line is recorded once, as a control, not in watch (r15 ADVICE)") {
    // median 2.0, one row at 4.3 s (2.15× — above the bare line 4.0,
    // under the ≥2 s hard trigger 5.0) inside a 1.4×-inflated ±5
    // neighborhood: rule 1's lf-scaled threshold (5.6) shields it, and
    // localF 1.4 > 1.25 makes it the heaviest shielded row — a control.
    // Controls re-run in isolation and commit their own triple, so watch
    // (whose doc promises "not re-run") must NOT list it again.
    val idx = 20
    val neighborhood = ((idx - 5) to (idx + 5)).filter(_ != idx)
      .map(_ -> 2.0 * 1.4).toMap
    val (ordered, medians) = flatRun(41, 2.0, neighborhood + (idx -> 4.3))
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.breaches.isEmpty && sel.hard.isEmpty,
      "precondition: the row escapes both isolation rules")
    assert(sel.controls.contains(idx),
      s"precondition: the shielded row is chosen as a control: ${sel.controls}")
    assert(!sel.watch.contains(idx), "control row double-recorded in watch")
  }

  test("recheck fires only on an inflated run with watch rows") {
    assert(Adjudicate.recheckNeeded(1.16, Vector(3)))
    assert(!Adjudicate.recheckNeeded(1.15, Vector(3)), "g must EXCEED RecheckG")
    assert(!Adjudicate.recheckNeeded(1.3, Vector.empty), "no watch, no recheck")
    assert(!Adjudicate.recheckNeeded(1.0, Vector.empty))
  }

  test("recheck controls prefer the selection's controls, then medians nearest 1s, never watch rows") {
    val ordered = Vector("q_a" -> 0.5, "q_b" -> 1.1, "q_c" -> 3.0,
      "q_d" -> 0.9, "q_e" -> 2.0)
    val medians = Map("q_a" -> 0.5, "q_b" -> 1.1, "q_c" -> 3.0,
      "q_d" -> 0.9, "q_e" -> 1.0)
    // existing control (idx 2) kept first; top-up picks q_e (median 1.0,
    // distance 0) over q_b (1.1) and q_d (0.9); the watch row q_b's index
    // must never be chosen even when its median is competitive
    val got = Adjudicate.recheckControls(ordered, medians,
      watch = Vector(1), controls = Vector(2), flagged = Set.empty, k = 2)
    assert(got == Vector(2, 4), s"got $got")
    // no pre-existing controls: pure nearest-to-1s top-up, watch excluded
    // (q_e, the true nearest, is the watch row — q_b/q_d at ±0.1 win)
    val got2 = Adjudicate.recheckControls(ordered, medians,
      watch = Vector(4), controls = Vector.empty, flagged = Set.empty, k = 2)
    assert(got2.toSet == Set(1, 3), s"got $got2")
  }

  test("recheck-control top-up never picks a breach/hard-flagged row (r16 ADVICE)") {
    val ordered = Vector("q_a" -> 0.5, "q_b" -> 1.1, "q_c" -> 3.0,
      "q_d" -> 0.9, "q_e" -> 2.0)
    val medians = Map("q_a" -> 0.5, "q_b" -> 1.1, "q_c" -> 3.0,
      "q_d" -> 0.9, "q_e" -> 1.0)
    // q_e (median 1.0, distance 0) is the top-up's first choice — but it
    // is breach/hard-flagged, so a k > MinControls caller must get the
    // unflagged runners-up instead: a flagged (possibly regressed) row as
    // the speed reference would normalize away the regression under test
    val got = Adjudicate.recheckControls(ordered, medians,
      watch = Vector(0), controls = Vector.empty, flagged = Set(4), k = 2)
    assert(!got.contains(4), s"flagged row chosen as recheck control: $got")
    assert(got.toSet == Set(1, 3), s"got $got")
  }

  test("contention window: neighborhood inflation shields rule 1, controls watch it") {
    // a 10-query window all at 2.6x median — local_f ≈ 2.6 absorbs each
    // row (rule 1 silent), the hard trigger picks them up anyway (they're
    // >2.5x), which is exactly the r12 design intent: a CLUSTER regression
    // can no longer hide behind its own neighborhood
    val over = (5 to 14).map(i => i -> (1.0 * 2.6)).toMap
    val (ordered, medians) = flatRun(30, 1.0, over)
    val sel = Adjudicate.select(ordered, medians)
    assert(sel.breaches.isEmpty, "local factor absorbs the window for rule 1")
    assert((5 to 14).forall(sel.hard.contains), "hard trigger sees through it")
  }
}

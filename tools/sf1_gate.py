#!/usr/bin/env python3
"""Scripted sf1 (10x-corpus) evidence gate — r13 verdict "missing" #1.

The r13 sf1 evidence run found six defect classes invisible at the gate
SFs (including one genuine superlinearity, q_semdedup's fixed nlist);
this script makes that evidence REPRODUCIBLE and ENFORCED instead of a
one-off: a plan change that re-introduces an sf1-class regression now
fails a committed gate instead of shipping on sf0.1 evidence alone.

Usage (from /root/repo):
    python3 tools/sf1_gate.py                 # full gate
    python3 tools/sf1_gate.py --refresh 3     # rebuild BASELINE_SF1_VARIANCE.json
                                              # from 3 timed passes (still gates
                                              # correctness first)
    flags: --reuse-corpus   skip gen_sf when /tmp/sf1 already exists
           --bench-only     skip the Verify/oracle sweep (perf iteration)

Steps:
  1. materialize /tmp/sf1 via tools/gen_sf.py (sf0.1 x 10);
  2. full graft.Verify at /tmp/sf1 + tools/check.py DuckDB oracle sweep —
     every oracle, setsim included (its oracle went O(sum df^2) in r14);
     any hash mismatch FAILS the gate;
  3. timed Bench pass(es) at /tmp/sf1 (SPARK_GRAFT_REFRESH=1 to bypass
     the sf0.1 envelope gate; SPARK_GRAFT_VARIANCE points at the
     committed sf1 medians so Bench's own contention adjudication —
     isolated re-runs, hard trigger — runs at sf1 too);
  4. diff against BASELINE_SF1_VARIANCE.json (committed, built by
     --refresh from >= 3 back-to-back passes):
       - per-query breach: t > g * max(2 * median, median + 1.0s), with
         g = max(1, run-median of per-query ratios) absorbing uniform box
         slowness — the same rule the sf0.1 protocol enforces;
       - cost-tier walls (top-20 / next-80 / bulk by committed median):
         tier wall > 1.5x its committed tier median-sum;
       - total wall > 1.5x the committed median total.
"""
import json
import os
import statistics
import subprocess
import sys

SF_DIR = "/tmp/sf1"
OUT_DIR = "/tmp/sf1_out"
BASELINE = "BASELINE_SF1_VARIANCE.json"
TIERS = [("top20", 20), ("next80", 80), ("bulk", None)]


def run(cmd, env_extra=None, log=None):
    env = dict(os.environ, **(env_extra or {}))
    print(f"[sf1_gate] $ {' '.join(cmd)}" +
          (f"  ({' '.join(f'{k}={v}' for k, v in (env_extra or {}).items())})" if env_extra else ""),
          flush=True)
    if log:
        with open(log, "w") as f:
            return subprocess.run(cmd, env=env, stdout=f, stderr=subprocess.STDOUT).returncode
    return subprocess.run(cmd, env=env).returncode


def tiers_of(medians):
    """Self-deriving cost tiers: top-20 / next-80 / rest by committed
    median — no hand-curated query lists to rot as the suite evolves."""
    ranked = sorted(medians, key=lambda q: -medians[q])
    out, i = {}, 0
    for name, n in TIERS:
        out[name] = sorted(ranked[i:i + n] if n else ranked[i:])
        i += n or 0
    return out


def bench_pass(i, variance_path):
    full = f"/tmp/bench_sf1_{i}.json"
    rc = run(["sbt", "-batch", "runMain graft.Bench"], env_extra={
        "SPARK_GRAFT_SF_DIR": SF_DIR,
        "SPARK_GRAFT_REFRESH": "1",
        "SPARK_GRAFT_VARIANCE": variance_path,
        "SPARK_GRAFT_BENCH_FULL": full,
    }, log=f"/tmp/bench_sf1_{i}.log")
    if rc != 0:
        raise SystemExit(f"[sf1_gate] FAIL: bench pass {i} exited {rc} "
                         f"(see /tmp/bench_sf1_{i}.log)")
    return json.load(open(full))


def main(argv):
    refresh = 0
    if "--refresh" in argv:
        refresh = int(argv[argv.index("--refresh") + 1])
        if refresh < 3:
            raise SystemExit("--refresh needs >= 3 passes for medians")

    # corpus-regen detection first (r16 verdict "next" #2): the committed
    # sf1 envelopes are only valid for the /root/testdata bytes they were
    # derived from (gen_sf.py is deterministic IN its sf0.1 input, so a
    # driver-side regen silently shifts the 10x corpus too — and makes a
    # --reuse-corpus /tmp/sf1 stale besides). Gate mode FAILS on a moved
    # corpus; refresh mode proceeds (it is the re-cut) with a reminder.
    fp_rc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "corpus_fp.py"), "check"]).returncode
    if fp_rc == 1:
        if refresh:
            print("[sf1_gate] corpus MOVED — refresh will re-cut the sf1 "
                  "envelopes; ALSO re-cut sf0.1 (SPARK_GRAFT_REFRESH=1 "
                  "triple), run tools/corpus_fp.py record, and drop any "
                  "--reuse-corpus /tmp/sf1 from the old bytes", flush=True)
        else:
            raise SystemExit(
                "[sf1_gate] FAIL: corpus fingerprint mismatch — the "
                "committed sf1 envelopes were measured on different "
                "/root/testdata bytes; run --refresh 3 (plus the sf0.1 "
                "refresh + corpus_fp.py record) before judging any breach")
    elif fp_rc == 2:
        print("[sf1_gate] WARN: no CORPUS_FP.json recorded — corpus-regen "
              "detection is OFF (tools/corpus_fp.py record)", flush=True)

    if not ("--reuse-corpus" in argv and os.path.isdir(SF_DIR)):
        if run(["python3", "tools/gen_sf.py", "/root/testdata/sf0.1",
                SF_DIR, "10"]) != 0:
            raise SystemExit("[sf1_gate] FAIL: corpus generation")

    if "--bench-only" not in argv:
        if run(["sbt", "-batch", f"runMain graft.Verify {SF_DIR} {OUT_DIR}"],
               log="/tmp/sf1_verify.log") != 0:
            raise SystemExit("[sf1_gate] FAIL: Verify exited nonzero "
                             "(see /tmp/sf1_verify.log)")
        if run(["python3", "tools/check.py", SF_DIR, OUT_DIR]) != 0:
            raise SystemExit("[sf1_gate] FAIL: oracle hash mismatch at sf1")
        print("[sf1_gate] correctness sweep green at sf1", flush=True)

    variance_path = BASELINE if os.path.exists(BASELINE) else "/tmp/none.json"

    if refresh:
        runs = [bench_pass(i, variance_path) for i in range(1, refresh + 1)]
        names = sorted(runs[0]["queries_sec"])
        medians = {q: round(statistics.median(
            r["queries_sec"][q] for r in runs), 3) for q in names}
        tiers = tiers_of(medians)
        doc = {
            "runs": len(runs),
            "sf": runs[0]["sf"],
            "protocol": "back-to-back full-suite Bench passes at the 10x "
                        "corpus (tools/gen_sf.py), REFRESH=1; gate rule: "
                        "t > g*max(2*median, median+1.0s) per query, "
                        "tier/total walls <= 1.5x committed",
            "totals_sec": [r["total_sec"] for r in runs],
            "queries": {q: {
                "min": min(r["queries_sec"][q] for r in runs),
                "median": medians[q],
                "max": max(r["queries_sec"][q] for r in runs),
            } for q in names},
            "tiers": tiers,
            "tier_median_sums": {t: round(sum(medians[q] for q in qs), 2)
                                 for t, qs in tiers.items()},
        }
        with open(BASELINE, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"[sf1_gate] wrote {BASELINE}: totals "
              f"{[r['total_sec'] for r in runs]}", flush=True)
        return 0

    if not os.path.exists(BASELINE):
        raise SystemExit(f"[sf1_gate] FAIL: no committed {BASELINE} — run "
                         "--refresh 3 once and commit the result")
    base = json.load(open(BASELINE))
    medians = {q: v["median"] for q, v in base["queries"].items()}
    got = bench_pass("gate", BASELINE)["queries_sec"]

    missing = sorted(set(medians) - set(got))
    extra = sorted(set(got) - set(medians))
    if missing:
        raise SystemExit(f"[sf1_gate] FAIL: baselined queries absent from "
                         f"the run: {missing}")
    if extra:
        print(f"[sf1_gate] WARN: {len(extra)} queries without an sf1 "
              f"envelope (re-run --refresh to baseline): {extra}")

    ratios = sorted(got[q] / max(medians[q], 0.05) for q in medians)
    g = max(1.0, ratios[len(ratios) // 2])
    breaches = [(q, got[q], medians[q]) for q in sorted(medians)
                if got[q] > g * max(2 * medians[q], medians[q] + 1.0)]
    fails = []
    for q, t, m in breaches:
        fails.append(f"query {q}: {t:.2f}s vs sf1 median {m:.2f}s "
                     f"(g={g:.2f})")
    for tier, qs in base["tiers"].items():
        wall = sum(got[q] for q in qs if q in got)
        committed = base["tier_median_sums"][tier]
        if wall > 1.5 * committed:
            fails.append(f"tier {tier}: wall {wall:.1f}s > 1.5x committed "
                         f"{committed:.1f}s")
        else:
            print(f"[sf1_gate] tier {tier}: {wall:.1f}s vs committed "
                  f"{committed:.1f}s ({wall / committed:.2f}x)", flush=True)
    total = sum(got.values())
    committed_total = statistics.median(base["totals_sec"])
    if total > 1.5 * committed_total:
        fails.append(f"total wall {total:.1f}s > 1.5x committed "
                     f"{committed_total:.1f}s")
    if fails:
        print("[sf1_gate] FAIL:\n  " + "\n  ".join(fails))
        return 1
    print(f"[sf1_gate] PASS: {len(medians)} queries inside the sf1 "
          f"envelopes, total {total:.1f}s vs committed "
          f"{committed_total:.1f}s (g={g:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

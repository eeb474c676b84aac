#!/usr/bin/env python3
"""Build BASELINE_VARIANCE.json (and refresh BASELINE_QUERIES.json) from
N back-to-back full-suite Bench runs.

Usage:
    python3 tools/variance.py BENCH_FULL_1.json BENCH_FULL_2.json ...

Each input is a Bench SPARK_GRAFT_BENCH_FULL dump:
    {"total_sec": ..., "sf": "sf0.1", "queries_sec": {"q_x": 1.23, ...}}

Outputs (written to the repo root, i.e. the CWD):
  - BASELINE_VARIANCE.json: {"runs": N, "sf": ..., "queries":
        {q: {"min": a, "median": b, "max": c}}, "totals": [...]}
  - BASELINE_QUERIES.json: per-query MIN across the runs (the best-
    successful-run convention the round-5 protocol established).

The breach rule these files back (see BASELINE.md, amended round 10): a
query regresses only when t > local_f * max(2 * median, median + 1.0) AND
its end-of-run isolated re-run (recorded by Bench in BENCH_FULL.json's
"adjudication" map) also breaches. local_f = max(g, median ratio of the
+-5 run-order neighbors) absorbs both uniform sandbox inflation (g) and
the localized contention windows the r9 adjudication had to untangle by
hand.
"""
import json
import statistics
import sys


def main(paths: list[str]) -> None:
    if len(paths) < 3:
        raise SystemExit(f"need >= 3 runs for a variance map, got {len(paths)}")
    runs = [json.load(open(p)) for p in paths]
    names = set(runs[0]["queries_sec"])
    for i, r in enumerate(runs[1:], 2):
        if set(r["queries_sec"]) != names:
            raise SystemExit(f"run {i} measures a different query set")
    variance = {
        q: {
            "min": min(r["queries_sec"][q] for r in runs),
            "median": round(statistics.median(r["queries_sec"][q] for r in runs), 3),
            "max": max(r["queries_sec"][q] for r in runs),
        }
        for q in sorted(names)
    }
    with open("BASELINE_VARIANCE.json", "w") as f:
        json.dump(
            {
                "runs": len(runs),
                "sf": runs[0]["sf"],
                "protocol": "back-to-back full-suite Bench runs, per-run "
                "best-of-2-above-0.75s (v2), block-manager sweep between "
                "queries; breach rule (r10): t > local_f*max(2*median, "
                "median + 1.0s) AND the end-of-run isolated re-run also "
                "breaches; local_f = max(g, median ratio of +-5 run-order "
                "neighbors), g = max(1, run-median per-query ratio)",
                "totals_sec": [r["total_sec"] for r in runs],
                "queries": variance,
            },
            f,
            indent=1,
        )
    best = {q: variance[q]["min"] for q in sorted(names)}
    with open("BASELINE_QUERIES.json", "w") as f:
        json.dump(best, f, indent=1)
    tot = sum(best.values())
    print(f"{len(runs)} runs, {len(names)} queries")
    print(f"totals per run: {[r['total_sec'] for r in runs]}")
    print(f"best-of-runs total: {tot:.2f}s")
    spread = {q: variance[q]["max"] - variance[q]["min"] for q in names}
    worst = sorted(spread, key=spread.get, reverse=True)[:8]
    for q in worst:
        v = variance[q]
        print(f"  spread {q}: {v['min']:.2f} / {v['median']:.2f} / {v['max']:.2f}")
    # envelope<->corpus coupling (r17): if these envelopes were re-cut
    # because the corpus moved, the fingerprint must be re-recorded — but
    # only AFTER the sf1 envelopes are re-cut too (recording between the
    # two would let the sf1 gate pass its corpus check against stale sf1
    # medians). Remind, don't auto-record.
    import os
    import subprocess
    rc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "corpus_fp.py"), "check"],
        stdout=subprocess.DEVNULL).returncode
    if rc == 1:
        print("NOTE: corpus fingerprint mismatch — these envelopes are the "
              "sf0.1 half of a re-cut; finish with tools/sf1_gate.py "
              "--refresh 3, THEN tools/corpus_fp.py record, and commit all "
              "three")
    elif rc == 2:
        print("NOTE: no CORPUS_FP.json — run tools/corpus_fp.py record "
              "(after the sf1 refresh) so gated runs detect future regens")


if __name__ == "__main__":
    main(sys.argv[1:])

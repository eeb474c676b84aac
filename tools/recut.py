#!/usr/bin/env python3
"""One-command envelope re-cut after a driver-side corpus regeneration.

The committed envelopes (BASELINE_VARIANCE.json, BASELINE_QUERIES.json,
BASELINE_SF1_VARIANCE.json) are only valid for the /root/testdata bytes
they were measured on. When the round driver regenerates the corpus, the
whole evidence chain must be re-cut in a specific order, and the order
matters: recording the corpus fingerprint between the sf0.1 and sf1
re-cuts would let the sf1 gate pass its corpus check against stale sf1
medians (the exact trap tools/variance.py's closing NOTE warns about).
This script runs the documented flow end-to-end in the only safe order:

  1. tools/corpus_fp.py check — REFUSE to re-cut an unchanged corpus
     (a needless re-cut discards accumulated medians for no reason);
     --force overrides for a deliberate protocol re-cut.
  2. sf0.1 refresh triple: 3 back-to-back full-suite Bench runs
     (SPARK_GRAFT_REFRESH=1 bypasses the now-stale envelope gate;
     per-run BENCH_FULL dumps go to /tmp/recut_run{1..3}.json).
  3. tools/variance.py over the 3 dumps — writes BASELINE_VARIANCE.json
     + BASELINE_QUERIES.json into the repo root.
  4. tools/sf1_gate.py --refresh 3 — regenerates /tmp/sf1 from the NEW
     sf0.1 bytes (no --reuse-corpus: the old /tmp/sf1 derives from the
     old corpus), gates correctness (full Verify + DuckDB oracle sweep),
     then rebuilds BASELINE_SF1_VARIANCE.json from 3 timed passes.
  5. tools/corpus_fp.py record — ONLY after both re-cuts succeeded.
  6. Print the files to commit. Committing stays a human step: the
     re-cut is evidence, and evidence ships with a written record
     (BASELINE.md entry) alongside the JSON.

Budget ~100 min wall (≈20 min for the sf0.1 triple, ≈80 min for the sf1
refresh) — run under nohup and poll the log:

    nohup python3 tools/recut.py > /tmp/recut.log 2>&1 &

Flags: --force (re-cut even if the fingerprint matches). Anything else
is rejected loudly — no silent typo-tolerance (tools/sf1_gate.py's
flag handling has burned sessions before).
"""
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")
SF01 = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.1"
RUNS = 3


def step(cmd, env_extra=None):
    env = dict(os.environ, **(env_extra or {}))
    print(f"[recut] $ {' '.join(cmd)}" +
          (f"  ({' '.join(f'{k}={v}' for k, v in (env_extra or {}).items())})"
           if env_extra else ""), flush=True)
    return subprocess.run(cmd, env=env, cwd=REPO).returncode


def main(argv):
    unknown = [a for a in argv if a != "--force"]
    if unknown:
        raise SystemExit(f"[recut] unknown flag(s): {' '.join(unknown)} — "
                         "only --force is accepted")
    force = "--force" in argv

    # 1. only re-cut when the corpus actually moved
    fp_rc = step([sys.executable, os.path.join(TOOLS, "corpus_fp.py"),
                  "check"])
    if fp_rc == 0 and not force:
        raise SystemExit(
            "[recut] corpus UNCHANGED — the committed envelopes are still "
            "valid and a re-cut would discard their accumulated medians. "
            "Pass --force only for a deliberate protocol change.")
    if fp_rc == 2:
        print("[recut] no CORPUS_FP.json recorded — proceeding (the re-cut "
              "ends by recording one)", flush=True)

    # 2. sf0.1 refresh triple (back-to-back, the r10 protocol — variance
    #    is only comparable when the runs share one box session)
    dumps = []
    for i in range(1, RUNS + 1):
        dump = f"/tmp/recut_run{i}.json"
        rc = step(["sbt", "-batch", "runMain graft.Bench"],
                  {"SPARK_GRAFT_SF_DIR": SF01,
                   "SPARK_GRAFT_REFRESH": "1",
                   "SPARK_GRAFT_BENCH_FULL": dump})
        if rc != 0:
            raise SystemExit(f"[recut] FAIL: sf0.1 refresh run {i} exited "
                             f"{rc} — fix before re-cutting any envelope")
        dumps.append(dump)

    # sanity before overwriting committed files: every dump parses and
    # carries the same query set (variance.py re-checks, but failing here
    # keeps the committed envelopes untouched)
    names = None
    for d in dumps:
        qs = set(json.load(open(d))["queries_sec"])
        if names is None:
            names = qs
        elif qs != names:
            raise SystemExit(f"[recut] FAIL: {d} measures a different "
                             "query set — aborting before variance build")
    gs = [json.load(open(d)).get("run_g", 1.0) for d in dumps]
    print(f"[recut] sf0.1 triple complete, run_g = "
          f"{'/'.join(f'{g:.2f}' for g in gs)} (median "
          f"{statistics.median(gs):.2f}) — inflated boxes widen envelopes; "
          "consider re-running on a quiet box if median g > 1.15",
          flush=True)

    # 3. build the sf0.1 envelopes
    if step([sys.executable, os.path.join(TOOLS, "variance.py")] + dumps) != 0:
        raise SystemExit("[recut] FAIL: variance.py — envelopes not written")

    # 4. sf1 re-cut (regenerates /tmp/sf1 from the new sf0.1; correctness
    #    sweep gates before any timing)
    if step([sys.executable, os.path.join(TOOLS, "sf1_gate.py"),
             "--refresh", str(RUNS)]) != 0:
        raise SystemExit("[recut] FAIL: sf1 refresh — fingerprint NOT "
                         "recorded (sf0.1 envelopes were already rewritten; "
                         "finish the sf1 re-cut before recording)")

    # 5. bind the new envelopes to the new bytes — last, so a partial
    #    re-cut can never pass a gate's corpus check
    if step([sys.executable, os.path.join(TOOLS, "corpus_fp.py"),
             "record"]) != 0:
        raise SystemExit("[recut] FAIL: corpus_fp.py record")

    print("[recut] DONE. Commit together with a BASELINE.md entry:\n"
          "  BASELINE_VARIANCE.json BASELINE_QUERIES.json "
          "BASELINE_SF1_VARIANCE.json CORPUS_FP.json", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])

#!/usr/bin/env python3
"""Corpus fingerprint — makes the per-round "did the driver regenerate
/root/testdata?" check a checksum compare instead of an mtime argument.

The committed envelopes (BASELINE_VARIANCE.json, BASELINE_SF1_VARIANCE
.json) are only valid for the corpus they were measured on; the driver
regenerates /root/testdata at SOME round starts (r14, r15) but not
others (r16). Round 14 burned a re-baseline discovering this the hard
way (q_brier_decomposition 0.48→0.73 purely from the data swap), and
rounds since have argued from parquet mtimes. This pins it:

    python3 tools/corpus_fp.py record   # write CORPUS_FP.json (commit it)
    python3 tools/corpus_fp.py check    # 0 = same corpus as recorded,
                                        # 1 = MOVED -> re-cut envelopes
                                        # 2 = no fingerprint recorded

The fingerprint hashes every parquet under sf0.001/sf0.01/sf0.1 (the
driver-owned SFs; /tmp/sf1 is derived deterministically from sf0.1 by
gen_sf.py, so it needs no separate entry).
"""
import hashlib
import json
import os
import sys

# env-overridable like the JVM twin (graft.Gate.corpusMoved reads
# SPARK_GRAFT_TESTDATA / SPARK_GRAFT_CORPUS_FP): smoke tests point the
# fingerprint at a doctored copy without touching the committed file
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SFS = ["sf0.001", "sf0.01", "sf0.1"]
FP_FILE = os.environ.get(
    "SPARK_GRAFT_CORPUS_FP",
    os.path.join(os.path.dirname(__file__), "..", "CORPUS_FP.json"))


def fingerprint():
    out = {}
    for sf in SFS:
        d = os.path.join(TESTDATA, sf)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if not name.endswith(".parquet"):
                continue
            h = hashlib.md5()
            with open(os.path.join(d, name), "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            out[f"{sf}/{name}"] = h.hexdigest()
    return out


def main(argv):
    mode = argv[0] if argv else "check"
    if mode == "record":
        fp = fingerprint()
        with open(FP_FILE, "w") as f:
            json.dump({"files": fp}, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"[corpus_fp] recorded {len(fp)} files -> CORPUS_FP.json")
        return 0
    if not os.path.exists(FP_FILE):
        print("[corpus_fp] no CORPUS_FP.json recorded yet — run "
              "`tools/corpus_fp.py record` on a corpus with valid envelopes")
        return 2
    with open(FP_FILE) as f:
        recorded = json.load(f)["files"]
    current = fingerprint()
    moved = sorted(k for k in set(recorded) | set(current)
                   if recorded.get(k) != current.get(k))
    if moved:
        print("[corpus_fp] CORPUS MOVED — committed envelopes are stale; "
              "re-cut (SPARK_GRAFT_REFRESH triple + sf1_gate --refresh 3) "
              "before judging any breach. Changed files:")
        for k in moved:
            print(f"  {k}: {recorded.get(k, '<absent>')[:8]} -> "
                  f"{current.get(k, '<absent>')[:8]}")
        return 1
    print(f"[corpus_fp] corpus unchanged ({len(current)} files match) — "
          "committed envelopes remain valid")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

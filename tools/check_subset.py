#!/usr/bin/env python3
"""check.py over an explicit subset of query names (round-13 sf1 tooling:
resume a long oracle sweep past a deliberately-quadratic oracle, or
re-check just the queries a fix touched).

Usage: python3 tools/check_subset.py <sfDir> <verifyOutDir> <name,name,...|@skip:name,...>

With the @skip: prefix, checks every dumped query EXCEPT the named ones.
"""
import sys, json, glob, os
sys.path.insert(0, os.path.dirname(__file__))
import check


def main(sf_dir, out_dir, spec):
    names = sorted(os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(d))
    if spec.startswith("@skip:"):
        skip = set(spec[len("@skip:"):].split(","))
        keep = [n for n in names if n not in skip]
    else:
        keep = [n for n in names if n in set(spec.split(","))]
    import tempfile, shutil
    tmp = tempfile.mkdtemp(prefix="check_subset_")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    json.dump({k: v for k, v in oracle.items() if k in keep},
              open(f"{tmp}/oracle_sql.json", "w"))
    for n in keep:
        os.symlink(f"{out_dir}/{n}", f"{tmp}/{n}")
    try:
        return check.main(sf_dir, tmp)
    finally:
        shutil.rmtree(tmp)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))

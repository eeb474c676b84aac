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
    # relative paths would make the symlink targets below resolve inside
    # the temp dir (dangling links, every query "no spark output")
    sf_dir, out_dir = os.path.abspath(sf_dir), os.path.abspath(out_dir)
    names = sorted(os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(d))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if spec.startswith("@skip:"):
        skip = set(spec[len("@skip:"):].split(","))
        keep = [n for n in names if n not in skip]
        keep_oracle = {k: v for k, v in oracle.items()
                       if k in set(keep) or
                       (k not in skip and k not in set(names))}
    else:
        # keep derives from the REQUESTED names, not the existing output
        # dirs: a named query whose Verify run errored (no dir) must reach
        # check.main, which FAILS it loudly via its oracle entry — not be
        # silently intersected away (the q_fingerprint blind spot, for the
        # very queries the operator asked to re-check after a fix)
        requested = [n for n in spec.split(",") if n]
        unknown = sorted(n for n in requested
                         if n not in oracle and n not in set(names))
        if unknown:
            print(f"FAIL: requested names in neither oracle_sql.json nor "
                  f"{out_dir}: {','.join(unknown)}")
            return 1
        keep = [n for n in names if n in set(requested)]
        keep_oracle = {k: v for k, v in oracle.items() if k in set(requested)}
    import tempfile, shutil
    tmp = tempfile.mkdtemp(prefix="check_subset_")
    json.dump(keep_oracle, open(f"{tmp}/oracle_sql.json", "w"))
    for n in keep:
        os.symlink(f"{out_dir}/{n}", f"{tmp}/{n}")
    try:
        return check.main(sf_dir, tmp)
    finally:
        shutil.rmtree(tmp)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))

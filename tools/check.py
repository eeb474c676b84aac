#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, sorts columns by name and rows by all values, and compares.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes: strip tz (Spark emits UTC-aware, DuckDB naive) and
    # truncate to µs so equal instants compare equal as strings; Spark DATE
    # columns arrive as object-dtype datetime.date and get the same treatment
    import datetime as _dt
    for c in df.columns:
        is_dt64 = str(df[c].dtype).startswith("datetime")
        nonnull = df[c].dropna()
        is_objdate = (df[c].dtype == object and len(nonnull) > 0 and
                      isinstance(nonnull.iloc[0], (_dt.date, _dt.datetime)))
        if is_dt64 or is_objdate:
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)])
    n_pass = n_fail = n_noorc = 0
    # a query that errored in Verify leaves no result dir — that's a FAIL,
    # not a silently shorter list (caught q_fingerprint erroring unseen)
    for name in sorted(set(oracle) - set(names)):
        print(f"FAIL {name}: in oracle_sql.json but no spark output dir")
        n_fail += 1
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"ROWS-ONLY {name}: rows={len(got)} {'OK' if len(got) > 0 else 'EMPTY!'}")
            n_noorc += 1
            if len(got) == 0:
                n_fail += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        # dtype-aware compare
        bad = None
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                if gv.dtype.kind == "f" or ev.dtype.kind == "f":
                    import numpy as np
                    if not np.allclose(gv.astype(float).fillna(-1e308),
                                       ev.astype(float).fillna(-1e308),
                                       rtol=0, atol=1e-9):
                        bad = c
                        break
                else:
                    if not (gv.astype(str).fillna("NULL") == ev.astype(str).fillna("NULL")).all():
                        bad = c
                        break
            except Exception as ex:
                bad = f"{c} ({ex})"
                break
        if bad:
            print(f"FAIL {name}: column {bad} differs")
            print("  spark:", g.head(3).to_dict("records"))
            print("  oracle:", e.head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noorc} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check_oracle.py <sfDir> <outDir>

Mirrors the driver: registers each test table as a view, runs every
oracleSql entry, sorts columns by name and rows by all columns, then
compares cell values exactly (with a tiny float ulp report to debug any
near-misses). Exit code 1 if any query mismatches.
"""
import duckdb, json, math, sys
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    if len(sys.argv) > 3:  # optional name-regex filter for local iteration
        import re
        pat = re.compile(sys.argv[3])
        oracle = {k: v for k, v in oracle.items() if pat.search(k)}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        got, exp = got[gc], exp[ec]
        dt_warn = [f"{c}: {got[c].dtype}!={exp[c].dtype}" for c in gc
                   if str(got[c].dtype) != str(exp[c].dtype)]
        # normalize array cells (numpy arrays / lists) to tuples so both
        # sorting and == behave
        for c in gc:
            if got[c].dtype == object or exp[c].dtype == object:
                def norm(v):
                    if isinstance(v, dict):
                        if set(v) == {"key", "value"}:  # duckdb map repr
                            return tuple(sorted(zip(v["key"], v["value"])))
                        return tuple(sorted(v.items()))
                    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                        return tuple(v)
                    return v
                got[c] = got[c].map(norm)
                exp[c] = exp[c].map(norm)
        got = got.sort_values(by=gc).reset_index(drop=True)
        exp = exp.sort_values(by=ec).reset_index(drop=True)
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for c in gc:
            a, b = got[c], exp[c]
            for i in range(len(a)):
                x, y = a.iloc[i], b.iloc[i]
                if pd.isna(x) or pd.isna(y):
                    ok = bool(pd.isna(x)) and bool(pd.isna(y))
                else:
                    ok = x == y
                if not ok:
                    delta = ""
                    if isinstance(x, float) and isinstance(y, float):
                        delta = f" (delta={x - y:.3e})"
                    bad = f"col {c} row {i}: {x!r} != {y!r}{delta}"
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            n_fail += 1
        else:
            w = f"  [dtype warn: {', '.join(dt_warn)}]" if dt_warn else ""
            print(f"PASS {name} ({len(got)} rows){w}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check_oracle.py <sfDir> <outDir>

Mirrors the driver: registers each test table as a view, runs every
oracleSql entry, sorts columns by name and rows by all columns, then
compares cell values exactly (with a tiny float ulp report to debug any
near-misses). Exit code 1 if any query mismatches.

Besides the cell-by-cell compare, a driver-faithful HASH compare runs on
every query: each side is serialized with a type-tagged canonical form
(so Decimal('1.23') and float 1.23 hash DIFFERENTLY even though == may
hold) and sha256'd. This is the failure class that bit q54 in r03: equal
values, divergent DECIMAL serialization. A query only PASSes when both
the cell compare AND the hash compare are green.
"""
import duckdb, json, math, os, sys
from decimal import Decimal
import hashlib
import numpy as np
import pandas as pd


def canon_cell(v):
    """Type-tagged canonical string for one cell. Two cells hash equal
    only if they have the same logical type AND value — mirroring the
    driver, which canonicalizes dtypes before hashing, so a DECIMAL
    column on one side vs DOUBLE on the other is a hash mismatch even
    at equal values."""
    if v is None or v is pd.NaT:
        return "N:"
    if isinstance(v, np.integer):
        v = int(v)
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, np.bool_):
        v = bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return "f:" + repr(v)          # shortest round-trip repr
    if isinstance(v, Decimal):
        return "d:" + str(v)           # keeps scale → differs from float
    if isinstance(v, bool):
        return "b:" + str(v)
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    import datetime
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        # driver-observed behavior: DATE and midnight TIMESTAMP hash
        # equal (q13/q21/q86 were green in r03 with Spark date_trunc →
        # TIMESTAMP vs DuckDB date_trunc → DATE)
        return "t:" + str(v)
    if isinstance(v, datetime.date):
        return "t:" + str(v) + " 00:00:00"
    if isinstance(v, tuple):
        return "a:[" + ",".join(canon_cell(e) for e in v) + "]"
    try:
        if pd.isna(v):
            return "N:"
    except (TypeError, ValueError):
        pass
    return type(v).__name__ + ":" + str(v)


def frame_hash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("\x1f".join(canon_cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def hash_compare(con, out, name, sql):
    """Driver-faithful hash check. Reads BOTH sides through arrow-backed
    paths that PRESERVE logical types (duckdb .df() coerces DECIMAL to
    float64, which is exactly the information the driver's hash keys on):
    the Spark result via pyarrow (decimal → decimal.Decimal objects,
    date32 → datetime.date), the oracle via duckdb .arrow() (decimal128
    → Decimal, date → datetime.date — the same arrow conversions).
    Returns None on match, else a short reason string."""
    import pyarrow.parquet as pq
    got = pq.read_table(f"{out}/{name}").to_pandas(date_as_object=True)
    exp = con.sql(sql).arrow().to_pandas()
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        return f"hash-path columns {gc} vs {ec}"
    got, exp = got[gc].copy(), exp[ec].copy()
    # The DRIVER's comparator cannot sort container cells (pandas
    # crashes on unhashable ndarray — r07's q93_sum_map was green here
    # via normalization yet red in the binding driver gate). Refuse
    # loudly instead of normalizing, so local green ⇒ driver green:
    # serialize arrays/structs to canonical strings at the query
    # boundary (the q24_array_agg ARRAY_TO_STRING precedent).
    for df, side in ((got, "spark"), (exp, "oracle")):
        if len(df):
            for c in gc:
                s = df[c].dropna()
                if len(s) and (isinstance(s.iloc[0], (list, tuple, dict))
                               or type(s.iloc[0]).__name__ == "ndarray"):
                    return (f"col {c} ({side}) is container-typed output — "
                            "driver comparator cannot sort it; use "
                            "ARRAY_TO_STRING/array_join at the boundary")
    try:
        got = got.sort_values(by=gc).reset_index(drop=True)
        exp = exp.sort_values(by=ec).reset_index(drop=True)
    except TypeError:  # unorderable mix
        key = [df.apply(lambda r: "\x1f".join(canon_cell(v) for v in r),
                        axis=1) for df in (got, exp)]
        got = got.iloc[key[0].argsort(kind="mergesort")].reset_index(drop=True)
        exp = exp.iloc[key[1].argsort(kind="mergesort")].reset_index(drop=True)
    # DECIMAL-typed OUTPUT columns are a known driver-hash hazard even
    # when both sides hold equal Decimal values (r03's q54: Spark parquet
    # decimal vs DuckDB decimal128 canonicalize differently in the
    # driver). Every green money query casts to DOUBLE/BIGINT at the
    # boundary — enforce that here so local-green ⇒ driver-green.
    for df, side in ((got, "spark"), (exp, "oracle")):
        if len(df):
            for c in gc:
                # first NON-NULL value: a leading None/NaN must not let a
                # Decimal-typed column slip past the guard (r04 advice)
                s = df[c].dropna()
                if len(s) and isinstance(s.iloc[0], Decimal):
                    return (f"col {c} ({side}) is DECIMAL-typed output — "
                            "cast to DOUBLE/BIGINT at the query boundary")
    hg, he = frame_hash(got), frame_hash(exp)
    if hg != he:
        # pinpoint the first divergent canonical cell for the report
        for c in gc:
            for i in range(min(len(got), len(exp))):
                a, b = canon_cell(got[c].iloc[i]), canon_cell(exp[c].iloc[i])
                if a != b:
                    return f"col {c} row {i}: {a!r} != {b!r}"
        return "hash differs (row count or ordering)"
    return None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships flat files; ScaleUp output (/tmp/sf1,
        # /tmp/sf2) is a Spark directory of part files — glob it
        path = f"{sf}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
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
            continue
        # values matched cell-by-cell; now the driver-faithful hash gate
        # (catches equal values with divergent logical types, e.g.
        # DECIMAL output on one side, DOUBLE on the other).
        try:
            hbad = hash_compare(con, out, name, sql)
        except Exception as e:
            hbad = f"hash-path error: {e}"
        if hbad:
            print(f"HASHFAIL {name}: {hbad}")
            n_fail += 1
        else:
            w = f"  [dtype warn: {', '.join(dt_warn)}]" if dt_warn else ""
            print(f"PASS {name} ({len(got)} rows){w}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

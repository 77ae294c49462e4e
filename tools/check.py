#!/usr/bin/env python3
"""Local oracle checker — mirrors the driver's DuckDB hash-compare.

Usage: python3 tools/check.py [sfDir] [outDir] [name_filter]

Reads outDir/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB over views named after the parquet tables in sfDir, loads the
Spark-written parquet from outDir/<name>/, sorts columns by name and rows
by all columns, and compares cell-by-cell (numeric equality for numbers,
exact for everything else). Exit 0 iff all declared queries match.
"""
import sys, json, math, decimal
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return norm_cell(v.item())
    except ImportError:
        pass
    return v


def cells_equal(a, b):
    a, b = norm_cell(a), norm_cell(b)
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        # tolerate last-ulp float noise but flag it loudly upstream
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    filt = sys.argv[3] if len(sys.argv) > 3 else ""
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass, fails = 0, []
    for name in sorted(oracle):
        if filt and filt not in name:
            continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            fails.append((name, f"oracle SQL error: {e}"))
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            fails.append((name, f"spark output missing/unreadable: {e}"))
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            fails.append((name, f"schema: spark={list(got.columns)} oracle={list(exp.columns)}"))
            continue
        if len(exp) != len(got):
            fails.append((name, f"rowcount: spark={len(got)} oracle={len(exp)}"))
            continue
        key = [tuple(norm_cell(v) for v in row) for row in exp.itertuples(index=False)]
        key2 = [tuple(norm_cell(v) for v in row) for row in got.itertuples(index=False)]
        skey = sorted(key, key=repr)
        skey2 = sorted(key2, key=repr)
        bad = None
        for i, (r1, r2) in enumerate(zip(skey, skey2)):
            if not cells_equal(r1, r2):
                bad = (i, r1, r2)
                break
        if bad:
            fails.append((name, f"row {bad[0]}: oracle={bad[1]!r} spark={bad[2]!r}"))
        else:
            n_pass += 1
            print(f"  OK   {name} ({len(exp)} rows)")
    for name, msg in fails:
        print(f"  FAIL {name}: {msg[:500]}")
    print(f"== {n_pass} pass, {len(fails)} fail ==")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

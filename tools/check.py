#!/usr/bin/env python3
"""Local oracle checker — mirrors the DRIVER's compare, not a softer one.

Usage: python3 tools/check.py [sfDir] [outDir] [name_filter]

The driver reads the Spark-written parquet via pyarrow (so decimal128
columns surface as Python Decimal objects) and the oracle via DuckDB (so
decimals surface as float64), then hash-compares values with no tolerance.
A checker that converts Decimal->float with an epsilon reports green where
the driver reports red (round-2 failure mode). This one is faithful:

  - Spark side: pyarrow.parquet -> python objects, types preserved;
  - oracle side: DuckDB fetch -> python objects;
  - cells compare by (type-class, exact value): Decimal vs float is a
    MISMATCH even when numerically equal, float compares bit-exact,
    no epsilon anywhere.

Exit 0 iff every declared query matches.
"""
import sys, json, math, datetime, decimal
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """Normalize to a comparable (type-tag, value) pair; types NOT coerced
    across classes — Decimal stays Decimal, float stays float."""
    if v is None:
        return ("null", None)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, bytes):
        return ("bytes", v)
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, (list, tuple)):
        return ("list", tuple(norm_cell(x) for x in v))
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return ("list", tuple(norm_cell(x) for x in v.tolist()))
        if isinstance(v, np.generic):
            return norm_cell(v.item())
    except ImportError:
        pass
    return ("other", repr(v))


def _has_binary(t):
    """True if an arrow type contains a binary leaf anywhere (the driver's
    pandas comparator crashes on bytearray cells: round-14 failure mode,
    cdc_type_temporal shipped a BLOB column and the driver recorded err)."""
    import pyarrow as pa
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) \
            or pa.types.is_fixed_size_binary(t):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return _has_binary(t.value_type)
    if pa.types.is_struct(t):
        return any(_has_binary(f.type) for f in t)
    if pa.types.is_map(t):
        return _has_binary(t.key_type) or _has_binary(t.item_type)
    return False


def load_spark(outdir, name):
    """Spark result via pyarrow, exactly like the driver."""
    tbl = pq.read_table(f"{outdir}/{name}")
    bad = [f.name for f in tbl.schema if _has_binary(f.type)]
    if bad:
        raise ValueError(
            f"driver-unhashable BinaryType column(s) {bad}: the driver's "
            f"pandas comparator cannot factorize bytes — project hex() "
            f"instead")
    cols = sorted(tbl.column_names)
    data = {c: tbl.column(c).to_pylist() for c in cols}
    rows = [tuple(norm_cell(data[c][i]) for c in cols)
            for i in range(tbl.num_rows)]
    return cols, rows


def load_oracle(con, sql):
    # The driver fetches the oracle through pandas, where DuckDB HUGEINT
    # (e.g. sum(BIGINT)) and DECIMAL columns surface as float64 — while
    # fetchall() returns them as Python int/Decimal. Mirror the driver by
    # type-tagging those columns as float (round-3 failure mode:
    # agg_sign_collapse passed here, failed the driver on exactly this).
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    coerce = {name for name, typ, *_ in desc
              if typ.upper().startswith(("HUGEINT", "UHUGEINT", "DECIMAL"))}
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    fetched = cur.fetchall()
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]

    def cell(i, v):
        if names[i] in coerce and v is not None:
            v = float(v)
        return norm_cell(v)

    rows = [tuple(cell(i, r[i]) for i in order) for r in fetched]
    return cols, rows


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
        try:
            ecols, exp = load_oracle(con, oracle[name])
        except Exception as e:
            fails.append((name, f"oracle SQL error: {e}"))
            continue
        try:
            gcols, got = load_spark(outdir, name)
        except Exception as e:
            fails.append((name, f"spark output missing/unreadable: {e}"))
            continue
        if ecols != gcols:
            fails.append((name, f"schema: spark={gcols} oracle={ecols}"))
            continue
        if len(exp) != len(got):
            fails.append((name, f"rowcount: spark={len(got)} oracle={len(exp)}"))
            continue
        sexp, sgot = sorted(exp, key=repr), sorted(got, key=repr)
        bad = next(((i, a, b) for i, (a, b) in enumerate(zip(sexp, sgot))
                    if a != b), None)
        if bad:
            fails.append((name, f"row {bad[0]}: oracle={bad[1]!r} spark={bad[2]!r}"))
        else:
            n_pass += 1
            print(f"  OK   {name} ({len(exp)} rows)")
    # Sketch error bounds: the three approximate operators are non-oracle
    # by design, so their per-round evidence is the `bounds` block Bench
    # writes into bench_full.json (estimate vs exact, declared bound,
    # ok flag). Validate it when the artifact is present: a bounds entry
    # with ok=false is a red row exactly like a hash mismatch. A missing
    # artifact (fresh clone, bench not yet run) only warns — correctness
    # of the oracle-gated queries must not depend on a timing artifact.
    import os
    bench_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_full.json")
    if not filt and os.path.exists(bench_path):
        try:
            bench = json.load(open(bench_path))
        except Exception as e:
            fails.append(("bench_full.json", f"unreadable: {e}"))
            bench = {}
        bounds = bench.get("bounds")
        if bounds is None:
            print("  WARN bench_full.json carries no bounds block "
                  "(pre-r16 artifact?) — rerun the full bench")
        elif not bounds:
            # the key exists but holds {}: Bench RAN and its bounds
            # computation crashed (caught best-effort) — the evidence
            # the block exists to carry is absent, which is a red row,
            # not a warning
            fails.append(("bounds", "block empty — Bench's bounds "
                          "computation failed (see BENCH BOUNDS FAIL "
                          "on its stderr); rerun the full bench"))
        else:
            for name in sorted(bounds):
                b = bounds[name]
                if b.get("ok") is True:
                    n_pass += 1
                    print(f"  OK   bounds:{name} ({json.dumps(b)})")
                else:
                    fails.append((f"bounds:{name}",
                                  f"outside declared bound: {json.dumps(b)}"))
        # Probe-scaling claim, stated honestly (round-17): the scale
        # evidence is NOT "1x <= 10x" ordering (two rounds of warmup
        # engineering still left ~50ms inversions in the noise) but
        # "the same fixed-size probe against 10x the mass stays
        # flat-to-sublinear": ratio 10x/1x <= 1.5 for the index probes
        # (exact bucket probe, minhash band probe) and <= 2.0 for the
        # bucket-pruned state read. `latest` (a full collapse) and
        # `changes_since` carry NO flatness claim: the bench's changes
        # poll runs sinceSeq=1, so its output — and honest cost — is
        # O(changed rows), which grows WITH the 10x state (a first
        # ratio gate on it tripped at 2.01x, which is the instrument
        # behaving as designed, not a regression); their timings stay
        # in the artifact as informational series only. Probes under
        # a 50ms floor skip — a ratio of two timer-noise numbers proves
        # nothing either way.
        SCALING = [("index_reads", "index_reads_10x",
                    {"exact_probe": 1.5, "minhash_probe": 1.5}),
                   ("state_reads", "state_reads_10x",
                    {"latest_bucket_probe": 2.0})]
        for k1, k10, probes in SCALING:
            one, ten = bench.get(k1) or {}, bench.get(k10) or {}
            for probe, bound in sorted(probes.items()):
                t1, t10 = one.get(probe), ten.get(probe)
                if t1 is None or t10 is None:
                    fails.append((f"scaling:{probe}",
                                  f"missing from {k1}/{k10} — rerun the "
                                  f"full bench"))
                    continue
                if t1 < 0.05:
                    print(f"  SKIP scaling:{probe} (1x={t1:.3f}s under "
                          f"the 50ms noise floor)")
                    continue
                ratio = t10 / t1
                if ratio <= bound:
                    n_pass += 1
                    print(f"  OK   scaling:{probe} (10x/1x = {ratio:.2f}"
                          f" <= {bound})")
                else:
                    fails.append((f"scaling:{probe}",
                                  f"10x/1x = {ratio:.2f} exceeds {bound} "
                                  f"(1x={t1:.3f}s 10x={t10:.3f}s) — the "
                                  f"probe is no longer flat-to-sublinear "
                                  f"vs index/state mass"))
        # Machine-load calibration (round-18): the artifact carries a
        # fixed CPU-bound probe timed before/after the suite, so a
        # cross-round comparison can normalize for ambient load (two
        # rounds running, driver artifacts inflated ~9%/~33% near-
        # uniformly over same-HEAD builder runs). ANNOTATION ONLY —
        # never a gate: load is the machine's business, not the code's.
        cal = bench.get("calibration") or {}
        pre, post = cal.get("pre"), cal.get("post")
        if pre is not None and post is not None:
            drift = max(pre, post) / min(pre, post) if min(pre, post) > 0 else 0
            note = (" — load shifted mid-run; normalize totals against "
                    "min(pre, post)") if drift > 1.5 else ""
            print(f"  INFO calibration: pre={pre:.3f}s post={post:.3f}s "
                  f"(probe {cal.get('probe')}, min-of-{cal.get('reps')})"
                  f"{note}")
        else:
            print("  WARN bench_full.json carries no calibration block "
                  "(pre-r18 artifact?) — rerun the full bench")
    for name, msg in fails:
        print(f"  FAIL {name}: {msg[:600]}")
    print(f"== {n_pass} pass, {len(fails)} fail ==")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir in <verifyOutDir>: read the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, sort columns
by name, and compare shape + values (exact for non-floats; exact-bits then
1e-9-relative report for floats so we can see how close we are).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main(sf_dir, out_dir, skip=(), only=None):
    con = duckdb.connect()
    # bound the oracle engine so a heavy mirror degrades to disk spill or
    # a clean per-query error instead of taking the whole process (the
    # sf1.0 sweep was OOM-killed mid-board without this)
    mem = os.environ.get("GRAFT_DUCKDB_MEMLIMIT", "40GB")
    tmp = os.environ.get("GRAFT_DUCKDB_TEMPDIR", "/tmp/duckdb_spill")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET max_temp_directory_size='"
                + os.environ.get("GRAFT_DUCKDB_TEMPMAX", "60GB") + "'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_skip = 0
    for name in sorted(oracle):
        if name in skip or (only is not None and name not in only):
            n_skip += 1
            continue
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = norm(pd.read_parquet(qdir))
            want = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols got={list(got.columns)} want={list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows got={len(got)} want={len(want)}")
            n_bad += 1; continue
        bad = []
        for c in got.columns:
            g, w = got[c], want[c]
            # the driver's hash is dtype-sensitive: an int64 Spark column vs
            # a float64 oracle column (e.g. DuckDB SUM(BIGINT) -> HUGEINT ->
            # pandas float64) hashes differently even when values agree —
            # flag kind mismatches as failures so local checks catch what
            # the driver catches (r12: q139/q140/q141 pair/token counts)
            if g.dtype.kind != w.dtype.kind and not (
                    g.dtype.kind in 'iu' and w.dtype.kind in 'iu'):
                bad.append(f"{c}[DTYPE]: got={g.dtype} want={w.dtype}")
                continue
            if g.dtype.kind == 'f' or w.dtype.kind == 'f':
                ga, wa = g.astype(float).values, w.astype(float).values
                both_nan = np.isnan(ga) & np.isnan(wa)
                exact = (ga == wa) | both_nan
                gn = np.where(np.isnan(ga), 0, ga); wn = np.where(np.isnan(wa), 0, wa)
                close = np.isclose(gn, wn, rtol=1e-9, atol=1e-12) & ~(np.isnan(ga) ^ np.isnan(wa))
                if not exact.all():
                    i = int(np.argmin(exact))
                    tag = "CLOSE" if close.all() else "OFF"
                    bad.append(f"{c}[{tag}] row{i}: got={ga[i]!r} want={wa[i]!r}")
            else:
                gs = g.astype(object).where(pd.notnull(g), None)
                ws = w.astype(object).where(pd.notnull(w), None)
                eq = [str(a) == str(b) for a, b in zip(gs, ws)]
                if not all(eq):
                    i = eq.index(False)
                    bad.append(f"{c} row{i}: got={gs.iloc[i]!r} want={ws.iloc[i]!r} "
                               f"(dtypes {g.dtype}/{w.dtype})")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4])); n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
    # name the skipped count explicitly: a resumed/subset sweep must not
    # read as a full-board pass in the committed logs
    tail = f", {n_skip} skipped (--skip/--only)" if n_skip else ""
    print(f"\n{n_ok} ok, {n_bad} fail{tail}")

if __name__ == "__main__":
    # optional: --skip a,b,c (exclude) / --only a,b,c (restrict) — for
    # resuming an interrupted sweep or excluding oracles that are
    # deliberately brute-force and infeasible at large SF (the engine-side
    # result still dumps; the mirror is the bottleneck)
    skip, only, pos = set(), None, []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--skip":
            skip |= set(args[i + 1].split(",")); i += 2
        elif args[i] == "--only":
            only = set(args[i + 1].split(",")); i += 2
        else:
            pos.append(args[i]); i += 1
    main(pos[0], pos[1], skip, only)

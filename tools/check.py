#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), registers every
parquet table in <sfDir> as a DuckDB view, runs each oracle SQL, and
compares against the Spark result parquet at <outDir>/<name>/ — columns
sorted by name, values compared exactly (NaN==NaN, None==None).
"""
import json
import math
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_row(row):
    return tuple(norm_cell(v) for v in row)


def warn_untracked_artifacts():
    """Round artifacts (BENCH_r*.json, CORRECTNESS_r*.json, LEAKCHECK)
    recurred UNTRACKED at HEAD four rounds running (round-16 verdict #5)
    — surface it on every local gate run instead of trusting memory.
    Warning only: this tool's exit code is the oracle verdict."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "status", "--porcelain"],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))).stdout
    except OSError:
        return
    stale = [
        line.split(None, 1)[1]
        for line in out.splitlines()
        if line and any(
            p in line for p in ("BENCH_r", "CORRECTNESS_r", "LEAKCHECK"))
    ]
    if stale:
        print(f"WARN round artifacts not committed at HEAD: {sorted(stale)} "
              "- commit them with the round's work")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    warn_untracked_artifacts()
    only = set(sys.argv[3:])
    con = duckdb.connect()
    n_tables = 0
    for t in TABLES:
        # driver fixtures are single files; locally derived ones (ScaleUp)
        # are Spark-written directories of part files. ScaleUp fixtures
        # are PARTIAL (e.g. sf100es carries only events) - register the
        # tables that exist and let a query touching a missing one fail
        # at its own row instead of killing the whole run at setup
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
        n_tables += 1
    # a mistyped sf_dir would otherwise register nothing and surface as
    # N confusing per-query 'oracle SQL error' rows instead of one setup
    # failure
    if n_tables == 0:
        sys.exit(f"no fixture tables found under {sf_dir} - wrong sfDir?")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # same guard as Verify/Bench: a typo'd filter name must not produce
    # a "0 ok, 0 fail" run that exits 0
    unknown = only - set(oracles)
    if unknown:
        sys.exit(f"query names not in oracle_sql.json: {sorted(unknown)}")
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            n_bad += 1
            continue
        o_cols, g_cols = sorted(oracle.columns), sorted(got.columns)
        if o_cols != g_cols:
            print(f"FAIL {name}: column mismatch oracle={o_cols} spark={g_cols}")
            n_bad += 1
            continue
        dt_diff = [
            (c, str(oracle[c].dtype), str(got[c].dtype))
            for c in o_cols
            if str(oracle[c].dtype) != str(got[c].dtype)
        ]
        if dt_diff:
            print(f"WARN {name}: dtype mismatch {dt_diff}")
        o_rows = [norm_row(r) for r in oracle[o_cols].itertuples(index=False)]
        g_rows = [norm_row(r) for r in got[g_cols].itertuples(index=False)]
        if len(o_rows) != len(g_rows):
            print(f"FAIL {name}: row count oracle={len(o_rows)} spark={len(g_rows)}")
            n_bad += 1
            continue
        diffs = [
            (i, o, g) for i, (o, g) in enumerate(zip(o_rows, g_rows)) if o != g
        ]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(o_rows)} rows differ; cols={o_cols}; first:")
            for i, o, g in diffs[:3]:
                print(f"  row {i}:\n    oracle {o}\n    spark  {g}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(o_rows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

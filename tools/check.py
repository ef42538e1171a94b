#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [key ...]

For each query key: read the Spark-written parquet under
<verifyOutDir>/<key>/, run the paired oracle SQL from oracle_sql.json in
DuckDB (tables bound as views over <sfDir>/<t>.parquet), sort columns by
name (the driver does), and compare cell-by-cell with exact equality.
Exit nonzero on any mismatch. This is a dev tool only — the shipped
Scala library has no Python dependency.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def table_src(sf_dir: str, t: str) -> str:
    """Driver fixtures are single parquet files; GenSf volume fixtures
    are Spark-written directories — glob those."""
    p = f"{sf_dir}/{t}.parquet"
    return f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            pass
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet({table_src(sf_dir, t)})")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed, passed, skipped = [], [], []
    import time
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        t0 = time.time()
        print(f"... {key}", file=sys.stderr, flush=True)
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')").df()
        except Exception as e:
            failed.append((key, f"spark output unreadable: {e}"))
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            failed.append((key, f"oracle SQL error: {e}"))
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            failed.append((key, f"columns differ: spark={list(g.columns)} oracle={list(w.columns)}"))
            continue
        if g.shape != w.shape:
            failed.append((key, f"shape differs: spark={g.shape} oracle={w.shape}"))
            continue
        neq = None
        for c in g.columns:
            a, b = g[c], w[c]
            bad = ~((a == b) | (a.isna() & b.isna()))
            if bad.any():
                i = int(bad.idxmax())
                neq = (c, i, a.iloc[i], b.iloc[i], int(bad.sum()))
                break
        if neq:
            c, i, av, bv, n = neq
            failed.append((key, f"{n} diffs; first at col={c} row={i}: spark={av!r} oracle={bv!r}"))
        else:
            passed.append(key)
        print(f"... {key} {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    for k in passed:
        print(f"PASS {k}")
    for k in skipped:
        print(f"SKIP {k}")
    for k, why in failed:
        print(f"FAIL {k}: {why}")
    print(f"\n{len(passed)} passed, {len(failed)} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

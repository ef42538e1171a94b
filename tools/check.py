#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [key ...]
       python3 tools/check.py --unionfind <sfDir> <verifyOutDir>

For each query key: read the Spark-written parquet under
<verifyOutDir>/<key>/, run the paired oracle SQL from oracle_sql.json in
DuckDB (tables bound as views over <sfDir>/<t>.parquet), sort columns by
name (the driver does), and compare cell-by-cell with exact equality.
Exit nonzero on any mismatch. This is a dev tool only — the shipped
Scala library has no Python dependency.

--unionfind: the EXACT volume check for the two clustering queries,
whose DuckDB recursive-CTE oracle is infeasible at sf0.1+ (times out in
check_timeout.sh). Instead of an agreement percentage, recompute the
connected-component labels with a plain union-find over the declared
pair query's own parquet output (q_dedup_near → q_dedup_clusters,
q_dedup_minhash_verify → q_dedup_clusters_sig; millions of pairs take
seconds in Python) and compare doc_id→cluster_id, cluster_size and
is_keeper cell-exactly. The pair inputs themselves are oracle-verified
separately, so this closes the chain end to end.
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


# clusters key → the declared pair query whose output is its edge set
UF_PAIRS = {
    "q_dedup_clusters": "q_dedup_near",
    "q_dedup_clusters_sig": "q_dedup_minhash_verify",
}


def unionfind_main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id FROM read_parquet({table_src(sf_dir, 'documents')})"
    ).df()["doc_id"].to_numpy()
    ok = True
    for ckey, pkey in UF_PAIRS.items():
        cdir, pdir = f"{out_dir}/{ckey}", f"{out_dir}/{pkey}"
        if not (os.path.isdir(cdir) and os.path.isdir(pdir)):
            print(f"SKIP {ckey}: missing {cdir if not os.path.isdir(cdir) else pdir}")
            continue
        import time
        t0 = time.time()
        pairs = con.sql(
            f"SELECT a_id, b_id FROM read_parquet('{pdir}/*.parquet')").df()
        got = con.sql(
            f"SELECT doc_id, cluster_id, cluster_size, is_keeper "
            f"FROM read_parquet('{cdir}/*.parquet')").df()
        # union-find with path halving; roots carry no order semantics —
        # min-id labels are assigned per component afterwards
        parent = {int(d): int(d) for d in docs}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pairs["a_id"].to_numpy(), pairs["b_id"].to_numpy()):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[rb] = ra
        label = {}   # root → min doc_id in its component
        for d in parent:
            r = find(d)
            if r not in label or d < label[r]:
                label[r] = d
        want_label = {d: label[find(d)] for d in parent}
        size = {}
        for d, l in want_label.items():
            size[l] = size.get(l, 0) + 1
        diffs = 0
        if len(got) != len(parent):
            print(f"FAIL {ckey}: {len(got)} rows vs {len(parent)} documents")
            ok = False
            continue
        for d, cl, cs, kp in zip(got["doc_id"].to_numpy(),
                                 got["cluster_id"].to_numpy(),
                                 got["cluster_size"].to_numpy(),
                                 got["is_keeper"].to_numpy()):
            d, cl = int(d), int(cl)
            if (cl != want_label[d] or int(cs) != size[want_label[d]]
                    or bool(kp) != (d == cl)):
                diffs += 1
                if diffs == 1:
                    print(f"  first diff doc_id={d}: spark=({cl},{cs},{kp}) "
                          f"unionfind=({want_label[d]},{size[want_label[d]]},"
                          f"{d == want_label[d]})")
        n_clusters = len(size)
        if diffs:
            print(f"FAIL {ckey}: {diffs} label diffs vs union-find over "
                  f"{len(pairs)} {pkey} pairs")
            ok = False
        else:
            print(f"PASS {ckey} (union-find: {len(parent)} docs, "
                  f"{len(pairs)} pairs, {n_clusters} clusters, "
                  f"{time.time() - t0:.1f}s)")
        # q_split_leakage_safe shares clusters_sig's label graph plus a
        # deterministic md5 hash of cluster_id — close it with the same
        # union-find labels when its recursive-CTE oracle is infeasible
        if ckey == "q_dedup_clusters_sig" and not diffs:
            import hashlib
            ldir = f"{out_dir}/q_split_leakage_safe"
            if os.path.isdir(ldir):
                lgot = con.sql(
                    f"SELECT doc_id, cluster_id, split "
                    f"FROM read_parquet('{ldir}/*.parquet')").df()
                ldiffs = 0
                for d, cl, sp in zip(lgot["doc_id"].to_numpy(),
                                     lgot["cluster_id"].to_numpy(),
                                     lgot["split"].to_numpy()):
                    d, cl = int(d), int(cl)
                    want_sp = ("train" if hashlib.md5(
                        str(want_label[d]).encode()).hexdigest()[:2] < "cc"
                        else "test")
                    if cl != want_label[d] or sp != want_sp:
                        ldiffs += 1
                if len(lgot) != len(parent) or ldiffs:
                    print(f"FAIL q_split_leakage_safe: {ldiffs} diffs "
                          f"({len(lgot)} rows vs {len(parent)} docs)")
                    ok = False
                else:
                    print(f"PASS q_split_leakage_safe (union-find labels + "
                          f"md5 split, {len(lgot)} docs)")
    # q_dedup_pagerank: the 5-round CTE oracle is infeasible in DuckDB at
    # volume; replay the same exact integer iteration over the declared
    # verify-pair parquet (the graph source) and compare bit-for-bit.
    pdir = f"{out_dir}/q_dedup_pagerank"
    vdir = f"{out_dir}/q_dedup_minhash_verify"
    if os.path.isdir(pdir) and os.path.isdir(vdir):
        import math
        pairs = con.sql(
            f"SELECT a_id, b_id FROM read_parquet('{vdir}/*.parquet')").df()
        got = con.sql(
            f"SELECT doc_id, degree, rank "
            f"FROM read_parquet('{pdir}/*.parquet')").df()
        edges = []
        for a, b in zip(pairs["a_id"].to_numpy(), pairs["b_id"].to_numpy()):
            edges.append((int(a), int(b)))
            edges.append((int(b), int(a)))
        deg = {}
        for u, _ in edges:
            deg[u] = deg.get(u, 0) + 1
        rank = {int(d): 10000 for d in docs}
        for _ in range(5):
            inb = {}
            for u, w in edges:
                inb[w] = inb.get(w, 0) + int(math.floor(rank[u] / deg[u]))
            rank = {d: 1500 + int(math.floor(inb.get(d, 0) * 0.85))
                    for d in rank}
        pdiffs = 0
        for d, dg, rk in zip(got["doc_id"].to_numpy(),
                             got["degree"].to_numpy(), got["rank"].to_numpy()):
            d = int(d)
            want_q = rank[d]
            got_q = int(math.floor(rk * 10000 + 0.5))
            if got_q != want_q or int(dg) != deg.get(d, 0):
                pdiffs += 1
                if pdiffs == 1:
                    print(f"  first diff doc_id={d}: spark=({got_q},{dg}) "
                          f"replay=({want_q},{deg.get(d, 0)})")
        if len(got) != len(rank) or pdiffs:
            print(f"FAIL q_dedup_pagerank: {pdiffs} diffs "
                  f"({len(got)} rows vs {len(rank)} docs)")
            ok = False
        else:
            print(f"PASS q_dedup_pagerank (integer replay over "
                  f"{len(pairs)} verify pairs, {len(rank)} docs)")
    return 0 if ok else 1


def main() -> int:
    if sys.argv[1] == "--unionfind":
        return unionfind_main(sys.argv[2], sys.argv[3])
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

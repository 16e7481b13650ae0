#!/usr/bin/env python3
"""Parallel variant of check_oracle.py for the slow large-SF passes.

Same compare semantics (schema dtypes, row count, values with columns
sorted by name), but each query runs in its own worker process with its
own DuckDB connection, so the heavy single-query oracles (all-pairs
verification SQL, recursive-CTE connected components) overlap instead
of serializing. NOT shipped engine code — a development aid only.

  python3 tools/check_oracle_par.py <sfdir> <outdir> [workers] [only,...]
"""
import json, sys, glob
from multiprocessing import Pool

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def run_one(args):
    name, sql, sfdir, outdir = args
    import duckdb
    import pandas as pd
    import time
    t0 = time.time()
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return (name, False, "no spark output", 0.0)
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                    ignore_index=True)
    con = duckdb.connect()
    con.execute("SET threads TO 4")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        return (name, False, f"oracle error: {e}", time.time() - t0)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        return (name, False,
                f"columns {list(got.columns)} vs {list(want.columns)}",
                time.time() - t0)
    if len(got) != len(want):
        return (name, False, f"rows {len(got)} vs {len(want)}",
                time.time() - t0)
    for c in got.columns:
        g, w = got[c], want[c]
        if str(g.dtype) != str(w.dtype):
            print(f"WARN {name}.{c}: dtype {g.dtype} vs {w.dtype}",
                  flush=True)
        try:
            both_na = pd.isna(g).values & pd.isna(w).values
            eq = (g.astype(object) == w.astype(object)).values | both_na
            eq = pd.Series(eq)
            if not eq.all():
                bad = (~eq).idxmax()
                return (name, False,
                        f"col {c} first diff row {bad}: "
                        f"{g.iloc[bad]!r} vs {w.iloc[bad]!r}",
                        time.time() - t0)
        except Exception as e:
            return (name, False, f"compare error {c}: {e}", time.time() - t0)
    return (name, True, f"{len(got)} rows", time.time() - t0)

def main(sfdir, outdir, workers=6, only=None):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    items = sorted(oracle.items())
    if only:
        items = [(n, s) for n, s in items if n in only]
    jobs = [(n, s, sfdir, outdir) for n, s in items]
    n_ok = n_bad = 0
    with Pool(workers) as pool:
        for name, ok, msg, sec in pool.imap_unordered(run_one, jobs):
            if ok:
                print(f"OK   {name} ({msg}) [{sec:.1f}s]", flush=True)
                n_ok += 1
            else:
                print(f"FAIL {name}: {msg} [{sec:.1f}s]", flush=True)
                n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad", flush=True)
    return 1 if n_bad else 0

if __name__ == "__main__":
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2], w, only))

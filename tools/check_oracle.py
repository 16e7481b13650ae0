#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet dumps produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`
plus the oracle_sql.json next to them, runs each oracle in DuckDB over the
same sf directory, and compares (schema dtypes, row count, values with
columns sorted by name). NOT shipped engine code — a development aid only.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)],
                     ignore_index=True)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            ok = False
        else:
            for c in got.columns:
                g, w = got[c], want[c]
                if str(g.dtype) != str(w.dtype):
                    print(f"WARN {name}.{c}: dtype {g.dtype} vs {w.dtype}")
                try:
                    both_na = pd.isna(g).values & pd.isna(w).values
                    eq = (g.astype(object) == w.astype(object)).values | both_na
                    eq = pd.Series(eq)
                    if not eq.all():
                        bad = (~eq).idxmax()
                        print(f"FAIL {name}.{c}: first diff row {bad}: "
                              f"{g.iloc[bad]!r} vs {w.iloc[bad]!r}")
                        ok = False
                except Exception as e:
                    print(f"FAIL {name}.{c}: compare error {e}")
                    ok = False
        if ok:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
        else:
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

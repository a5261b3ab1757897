#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate: run each
oracle_sql.json entry against the sf parquet tables and compare with the
engine's parquet dump (columns sorted by name, rows sorted, values compared).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
# optional third arg: comma-separated query-name filter (local iteration)
if len(sys.argv) > 3:
    keep = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in keep}
fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name}: MISSING engine output")
        fails += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in files])
    want = con.execute(sql).df()
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if sorted(g.columns) != sorted(w.columns):
        print(f"{name}: SCHEMA mismatch {list(g.columns)} vs {list(w.columns)}")
        fails += 1
        continue
    g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    w = w.sort_values(by=list(w.columns)).reset_index(drop=True)
    if len(g) != len(w):
        print(f"{name}: ROWS {len(g)} vs {len(w)}")
        fails += 1
        continue
    # Driver-strict: an oracle column that materializes with a different
    # pandas dtype than the engine's (e.g. DuckDB HUGEINT -> float64 vs
    # engine int64) hash-mismatches in the driver even when every value is
    # numerically equal — fail it here too so that class can't pass locally.
    dt_bad = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
              if g[c].dtype != w[c].dtype]
    if dt_bad:
        print(f"{name}: DTYPE mismatch (engine vs oracle): {dt_bad}")
        fails += 1
        continue
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=True, check_exact=True)
        print(f"{name}: OK ({len(g)} rows)")
    except AssertionError as e:
        print(f"{name}: VALUE mismatch\n{str(e)[:500]}")
        print("engine head:", g.head(3).to_dict("records"))
        print("oracle head:", w.head(3).to_dict("records"))
        fails += 1

rows_only = [d.split("/")[-1] for d in sorted(glob.glob(f"{out}/q_*")) if d.split("/")[-1] not in oracle]
print(f"\nrows-only (no oracle): {rows_only}")
print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)

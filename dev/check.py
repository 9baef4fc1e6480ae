#!/usr/bin/env python3
"""Local correctness loop (mimics the driver's t2 gate): read the
parquet dumps Verify.scala wrote, run each oracle SQL in DuckDB on the
same sf dir, normalize (sort columns by name, sort rows), compare.

Usage: python3 dev/check.py [sfdir] [outdir] [key,key,...]
(the optional key list restricts the compare — for filtered Verify runs)
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pandas as pd
from pathlib import Path

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.loads((outdir / "oracle_sql.json").read_text())

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
    return df

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact — determinism is the query author's job
    return str(a) == str(b)

fails = 0
for name in sorted(oracles):
    if only is not None and name not in only:
        continue
    pdir = outdir / name
    if not pdir.exists():
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        spark_df = pq.read_table(str(pdir)).to_pandas()
        duck_df = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: cols spark={list(s.columns)} duck={list(d.columns)}")
        fails += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        fails += 1
        continue
    bad = None
    for i in range(len(s)):
        for c in s.columns:
            if not cell_eq(s.at[i, c], d.at[i, c]):
                bad = (i, c, s.at[i, c], d.at[i, c])
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: row {bad[0]} col {bad[1]!r}: spark={bad[2]!r} duck={bad[3]!r}")
        fails += 1
    else:
        print(f"OK   {name} ({len(s)} rows)")

# rows-only entries (queries without oracle): just check output exists & >0 rows
for pdir in sorted(outdir.iterdir()):
    if pdir.is_dir() and pdir.name not in oracles and (only is None or pdir.name in only):
        try:
            n = pq.read_table(str(pdir)).num_rows
            print(f"ROWS {pdir.name}: {n} rows" + ("" if n > 0 else "  <-- EMPTY!"))
            if n == 0:
                fails += 1
        except Exception as e:
            print(f"FAIL {pdir.name}: {e}")
            fails += 1

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)

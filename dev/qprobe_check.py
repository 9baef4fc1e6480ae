#!/usr/bin/env python3
"""Compare QProbe's percentile_approx outputs against DuckDB's
quantile_disc and candidate rank formulas, to pick the oracle
expression for the bounded-quantile keys (c01/c08)."""
import sys, math, collections
import duckdb

rows = []
for line in open(sys.argv[1]):
    if line.startswith("QPROBE,"):
        _, n, q, a, c = line.strip().split(",")
        rows.append((int(n), float(q), int(a), float(c)))

con = duckdb.connect()
tally = collections.Counter()
mismatch = collections.defaultdict(list)
for n, q, a, c in rows:
    vals = [i * i + 1 for i in range(1, n + 1)]
    disc = con.execute(
        "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?::BIGINT[]) AS x)",
        [q, vals]).fetchone()[0]
    cands = {
        "duck_quantile_disc": disc,
        "ceil_qn": vals[max(0, math.ceil(q * n) - 1)],
        "floor_qn_plus1": vals[min(n - 1, int(math.floor(q * n)))],
        "rint_q_nm1": vals[int(round(q * (n - 1)))],
        "ceil_q_nm1": vals[min(n - 1, math.ceil(q * (n - 1)))],
        "floor_q_nm1": vals[int(math.floor(q * (n - 1)))],
    }
    for name, v in cands.items():
        if v == a:
            tally[name] += 1
        else:
            mismatch[name].append((n, q, a, v))

total = len(rows)
print(f"total probes: {total}")
for name, cnt in tally.most_common():
    print(f"  {name}: {cnt}/{total}")
for name, ms in mismatch.items():
    if len(ms) <= 6:
        print(f"  {name} mismatches: {ms}")

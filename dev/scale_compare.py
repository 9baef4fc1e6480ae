#!/usr/bin/env python3
"""r15 scale probe: per-key scaling from sf0.1 -> sf1-equivalent (10x).

Usage: python3 dev/scale_compare.py dev/bench_r15_full.json /tmp/bench_sf1_full.json

Prints per-key t_sf1/t_sf01 ratios sorted descending. With 10x data a
perfectly data-bound key reads ~10x wall on the same 32 cores when it
was already saturating them at sf0.1, and much less when sf0.1 wall
was dominated by fixed scheduling/driver overhead (most sub-second
keys) — so the interesting signal is the TOP of the table: anything
far above 10x is super-linear beyond its data growth and needs
adjudication.
"""
import json
import sys

with open(sys.argv[1]) as f:
    base = json.load(f)
with open(sys.argv[2]) as f:
    big = json.load(f)

bq, gq = base["queries"], big["queries"]
canary = (base.get("canary_s") or 1.0, big.get("canary_s") or 1.0)
print(f"canary sf0.1={canary[0]:.2f}s sf1={canary[1]:.2f}s "
      f"(ambient ratio {canary[1]/canary[0]:.2f})")
print(f"total sf0.1={base['value']:.1f}s sf1={big['value']:.1f}s "
      f"ratio {big['value']/base['value']:.2f}")
errs = set(base.get("errors", [])) | set(big.get("errors", []))
if errs:
    print("ERRORS:", sorted(errs))

rows = []
for k in sorted(bq):
    if k in gq and bq[k] > 0:
        rows.append((gq[k] / bq[k], bq[k], gq[k], k))
rows.sort(reverse=True)
print(f"{'ratio':>7} {'sf0.1':>8} {'sf1':>8}  key")
for r, b, g, k in rows:
    flag = "  <-- super-linear?" if r > 12 and g > 2.0 else ""
    print(f"{r:7.2f} {b:8.2f} {g:8.2f}  {k}{flag}")

#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-key table from a full Bench JSON line.

Keeps the gate semantics documented in the header; only the canary and
the table refresh. Run AFTER dev/baseline_check.py has been run against
the OLD baseline (the r(N) code vs r(N-1) baseline comparison is the
gate — refreshing first would erase it).

Usage: python3 dev/baseline_refresh.py bench.json
(The header note is GENERATED from the bench artifact's own stamp —
run_id, gate verdict, canaries, and per-key machine verdicts — r18
verdict #3/#8: no hand-written adjudication prose in this file.)
"""
import json, sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    raw = open(sys.argv[1]).read().strip()
    line = raw.splitlines()[-1]
    d = json.loads(line[line.index("{"):])  # tolerate sbt's [info] prefix
    qs = d["queries"]
    canary = d.get("canary_s")
    canary_io = d.get("canary_io_s")
    spread = d.get("median_rel_spread")
    if canary is None:
        sys.exit("bench json has no canary_s")
    verdicts = d.get("gate_verdicts") or {}
    vtxt = ("; verdicts: " + ", ".join(f"{k}={v}" for k, v in
            sorted(verdicts.items()))) if verdicts else ""
    note = (f"Stamped from run `{d.get('run_id', '?')}` "
            f"(gate {d.get('gate', '?')} vs the prior baseline, "
            f"{d.get('n_keys', '?')} keys, iters {d.get('iters', '?')}"
            f"{vtxt}).")
    head = f"""# BASELINE — per-key sf0.1 bench medians

{note}
Settings: `local[32]`, `spark.sql.shuffle.partitions=32`, sf0.1,
4 interleaved passes, median per key, `median_rel_spread`
{spread} for the run.

canary_s: {canary:.3f}
{f"canary_io_s: {canary_io:.3f}" if canary_io else ""}

The canary is a fixed synthetic workload (range → hash agg → noop, no
file IO) timed once per pass; its cross-round ratio measures ambient
machine load. Gate arithmetic lives in `dev/baseline_check.py`:

    ratio(key) = (new_s / new_canary) / (base_s / base_canary)

FAIL above 2.0, warn above 1.3. Caveat learned writing this file: the
canary is CPU-saturating and over-responds to ambient load compared to
short IO-bound keys, so when canaries differ by >1.5x between runs,
read the RAW ratios alongside the normalized ones before declaring a
regression (r7→r8: raw medians flat, canary halved — every apparent
"normalized regression" was the canary moving, not the key).

| key | median_s |
| --- | --- |
"""
    rows = "".join(f"| {k} | {qs[k]:.3f} |\n" for k in sorted(qs))
    (REPO / "BASELINE.md").write_text(head + rows)
    print(f"BASELINE.md refreshed: {len(qs)} keys, canary {canary:.3f}")


if __name__ == "__main__":
    main()

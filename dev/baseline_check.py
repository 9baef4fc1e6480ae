#!/usr/bin/env python3
"""Gate a bench run against BASELINE.md — TWO-canary normalization.

BASELINE.md publishes per-key sf0.1 medians plus two canary seconds
measured in the same session: `canary_s` (ALU-bound: range → hash-agg,
no file IO) and `canary_io_s` (a fixed synthetic parquet scan + agg).
Each cancels a different ambient factor — the ALU canary over-responds
to CPU load relative to short parquet/shuffle-bound keys, the IO
canary to disk-cache state. A key is only a REGRESSION if it is slower
relative to BOTH ambient measures, so the gated ratio is

    ratio(key) = min( (new_s/new_canary)    / (base_s/base_canary),
                      (new_s/new_canary_io) / (base_s/base_canary_io) )

(falling back to the ALU-only ratio when either file predates the IO
canary). This is the r17 verdict #3 fix: r15/r16/r17 each needed a
manual adjudication paragraph because a uniform VM drift inflated
single-canary ratios across every key class; min() makes that drift
produce zero warns mechanically. A key FAILS above --threshold
(default 2.0); WARNs above --warn (default 1.3). Both per-key ratios
print so the drift class is readable at a glance.

Usage: python3 dev/baseline_check.py BENCH_rN.json [--threshold 2.0] [--warn 1.3]
(accepts the driver's front-truncated tail format, like bench_compare)
"""
import json, re, signal, sys
from pathlib import Path

signal.signal(signal.SIGPIPE, signal.SIG_DFL)

REPO = Path(__file__).resolve().parent.parent

# scalar artifact fields that must never be mistaken for query keys
NON_KEYS = ("metric", "value", "sf", "iters", "n", "rc", "cpus",
            "median_rel_spread", "n_keys", "baseline_canary_s",
            "epoch_ms", "canary_io_s", "baseline_canary_io_s",
            "vs_baseline_median", "vs_baseline_max")


def load_bench(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
        text = d.get("tail", "") if "tail" in d else raw
    except json.JSONDecodeError:
        text = raw
    pairs = re.findall(r'"([a-z][a-z0-9_]+)":([0-9]+\.?[0-9]*(?:e-?[0-9]+)?)', text)
    qs, canary = {}, None
    io = dict(pairs).get("canary_io_s")
    canary_io = float(io) if io is not None else None
    stamp = {k: v for k, v in re.findall(r'"(run_id|gate)":"([^"]*)"', text)}
    if stamp:
        print(f"[stamp] run_id={stamp.get('run_id','?')} gate={stamp.get('gate','?')}")
    for k, v in pairs:
        if k == "canary_s":
            canary = float(v)
        elif k not in NON_KEYS:
            qs[k] = float(v)
    return qs, canary, canary_io


def load_baseline():
    qs, canary, canary_io = {}, None, None
    for line in (REPO / "BASELINE.md").read_text().splitlines():
        m = re.match(r"\|\s*([a-z][a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|", line)
        if m:
            qs[m.group(1)] = float(m.group(2))
        c = re.match(r"canary_s:\s*([0-9.]+)", line.strip())
        if c:
            canary = float(c.group(1))
        ci = re.match(r"canary_io_s:\s*([0-9.]+)", line.strip())
        if ci:
            canary_io = float(ci.group(1))
    if canary is None:
        sys.exit("BASELINE.md has no `canary_s: <x>` line")
    return qs, canary, canary_io


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr, warn = 2.0, 1.3
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1])
        if a.startswith("--warn"):
            warn = float(a.split("=", 1)[1])
    if not args:
        sys.exit(__doc__)
    new_qs, new_canary, new_io = load_bench(args[0])
    base_qs, base_canary, base_io = load_baseline()
    if not new_canary:
        sys.exit("bench file has no canary_s — cannot normalize")
    two_canary = bool(new_io and base_io)
    fails = warns = 0
    rows = []
    for k in sorted(new_qs):
        if k not in base_qs:
            rows.append((None, None, None, k, new_qs[k], None, "NEW (no baseline)"))
            continue
        r_alu = (new_qs[k] / new_canary) / (base_qs[k] / base_canary)
        r_io = ((new_qs[k] / new_io) / (base_qs[k] / base_io)
                if two_canary else None)
        eff = min(r_alu, r_io) if r_io is not None else r_alu
        tag = "ok"
        if eff > thr:
            tag = f"FAIL >{thr}x"
            fails += 1
        elif eff > warn:
            tag = f"warn >{warn}x"
            warns += 1
        rows.append((eff, r_alu, r_io, k, new_qs[k], base_qs[k], tag))
    rows.sort(key=lambda r: -(r[0] or 0))
    for eff, r_alu, r_io, k, new_s, base_s, tag in rows:
        e = f"{eff:5.2f}x" if eff is not None else "  -  "
        a = f"alu={r_alu:4.2f}" if r_alu is not None else "alu= -  "
        i = f"io={r_io:4.2f}" if r_io is not None else "io=  - "
        b = f"{base_s:7.2f}" if base_s is not None else "   -   "
        print(f"{e} ({a} {i})  {k:28s} new={new_s:7.2f}s base={b}s  {tag}")
    missing = sorted(set(base_qs) - set(new_qs))
    if missing:
        print(f"MISSING from bench (errored?): {', '.join(missing)}")
    print(f"\n{fails} fail, {warns} warn, {len(rows)} keys "
          f"(alu-canary new={new_canary:.2f}s base={base_canary:.2f}s" +
          (f"; io-canary new={new_io:.2f}s base={base_io:.2f}s"
           if two_canary else "; single-canary mode") + ")")
    if not two_canary:
        print("NOTE: io canary absent in bench or baseline — gated on the "
              "ALU canary alone (pre-r17 files); read raw ratios before "
              "adjudicating warns")
    sys.exit(1 if fails or missing else 0)


if __name__ == "__main__":
    main()

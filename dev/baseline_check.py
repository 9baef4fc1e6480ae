#!/usr/bin/env python3
"""Gate a bench run against BASELINE.md.

BASELINE.md publishes per-key sf0.1 medians plus the canary second
measured in the same session (round 8 — the first full-coverage,
canary-instrumented run). This turns the judge's "within 2x of
baseline" convention into checkable arithmetic:

    ratio(key) = (new_s / new_canary) / (base_s / base_canary)

i.e. both sides are normalized by their own run's canary, cancelling
ambient machine load (the only thing the canary measures). A key FAILS
above --threshold (default 2.0); WARNs above --warn (default 1.3).

Usage: python3 dev/baseline_check.py BENCH_rN.json [--threshold 2.0] [--warn 1.3]
(accepts the driver's front-truncated tail format, like bench_compare)
"""
import json, re, signal, sys
from pathlib import Path

signal.signal(signal.SIGPIPE, signal.SIG_DFL)

REPO = Path(__file__).resolve().parent.parent


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
    if io is not None:
        load_bench.canary_io = float(io)
    stamp = {k: v for k, v in re.findall(r'"(run_id|gate)":"([^"]*)"', text)}
    if stamp:
        print(f"[stamp] run_id={stamp.get('run_id','?')} gate={stamp.get('gate','?')}")
    for k, v in pairs:
        if k == "canary_s":
            canary = float(v)
        elif k not in ("metric", "value", "sf", "iters", "n", "rc", "cpus",
                       "median_rel_spread", "n_keys", "baseline_canary_s", "epoch_ms", "canary_io_s", "baseline_canary_io_s",
                       "vs_baseline_median", "vs_baseline_max"):
            qs[k] = float(v)
    return qs, canary


def load_baseline():
    qs, canary = {}, None
    for line in (REPO / "BASELINE.md").read_text().splitlines():
        m = re.match(r"\|\s*([a-z][a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|", line)
        if m:
            qs[m.group(1)] = float(m.group(2))
        c = re.match(r"canary_s:\s*([0-9.]+)", line.strip())
        if c:
            canary = float(c.group(1))
    if canary is None:
        sys.exit("BASELINE.md has no `canary_s: <x>` line")
    return qs, canary


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
    new_qs, new_canary = load_bench(args[0])
    base_qs, base_canary = load_baseline()
    if not new_canary:
        sys.exit("bench file has no canary_s — cannot normalize")
    fails = warns = 0
    rows = []
    for k in sorted(new_qs):
        if k not in base_qs:
            rows.append((None, k, new_qs[k], None, "NEW (no baseline)"))
            continue
        ratio = (new_qs[k] / new_canary) / (base_qs[k] / base_canary)
        tag = "ok"
        if ratio > thr:
            tag = f"FAIL >{thr}x"
            fails += 1
        elif ratio > warn:
            tag = f"warn >{warn}x"
            warns += 1
        rows.append((ratio, k, new_qs[k], base_qs[k], tag))
    rows.sort(key=lambda r: -(r[0] or 0))
    for ratio, k, new_s, base_s, tag in rows:
        r = f"{ratio:5.2f}x" if ratio is not None else "  -  "
        b = f"{base_s:7.2f}" if base_s is not None else "   -   "
        print(f"{r}  {k:28s} new={new_s:7.2f}s base={b}s  {tag}")
    missing = sorted(set(base_qs) - set(new_qs))
    if missing:
        print(f"MISSING from bench (errored?): {', '.join(missing)}")
    print(f"\n{fails} fail, {warns} warn, {len(rows)} keys "
          f"(canary new={new_canary:.2f}s base={base_canary:.2f}s)")
    io = getattr(load_bench, "canary_io", None)
    base_io = None
    for line in (REPO / "BASELINE.md").read_text().splitlines():
        m = re.match(r"canary_io_s:\s*([0-9.]+)", line.strip())
        if m:
            base_io = float(m.group(1))
    if io is not None and base_io:
        print(f"io-canary new={io:.2f}s base={base_io:.2f}s "
              f"ratio={io/base_io:.2f} (parquet-bound ambient; compare "
              f"with raw-key drift before adjudicating warns)")
    sys.exit(1 if fails or missing else 0)


if __name__ == "__main__":
    main()

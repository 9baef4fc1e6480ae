#!/usr/bin/env python3
"""Cross-round bench comparison with ambient-load normalization.

The driver's BENCH_r{N}.json stores the TAIL of Bench's one-line JSON
(long lines get front-truncated), so keys are recovered by regex, not
json.load. From round 7 on, Bench times a fixed synthetic canary
workload each pass and reports its median as `canary_s`; dividing every
key by the round's canary cancels the shared machine-load factor that
made whole rounds look uniformly ~16% faster/slower with zero code
change (r5→r6).

Usage: python3 dev/bench_compare.py BENCH_rA.json BENCH_rB.json [--threshold 1.15]
Prints per-key normalized ratios (B/A; >1 = slower), the median, and
flags regressions above the threshold.
"""
import json, re, signal, sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # clean exit under `| head`

def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
        text = d.get("tail", "") if "tail" in d else raw
    except json.JSONDecodeError:
        text = raw
    pairs = re.findall(r'"([a-z][a-z0-9_]+)":([0-9]+\.?[0-9]*(?:e-?[0-9]+)?)', text)
    qs, canary = {}, None
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

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.15
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else float(
                sys.argv[sys.argv.index(a) + 1])
    qa, ca = load(args[0])
    qb, cb = load(args[1])
    norm = ca is not None and cb is not None
    if not norm:
        print("NOTE: canary_s missing in at least one file (pre-r7 rounds) — "
              "raw ratios only; a uniform shift is ambient load, not code.")
    factor = (cb / ca) if norm else 1.0
    common = sorted(set(qa) & set(qb))
    if not common:
        print("no common keys"); sys.exit(1)
    ratios = {}
    for k in common:
        if qa[k] > 0:
            ratios[k] = (qb[k] / qa[k]) / factor
    med = sorted(ratios.values())[len(ratios) // 2]
    print(f"keys: {len(ratios)}  canary {args[0]}={ca}  {args[1]}={cb}  "
          f"load factor={factor:.3f}")
    print(f"median normalized ratio (B/A): {med:.3f}")
    regressions = {k: r for k, r in ratios.items() if r > thr}
    improvements = {k: r for k, r in ratios.items() if r < 1 / thr}
    for title, d in (("REGRESSIONS", regressions), ("improvements", improvements)):
        if d:
            print(f"{title} (threshold {thr}):")
            for k, r in sorted(d.items(), key=lambda x: -x[1]):
                print(f"  {r:6.2f}  {k}  ({qa[k]:.3f}s -> {qb[k]:.3f}s)")
    # from r16 Bench emits its own canary-normalized vs-BASELINE reading
    # ("vs:<key>" map + vs_baseline_median/max) INTO the artifact; print
    # it when present so nobody re-derives it from raw medians by hand.
    raw_b = open(args[1]).read()
    self_med = re.search(r'"vs_baseline_median":([0-9.]+)', raw_b)
    if self_med:
        worst = {k: float(v) for k, v in
                 re.findall(r'"vs:([a-z][a-z0-9_]+)":([0-9.]+)', raw_b)}
        worst = sorted(worst.items(), key=lambda x: -x[1])[:5]
        print(f"self-reported vs BASELINE (canary-normalized): "
              f"median {float(self_med.group(1)):.3f}, worst: "
              + ", ".join(f"{k}={v:.2f}" for k, v in worst))
    missing_b = sorted(set(qa) - set(qb))
    if missing_b:
        print("keys vanished in B (truncation or failure):", ", ".join(missing_b))
    sys.exit(2 if regressions else 0)

if __name__ == "__main__":
    main()

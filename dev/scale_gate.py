#!/usr/bin/env python3
"""Per-round SCALE gate (r17 verdict #8): catch super-linear scaling
regressions mechanically instead of by judge request.

Runs graft.tools.ScaleProbe on the pipeline cohort at sf0.1
(/root/testdata/sf0.1) and sf1 (/tmp/sf1 — Sf1Gen's 10x replication,
regenerated here if missing), computes each key's 10x-data wall-clock
ratio, and gates it against dev/scale_baseline.tsv.

r19 methodology (r18 verdict #1): each key runs PASSES alternating
sf0.1/sf1 legs and the gate takes min() per leg — a within-run ambient
phase can no longer land between a key's two legs and inflate a single
denominator (the r18b d09 artifact that needed a human adjudication
paragraph). The min() legs make the ratio self-normalizing without any
prose.

    gate(key): FAIL  if ratio > max(2.0 * base_ratio, base_ratio + 2.0)
               WARN  if ratio > max(1.5 * base_ratio, base_ratio + 1.0)

(the additive floor keeps sub-linear keys — fixed-overhead-dominated,
ratio < 2 — from failing on absolute jitter; the c31-class regression
this gate exists for moved 2.4 -> 21.9, far past either form).
Keys with no baseline entry report as NEW, never fail.

r19 rotation (r18 verdict #7): --rotate rN swaps the last ROTATE_SLOTS
core slots for ROTATE_SLOTS keys drawn deterministically (seeded by N)
from every OTHER registered key (graft.tools.KeyList), so each key
sees a 10x leg within ~(n_keys/ROTATE_SLOTS) rounds without growing
the run. Rotated keys usually report NEW; --update-baseline stamps
them for their next visit.

Usage:
  python3 dev/scale_gate.py --out dev/scale_gate_r19.txt --rotate r19
  python3 dev/scale_gate.py --update-baseline   # re-stamp after gating
  python3 dev/scale_gate.py --keys d04_ngram_jaccard,...  # subset
  python3 dev/scale_gate.py --passes 3          # more leg interleaving
"""
import os, re, subprocess, sys, time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1"
BASELINE = REPO / "dev" / "scale_baseline.tsv"
CP = (f"{REPO}/target/scala-2.13/classes:"
      f"{REPO}/target/scala-2.13/test-classes:/opt/spark/jars/*")

# the core pipeline cohort: the dedup/curation funnels and the
# state-bounded aggregate family (the shapes that CAN go super-linear),
# plus c31 (the one key that ever did) and the multimodal decoders.
# The last ROTATE_SLOTS entries are the rotation slots.
KEYS = [
    "d02_minhash_lsh", "d04_ngram_jaccard", "d09_curate_pipeline",
    "d12_dup_clusters", "d13_pretrain_e2e", "d15_incremental_neardup",
    "d21_semantic_dedup", "d25_substring_dedup", "d27_containment_dedup",
    "t08_pack_sequences", "t11_global_shuffle", "t16_dsir",
    "t17_bpe_train", "a05_quantile", "c31_ch_agg_extras",
    "a11_quantiles_multi", "a16_window_funnel", "c08_parametric",
    "m05_png_decode", "m06_wav_decode",
]
ROTATE_SLOTS = 5


def ensure_sf1():
    if Path(SF1, "documents.parquet", "_SUCCESS").exists():
        return
    print(f"[scale_gate] {SF1} missing — regenerating via Sf1Gen (10x sf0.1)")
    subprocess.run(["java", "-cp", CP, "graft.tools.Sf1Gen", SF1, "10"],
                   check=True, stderr=subprocess.DEVNULL)


def rotated_keys(round_tag):
    """Swap the last ROTATE_SLOTS core slots for a deterministic pick
    from the non-core registered keys, seeded by the round number."""
    n = int(re.sub(r"[^0-9]", "", round_tag) or 0)
    out = subprocess.run(["java", "-cp", CP, "graft.tools.KeyList"],
                         capture_output=True, text=True, check=True)
    all_keys = [k for k in out.stdout.split() if re.match(r"^[a-z]\d{2}_", k)]
    pool = sorted(set(all_keys) - set(KEYS))
    if not pool:
        return KEYS
    picks = [pool[(n * ROTATE_SLOTS + i) % len(pool)]
             for i in range(ROTATE_SLOTS)]
    picks = list(dict.fromkeys(picks))  # dedupe, keep order
    keys = KEYS[:-ROTATE_SLOTS] + picks
    print(f"[scale_gate] rotation {round_tag}: {', '.join(picks)}")
    return keys


def run_probe(keys, passes):
    cmd = ["java", "-cp", CP, "graft.tools.ScaleProbe",
           f"{SF01},{SF1}", ",".join(keys), str(passes)]
    out = subprocess.run(cmd, capture_output=True, text=True)
    if out.returncode != 0:
        sys.exit(f"ScaleProbe failed:\n{out.stderr[-2000:]}")
    times, canaries = {}, []
    for line in out.stdout.splitlines():
        m = re.match(r"probe,([a-z0-9_]+|canary),([^,]*),(-?[0-9.]+)", line)
        if not m:
            continue
        key, d, s = m.group(1), m.group(2), float(m.group(3))
        if key == "canary":
            canaries.append(s)
        else:
            times.setdefault(key, {}).setdefault(d, []).append(s)
    # min() per leg across the alternating passes: the best shot is the
    # least ambient-taxed one, and both legs get the same treatment
    mins = {k: {d: (min(v) if all(x > 0 for x in v) else -1.0)
                for d, v in legs.items()}
            for k, legs in times.items()}
    return mins, canaries


def load_baseline():
    base = {}
    if BASELINE.exists():
        for line in BASELINE.read_text().splitlines():
            if line.startswith("#") or not line.strip():
                continue
            k, s01, s1, r = line.split("\t")
            base[k] = (float(s01), float(s1), float(r))
    return base


def main():
    out_path = None
    keys = KEYS
    update = False
    passes = 2
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--out":
            out_path = Path(argv[i + 1])
        if a.startswith("--keys"):
            keys = argv[i + 1].split(",") if "=" not in a else a.split("=", 1)[1].split(",")
        if a == "--rotate":
            keys = rotated_keys(argv[i + 1])
        if a == "--passes":
            passes = int(argv[i + 1])
        if a == "--update-baseline":
            update = True
    ensure_sf1()
    times, canaries = run_probe(keys, passes)
    base = load_baseline()
    lines = [
        f"# scale gate — {time.strftime('%Y-%m-%d %H:%M:%S')} — "
        f"min of {passes} interleaved passes per leg",
        f"# sf0.1={SF01}  sf1={SF1} (10x data)  "
        f"canary start={canaries[0]:.3f} end={canaries[-1]:.3f}"
        if canaries else "# (no canary line?)",
        f"# {'key':26s} {'sf0.1':>7s} {'sf1':>7s} {'ratio':>6s} "
        f"{'base':>6s}  verdict",
    ]
    fails = warns = 0
    rows = []
    for k in keys:
        t = times.get(k, {})
        s01, s1 = t.get(SF01, -1.0), t.get(SF1, -1.0)
        if s01 <= 0 or s1 <= 0:
            rows.append((k, s01, s1, None, None, "ERROR (probe failed)"))
            fails += 1
            continue
        ratio = s1 / s01
        if k not in base:
            rows.append((k, s01, s1, ratio, None, "NEW (no baseline)"))
            continue
        br = base[k][2]
        verdict = "ok"
        if ratio > max(2.0 * br, br + 2.0):
            verdict = f"FAIL (> max(2.0*{br:.1f}, {br:.1f}+2.0))"
            fails += 1
        elif ratio > max(1.5 * br, br + 1.0):
            verdict = f"warn (> max(1.5*{br:.1f}, {br:.1f}+1.0))"
            warns += 1
        rows.append((k, s01, s1, ratio, br, verdict))
    rows.sort(key=lambda r: -(r[3] or 99))
    for k, s01, s1, ratio, br, verdict in rows:
        r = f"{ratio:6.2f}" if ratio is not None else "   -  "
        b = f"{br:6.2f}" if br is not None else "   -  "
        lines.append(f"  {k:26s} {s01:7.2f} {s1:7.2f} {r} {b}  {verdict}")
    lines.append(f"# verdict: {fails} fail, {warns} warn, {len(rows)} keys")
    report = "\n".join(lines) + "\n"
    print(report)
    if out_path:
        out_path.write_text(report)
        print(f"[scale_gate] wrote {out_path}")
    if update:
        # merge: keep prior entries for keys not probed this run (the
        # rotation means each run sees only part of the key universe)
        merged = {k: (v[0], v[1], v[2]) for k, v in load_baseline().items()}
        for k, t in times.items():
            if t.get(SF01, -1) > 0 and t.get(SF1, -1) > 0:
                merged[k] = (t[SF01], t[SF1], t[SF1] / t[SF01])
        hdr = ("# per-key sf0.1/sf1 seconds + 10x ratio — scale_gate.py "
               f"baseline (min of {passes} interleaved passes), stamped "
               f"{time.strftime('%Y-%m-%d %H:%M:%S')}\n")
        body = "".join(f"{k}\t{v[0]:.3f}\t{v[1]:.3f}\t{v[2]:.3f}\n"
                       for k, v in sorted(merged.items()))
        BASELINE.write_text(hdr + body)
        print(f"[scale_gate] baseline re-stamped: {BASELINE}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

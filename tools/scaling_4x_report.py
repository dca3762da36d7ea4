#!/usr/bin/env python3
"""Summarizes the 4x-input campaign JSONs (tools/bench_scaling_4x.sh) into
the BENCH.md input-scale-invariance tables: best wall / best cpu-per-row per
level, work efficiency, best-of-levels and per-round-paired wall
efficiencies, and determinism check."""
import json, glob, sys
from collections import defaultdict

n, n4 = int(sys.argv[1]), int(sys.argv[2])
d = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_scaling_r4_4x"

def load(prefix, level):
    out = {}
    for f in sorted(glob.glob(f"{d}/{prefix}_n{level}_r*.json")):
        ts = f.rsplit("_r", 1)[1].split(".")[0]
        out[ts] = json.load(open(f))
    return out

for prefix, label in [("narrow8m", "narrow 8M x ~400 B"),
                      ("wide600k", "wide 600k x ~33 KB")]:
    a, b = load(prefix, n), load(prefix, n4)
    if not a or not b:
        print(f"(no {prefix} runs)")
        continue
    wa = min(r["elapsed_sec"] for r in a.values())
    wb = min(r["elapsed_sec"] for r in b.values())
    ca = min(r["cpu_us_per_row"] for r in a.values())
    cb = min(r["cpu_us_per_row"] for r in b.values())
    rows = next(iter(a.values()))["rows"]
    eff = (rows / wb) / (rows / wa) / (n4 / n)
    paired = [f"{(av['elapsed_sec'] / b[ts]['elapsed_sec']) / (n4 / n):.2f}"
              for ts, av in sorted(a.items()) if ts in b]
    vio = {r["violations"] for r in list(a.values()) + list(b.values())}
    print(f"### {label}")
    print(f"| level | best wall (s) | best cpu us/row | runs (wall s) |")
    print(f"|---|---|---|---|")
    wallsA = " / ".join(f"{r['elapsed_sec']:.1f}" for _, r in sorted(a.items()))
    wallsB = " / ".join(f"{r['elapsed_sec']:.1f}" for _, r in sorted(b.items()))
    print(f"| local[{n}] | {wa:.1f} | {ca:.2f} | {wallsA} |")
    print(f"| local[{n4}] | {wb:.1f} | {cb:.2f} | {wallsB} |")
    print(f"- work efficiency (best cpu/row ratio): **{ca / cb:.2f}**")
    print(f"- wall efficiency best-of-levels: **{eff:.2f}**; paired per round: "
          + " / ".join(paired))
    print(f"- determinism: violations={sorted(vio)} "
          + ("IDENTICAL" if len(vio) == 1 else "MISMATCH!"))
    print()

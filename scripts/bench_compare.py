"""Scaling-ladder comparison of two bench.py outputs.

Usage: python scripts/bench_compare.py small.json big.json [data_factor=10]

Prints one row per query: seconds at each scale and the time scaling
factor, flagging queries whose time grows faster than the data factor
(super-linear — a scale smell worth a plan audit). Sub-100ms baselines
are noise-dominated in this sandbox (2-3x run-to-run drift) and are
marked accordingly rather than flagged.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(set(qs) & set(qb)):
        s, b = qs[name], qb[name]
        ratio = b / s if s > 0 else float("inf")
        noise = s < 0.1
        rows.append((name, s, b, ratio, noise))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':38} {'t_small':>8} {'t_big':>8} {'ratio':>7}  note")
    flagged = []
    for name, s, b, ratio, noise in rows:
        note = ""
        if noise:
            note = "sub-100ms baseline (noise)"
        elif ratio > factor:
            note = f"SUPER-LINEAR (> {factor:g}x)"
            flagged.append(name)
        print(f"{name:38} {s:8.3f} {b:8.3f} {ratio:6.1f}x  {note}")
    ts, tb = small.get("value"), big.get("value")
    if ts and tb:
        print(f"\ntotal: {ts:.1f}s -> {tb:.1f}s ({tb / ts:.1f}x at "
              f"{factor:g}x data)")
    print(f"super-linear (excl. noise-floor): {flagged or 'none'}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Registry-wide scaling sweep report (r9 directive 5): run bench.py at
sf0.1 and at the synthetic sf1.0 fixture (tools/make_scale_fixture.py)
and write BENCH_SCALE.md with per-query sec(sf1.0)/sec(sf0.1) ratios.
10x data through a linear operator on a fixed-size executor pool should
cost <= ~10x; anything past the flag threshold (15x = 10x data + 50%
headroom) is a potential scaling cliff and gets investigated or
documented.

Usage:
  python tools/bench_scale.py <sf01_bench.json> <sf10_bench.json>
(each file = the one-line JSON bench.py prints; run both on a quiet
host, sf1.0 via SPARK_GRAFT_SF_DIR=/tmp/sf1.0.)
"""

from __future__ import annotations

import json
import os
import sys

FLAG_RATIO = 15.0
# fixed-latency floor: a query whose sf0.1 time is dominated by Spark
# job scheduling (~0.3s) shows a meaningless ratio; measure cliffs only
# where the base time is real work
MIN_BASE_SEC = 0.15


def main() -> None:
    sf01 = json.load(open(sys.argv[1]))
    sf10 = json.load(open(sys.argv[2]))
    q01, q10 = sf01["queries"], sf10["queries"]
    rows = []
    for name in sorted(q01):
        if name not in q10:
            continue
        base, big = q01[name], q10[name]
        ratio = big / base if base > 0 else float("inf")
        rows.append((name, base, big, ratio))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[3] >= FLAG_RATIO and r[1] >= MIN_BASE_SEC]
    small_base = [r for r in rows if r[3] >= FLAG_RATIO and r[1] < MIN_BASE_SEC]

    lines = [
        "# BENCH_SCALE — registry-wide 10x scaling sweep (r12)",
        "",
        "10x fixture: tools/make_scale_fixture.py replicates sf0.1 with",
        "key-consistent id shifts (joins keep their fan-out), per-replica",
        "letter-permuted document text and sign-flipped embeddings (so the",
        "dedup families measure scaling, not a 10-clone explosion).",
        f"Totals: sf0.1 {sf01['value']:.1f}s -> sf1.0 {sf10['value']:.1f}s "
        f"({sf10['value']/sf01['value']:.1f}x on 10x data, "
        f"{len(rows)} common queries).",
        "",
        f"Flag threshold: ratio >= {FLAG_RATIO:.0f}x with a base time >= "
        f"{MIN_BASE_SEC}s. Flagged: {len(flagged)}.",
        "",
        "| query | sf0.1 s | sf1.0 s | ratio |",
        "|---|---|---|---|",
    ]
    for name, base, big, ratio in rows:
        mark = " **<- FLAG**" if (name, base, big, ratio) in flagged else ""
        lines.append(f"| {name} | {base:.2f} | {big:.2f} | {ratio:.1f}x{mark} |")
    if small_base:
        lines += [
            "",
            "Ratios >= 15x on sub-0.15s base times (fixed-latency floor, "
            "not scaling cliffs): "
            + ", ".join(f"{n} ({r:.0f}x)" for n, _, _, r in small_base),
        ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_SCALE.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}; flagged={[(r[0], round(r[3],1)) for r in flagged]}")


if __name__ == "__main__":
    main()

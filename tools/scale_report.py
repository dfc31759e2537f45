"""Compare two bench.py JSON outputs (e.g. sf0.1 vs sf1) and report
per-query wall-time scaling.

Usage: python tools/scale_report.py SMALL.json BIG.json [data_ratio]

data_ratio defaults to big.sf / small.sf.  A query is flagged when its
wall-time ratio exceeds the data ratio by more than 50% AND the big-sf
time is over a second (sub-second queries are dominated by fixed plan
overhead, where ratios are noise).  Linear-in-data (ratio ≈ data_ratio)
is the pass bar; well under it means fixed overhead dominates, which is
fine.
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    for label, art in (("small", small), ("big", big)):
        if art.get("quiet_window") is False:
            print(f"WARNING: {label} artifact was benched under load "
                  f"(loadavg_start={art.get('loadavg_start')}) — "
                  "ratios below are contention noise, re-measure "
                  "before trusting or committing them")
    data_ratio = (float(sys.argv[3]) if len(sys.argv) > 3
                  else big["sf"] / small["sf"])
    rows = []
    for name, t_big in big["queries"].items():
        t_small = small["queries"].get(name)
        if t_small is None:
            continue
        ratio = t_big / t_small if t_small > 0 else float("inf")
        flag = ratio > data_ratio * 1.5 and t_big > 1.0
        rows.append((ratio, name, t_small, t_big, flag))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[4]]
    print(f"{'query':34s} {'small':>8s} {'big':>8s} {'ratio':>7s}")
    for ratio, name, t_small, t_big, flag in rows:
        mark = "  <-- SUPER-LINEAR" if flag else ""
        print(f"{name:34s} {t_small:8.3f} {t_big:8.3f} {ratio:7.2f}{mark}")
    print(f"\ndata ratio {data_ratio:g}x; "
          f"{len(flagged)} flagged of {len(rows)} compared; "
          f"total {small['value']:.1f}s -> {big['value']:.1f}s "
          f"({big['value'] / small['value']:.2f}x)")
    sys.exit(0)


if __name__ == "__main__":
    main()

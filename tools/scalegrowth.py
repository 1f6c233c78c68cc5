#!/usr/bin/env python3
"""Compare per-query wall-clock across two ProbeMain timing runs (e.g.
sf0.1 vs sf1) and flag superlinear growth.

ProbeMain (SPARK_GRAFT_PROBE=time) prints lines like
    q01_pricing_summary: 1.234 s (runs: 1.30, 1.23)
Feed two such logs plus the data-size ratio; anything growing faster
than RATIO x SLACK is flagged as a candidate hidden quadratic. Queries
with sub-second baselines are held to an absolute floor instead (fixed
planning overhead dominates them and ratios are noise).

Usage: scalegrowth.py <small.log> <big.log> [ratio=10] [slack=1.5]
"""
import re
import sys


def parse(path):
    out = {}
    for line in open(path):
        m = re.match(r"(?:\[info\] )?(\w+): ([0-9.]+) s \(runs:", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def main():
    if len(sys.argv) < 3:
        sys.exit("usage: scalegrowth.py <small.log> <big.log> "
                 "[ratio=10] [slack=1.5]")
    small_p, big_p = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    slack = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
    small, big = parse(small_p), parse(big_p)
    rows = []
    for q in sorted(small):
        if q not in big:
            continue
        s, b = small[q], big[q]
        grew = b / s if s > 0 else float("inf")
        # small baselines are planning-overhead-dominated: flag only on
        # absolute blowup (> ratio x slack x 1s), not on the ratio
        flagged = (grew > ratio * slack) if s >= 1.0 \
            else (b > ratio * slack)
        rows.append((q, s, b, grew, flagged))
    if not rows:
        sys.exit("no queries appear in BOTH logs — check the probe names "
                 "and log paths")
    print(f"{'query':<28} {'small':>8} {'big':>8} {'growth':>7}  flag")
    for q, s, b, g, f in sorted(rows, key=lambda r: -r[3]):
        print(f"{q:<28} {s:>8.2f} {b:>8.2f} {g:>6.1f}x  "
              f"{'SUPERLINEAR' if f else ''}")
    n_flag = sum(1 for r in rows if r[4])
    tot_s = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print(f"\n{len(rows)} queries, totals {tot_s:.1f}s -> {tot_b:.1f}s "
          f"({tot_b / tot_s:.1f}x at {ratio:.0f}x data), "
          f"{n_flag} flagged superlinear")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()

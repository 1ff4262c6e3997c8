#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Reads the Verify.scala output dir (per-query parquet + oracle_sql.json),
runs each oracle SQL in DuckDB against the same sf tables, and compares:
schema (column names sorted), row count, and values (exact; floats must
match bitwise since queries are built for exactness).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([d for d in os.listdir(out_dir)
                    if os.path.isdir(f"{out_dir}/{d}")])
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            exp = con.sql(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        g = got[gc].sort_values(gc).reset_index(drop=True)
        e = exp[ec].sort_values(ec).reset_index(drop=True)
        bad = None
        for c in gc:
            for i, (a, b) in enumerate(zip(g[c], e[c])):
                eq = (a == b) or (a is None and b is None)
                try:
                    if not eq and math.isnan(a) and math.isnan(b):
                        eq = True
                except (TypeError, ValueError):
                    pass
                if not eq:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

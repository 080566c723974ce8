#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, and compares: schema (sorted column names), row count, and
value hash (rows sorted by all columns, columns sorted by name).
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{files[0]}'")
        got_cols, got_rows = [c.lower() for c in got.columns], got.fetchall()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got_rows)} rows)"); continue
        try:
            exp = con.sql(oracle[name])
            exp_cols, exp_rows = [c.lower() for c in exp.columns], exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: schema {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_fail += 1; continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} vs {len(exp_rows)}")
            n_fail += 1; continue
        g, e = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"   spark : {g[bad]}")
            print(f"   duckdb: {e[bad]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got_rows)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

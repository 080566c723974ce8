#!/usr/bin/env python3
"""Compare two graft.Verify output dirs entry-by-entry.

Usage: python3 tools/diff_runs.py <dirA> <dirB> [--json OUT.json]

For every query subdir present in both runs, loads each parquet result,
canonicalizes it exactly like the driver's gate (columns sorted by name,
rows sorted by stringified values, floats rounded to 6), and reports
EQUAL or DIFFER. This is the LAYOUT-INVARIANCE check: run Verify twice
under different parallelism/shuffle configs and diff — it covers the
rows-only (no-oracle) entries that the DuckDB gate cannot see.

--json OUT.json additionally writes a diffable artifact (compared/equal/
differ counts + the differing entry names + both dirs), so an axis run's
result is re-verifiable from the repo instead of living as prose
(r17 verdict #3: the multi-JVM "253 equal / 0 differ" evidence had no
committed artifact). `run_local_cluster_axis.sh` wraps it with masters.
"""
import json, sys, os, glob
import duckdb

def norm(v):
    if isinstance(v, float):
        # NaN != NaN would flag bit-identical runs as DIFFER
        if v != v:
            return "nan"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out

def load(con, d):
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        return None, None
    # read the whole directory glob, not files[0]: Verify coalesces to one
    # part today, but a multi-part output must not silently compare partial
    rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
    return [c.lower() for c in rel.columns], rel.fetchall()

def main(a_dir, b_dir, json_out=None):
    con = duckdb.connect()
    names = sorted(set(os.listdir(a_dir)) & set(os.listdir(b_dir)))
    names = [n for n in names if os.path.isdir(f"{a_dir}/{n}")]
    n_eq = n_diff = 0
    differ_names = []
    for name in names:
        ca, ra = load(con, f"{a_dir}/{name}")
        cb, rb = load(con, f"{b_dir}/{name}")
        if ra is None or rb is None:
            print(f"MISSING {name}"); n_diff += 1
            differ_names.append(name); continue
        if sorted(ca) != sorted(cb):
            print(f"DIFFER {name}: schema {sorted(ca)} vs {sorted(cb)}")
            n_diff += 1; differ_names.append(name); continue
        ga, gb = canon(ra, ca), canon(rb, cb)
        if ga != gb:
            bad = next((i for i in range(min(len(ga), len(gb)))
                        if ga[i] != gb[i]), None)
            print(f"DIFFER {name}: rows {len(ga)} vs {len(gb)}"
                  + (f"; first diff at sorted-row {bad}:"
                     f"\n   A: {ga[bad]}\n   B: {gb[bad]}"
                     if bad is not None else ""))
            n_diff += 1; differ_names.append(name); continue
        n_eq += 1
    print(f"\n{n_eq} equal, {n_diff} differ, {len(names)} compared")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"dir_a": a_dir, "dir_b": b_dir,
                       "compared": len(names), "equal": n_eq,
                       "differ": n_diff, "differ_names": differ_names},
                      f, indent=0)
        print(f"wrote {json_out}")
    return 1 if n_diff else 0

if __name__ == "__main__":
    args = sys.argv[1:]
    out = None
    if "--json" in args:
        i = args.index("--json")
        out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sys.exit(main(args[0], args[1], out))

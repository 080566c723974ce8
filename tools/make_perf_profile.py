#!/usr/bin/env python3
"""Build PERF_PROFILE.json from one or more BENCH_DETAIL json files.

    python3 tools/make_perf_profile.py PERF_PROFILE.json DETAIL.json [...]

The profile is the bench's quiet-run reference: per entry, the MINIMUM
exec_run_sec / jit_sec / wall across the given runs (a quiet run lower-
bounds scheduled compute) and the UNION of plan fingerprints seen (main
plan_fp plus every retry sample's). Bench.scala reads it to fire the
self-inflation retry gate (exec_run_sec > 3x profile at any foreign
load) and the plan-flip gate (fingerprint outside the quiet set).
Regenerate whenever query plans change at HEAD, from a quiet full run:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      sbt -batch 'runMain graft.Bench'
    python3 tools/make_perf_profile.py PERF_PROFILE.json BENCH_DETAIL_last.json
"""
import json
import sys


def main(out_path, detail_paths):
    entries = {}
    meta = {}
    for dp in detail_paths:
        with open(dp) as f:
            d = json.load(f)
        # Refuse to union incomparable runs: mins and fingerprint sets
        # only mean something across details that share the normalizer
        # version, cpu count, and sf. Last-wins meta previously let a
        # stale detail stamp the profile with the WRONG fp_version
        # (absent -> plan_flip permanently disarmed) or mix exec mins
        # from different-parallelism plans.
        if meta:
            for key in ("sf", "fp_version"):
                if d.get(key) != prior.get(key):
                    sys.exit(f"{dp}: {key}={d.get(key)!r} differs from "
                             f"{prior.get(key)!r} in earlier input — "
                             "details are incomparable, not merging")
            if d.get("host", {}).get("cpus_requested") != meta["cpus"]:
                sys.exit(f"{dp}: cpus_requested differs from earlier "
                         "input — details are incomparable, not merging")
        prior = d
        meta = {
            "generated_from": detail_paths,
            "wall_start": d.get("host", {}).get("wall_start"),
            "sf": d.get("sf"),
            # the REQUESTED cpu count, not available_processors: Bench
            # disarms the profile when its SPARK_GRAFT_CPUS differs
            # (plans depend on defaultParallelism — see BENCH_NOTES.md)
            "cpus": d.get("host", {}).get("cpus_requested"),
            # normalizer version of the fingerprints below: Bench
            # disarms the plan_flip gate (fps only — exec gates stay
            # armed) when its own fp_version differs
            "fp_version": d.get("fp_version"),
        }
        walls = d.get("queries", {})
        for name, m in d.get("query_meta", {}).items():
            fps = set()
            if m.get("plan_fp"):
                fps.add(m["plan_fp"])
            for s in m.get("samples", []):
                if s.get("plan_fp"):
                    fps.add(s["plan_fp"])
            fps.discard("err")
            e = entries.setdefault(name, {
                "wall": float("inf"), "exec_run_sec": float("inf"),
                "jit_sec": float("inf"), "plan_fps": set()})
            e["wall"] = min(e["wall"], walls.get(name, float("inf")))
            e["exec_run_sec"] = min(e["exec_run_sec"],
                                    m.get("exec_run_sec", float("inf")))
            e["jit_sec"] = min(e["jit_sec"], m.get("jit_sec", float("inf")))
            e["plan_fps"] |= fps
    out = {**meta, "entries": {
        k: {"wall": round(v["wall"], 3),
            "exec_run_sec": round(v["exec_run_sec"], 3),
            "jit_sec": round(v["jit_sec"], 3),
            "plan_fps": sorted(v["plan_fps"])}
        for k, v in sorted(entries.items())}}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}: {len(entries)} entries")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2:])

#!/usr/bin/env bash
# Multi-JVM execution-invariance axis (r16 verdict #1): run the full
# query catalog with REAL worker/executor JVMs (standalone local-cluster
# master) and diff against a default local[n] run. This is the only axis
# that crosses a process boundary: custom Expression serialization,
# broadcast lifecycle, executor-side memo caches (TokenizerStore,
# WordPiece/Unigram apply state) and task scheduling all serialize for
# real here, single-host notwithstanding.
#
#   tools/run_local_cluster_axis.sh [sfDir] [outBase] [axisJson]
#
# Produces <outBase>_default and <outBase>_lc, runs tools/diff_runs.py,
# and writes the diff result as a committed-diffable artifact
# (<axisJson>, default AXIS.json — r17 verdict #3: the "253 equal /
# 0 differ" evidence previously lived only as prose) recording both
# masters, the sf dir, the HEAD commit, and per-entry equal/differ
# counts + names. Exit code is the diff's (1 on any mismatch), so the
# script is a round-close gate.
#
# SPARK_SCALA_VERSION is required: executor JVMs are launched through
# the release-layout launcher, which cannot infer the Scala version
# without it (the "Cannot find any build directories" failure).
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/axis}"
AXIS_JSON="${3:-AXIS.json}"
cd "$(dirname "$0")/.."

SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify $SF_DIR ${OUT}_default"

SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify $SF_DIR ${OUT}_lc"

python3 tools/diff_runs.py "${OUT}_default" "${OUT}_lc" \
  --json "${AXIS_JSON}.tmp"
python3 - "$AXIS_JSON" "$SF_DIR" <<'EOF'
import json, subprocess, sys
out, sf = sys.argv[1], sys.argv[2]
d = json.load(open(out + ".tmp"))
head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                      text=True).stdout.strip()
rec = {"metric": "multi_jvm_axis", "sf": sf,
       "master_a": "local[32]", "master_b": "local-cluster[2,8,4096]",
       "head": head}
rec.update(d)
json.dump(rec, open(out, "w"), indent=0)
import os
os.remove(out + ".tmp")
print("wrote", out)
EOF

#!/usr/bin/env bash
# Multi-JVM execution-invariance axis (r16 verdict #1): run the full
# query catalog with REAL worker/executor JVMs (standalone local-cluster
# master) and diff against a default local[n] run. This is the only axis
# that crosses a process boundary: custom Expression serialization,
# broadcast lifecycle, executor-side memo caches (TokenizerStore,
# WordPiece/Unigram apply state) and task scheduling all serialize for
# real here, single-host notwithstanding.
#
#   tools/run_local_cluster_axis.sh [sfDir] [outBase]
#
# Produces <outBase>_default and <outBase>_lc, then runs
# tools/diff_runs.py. Exit code is the diff's (1 on any mismatch).
#
# SPARK_SCALA_VERSION is required: executor JVMs are launched through
# the release-layout launcher, which cannot infer the Scala version
# without it (the "Cannot find any build directories" failure).
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/axis}"
cd "$(dirname "$0")/.."

SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify $SF_DIR ${OUT}_default"

SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify $SF_DIR ${OUT}_lc"

python3 tools/diff_runs.py "${OUT}_default" "${OUT}_lc"

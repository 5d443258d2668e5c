#!/bin/bash
# Paired interleaved A/B bench (the r14 #1 verdict ask): build a REFERENCE
# commit's classes in a throwaway worktree, then run every gate query on
# the reference build and the current build back-to-back in one wall-clock
# window (two BenchServe JVMs, one query in flight at a time) so ambient
# load cancels pairwise. Writes BENCH_PAIRED.json; exits nonzero on any
# >=1.5x AND >=0.3s paired regression.
#
# Usage: scripts/run_bench_paired.sh [refCommit] [sfDir] [cpus] [only,...]
#   refCommit default: the last round-close commit whose bench archive we
#   compare against (HEAD works for a self-calibration run: expect every
#   ratio ~1.0 — that run MEASURES the harness noise floor).
set -e
cd "$(dirname "$0")/.."
REF=${1:-HEAD}
SF=${2:-/root/testdata/sf0.1}
CPUS=${3:-32}
ONLY=${4:-}

REFSHA=$(git rev-parse --short "$REF")
WT=/tmp/graft_paired_ref_$REFSHA

sbt -batch compile > /dev/null

if [ ! -d "$WT/target/scala-2.13/classes" ]; then
  git worktree remove -f "$WT" 2>/dev/null || true
  git worktree add -f "$WT" "$REFSHA"
  # The server main may postdate the reference commit: compile it INTO
  # the reference build (harness-side patch, identical bytes both sides;
  # it only touches SparkEntry.queries + ToolSession, stable since r12).
  cp src/main/scala/graft/BenchServe.scala "$WT/src/main/scala/graft/"
  (cd "$WT" && sbt -batch compile > /dev/null)
fi

ARGS=(--sf "$SF" --cpus "$CPUS" --ref-label "$REFSHA")
# Subset runs must not clobber the committed full-suite artifact.
if [ -n "$ONLY" ]; then ARGS+=(--only "$ONLY" --out BENCH_PAIRED_SUBSET.json); fi
python3 scripts/bench_paired.py \
  "$WT/target/scala-2.13/classes" target/scala-2.13/classes "${ARGS[@]}"

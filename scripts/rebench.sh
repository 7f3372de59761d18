#!/bin/bash
# Re-anchor BASELINE.md: N steady-state graft.Bench runs per scale factor
# (fresh JVM each run — min-of-runs strips ambient load, never cache warmth),
# then make_baseline.py takes the per-query min.
set -e
cd "$(dirname "$0")/.."
N="${1:-6}"
: > bench_runs/runs_sf001.jsonl
: > bench_runs/runs_sf01.jsonl
for i in $(seq 1 "$N"); do
  echo "[rebench] sf0.01 run $i/$N" >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '^{"metric"' >> bench_runs/runs_sf001.jsonl
done
for i in $(seq 1 "$N"); do
  echo "[rebench] sf0.1 run $i/$N" >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '^{"metric"' >> bench_runs/runs_sf01.jsonl
done
python3 scripts/make_baseline.py bench_runs/runs_sf001.jsonl bench_runs/runs_sf01.jsonl

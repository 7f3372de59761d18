#!/bin/bash
# Round-16 measurement chain (run serially — timed runs must never share
# the box with other CPU work):
#   1. sf0.1 isolated fresh-JVM anchors (x3, 3 trials) for the round's
#      new/changed ops: q_bpe_encode_counts q_image_neardup (new),
#      q_overlap_counts (disjointness check added), q_bpe_merges
#      q_bpe_apply q_bpe_encode (memoized — steady-state anchors)
#   2. COLD sub-anchors (x3 fresh JVMs, 3 trials, SPARK_GRAFT_COLD=1 —
#      sweep hygiene BETWEEN trials, so every trial pays the full state
#      build) for the memo-riding queries: q_label_prop q_dedup_clusters
#      q_group_split q_dedup_prio + the BPE chain (VERDICT r15 item 2)
#   3. sf1 decade readings for the new/changed set (TRIALS=2)
#   4. sf10 decade readings for the new/changed set (TRIALS=1, cold) +
#      the isolated q_label_prop sf10 re-adjudication (VERDICT item 1)
#   5. StreamScale with state telemetry at sf0.1 / sf1 / sf10 (item 7)
#   6. canonical sf0.1 bench (full headline, 2 sweeps)
#   7. FULL-headline sf10 COLD sweep (TRIALS=1; documented skip set)
set -x
cd "$(dirname "$0")/.."

SF1=/root/repo/testdata_sf1
SF10=/root/repo/testdata_sf10
NEWOPS=q_bpe_encode_counts,q_image_neardup,q_overlap_counts,q_bpe_merges,q_bpe_apply,q_bpe_encode
COLDOPS=q_label_prop,q_dedup_clusters,q_group_split,q_dedup_prio,q_bpe_merges,q_bpe_apply,q_bpe_encode,q_bpe_encode_counts

echo "=== [1/7] sf0.1 anchors x3 (fresh JVM each) ==="
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_TRIALS=3 \
    SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=16 \
    SPARK_GRAFT_ONLY=$NEWOPS \
    sbt -batch 'runMain graft.Bench' 2>/dev/null \
    | grep '^{"metric"' | grep -v '"queries":{}' >> bench_runs/anchors_r16_newops.jsonl
  echo "ANCHOR_RUN${i}_EXIT=$?"
done

echo "=== [2/7] COLD sub-anchors x3 (fresh JVM each, sweep between trials) ==="
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_TRIALS=3 \
    SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=16 \
    SPARK_GRAFT_COLD=1 SPARK_GRAFT_ONLY=$COLDOPS \
    sbt -batch 'runMain graft.Bench' 2>/dev/null \
    | grep '^{"metric"' | grep -v '"queries":{}' >> bench_runs/anchors_r16_cold.jsonl
  echo "COLD_RUN${i}_EXIT=$?"
done

echo "=== [3/7] sf1 decade readings ==="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_TRIALS=2 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=16 \
  SPARK_GRAFT_ONLY=$NEWOPS \
  sbt -batch 'runMain graft.Bench' > /tmp/r16_sf1_newops.log 2>&1
echo "SF1_EXIT=$?"

echo "=== [4/7] sf10 decade readings (cold) + q_label_prop isolated ==="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_TRIALS=1 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=16 \
  SPARK_GRAFT_ONLY=$NEWOPS \
  sbt -batch 'runMain graft.Bench' > /tmp/r16_sf10_newops.log 2>&1
echo "SF10_NEWOPS_EXIT=$?"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_TRIALS=1 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=16 \
  SPARK_GRAFT_COLD=1 SPARK_GRAFT_ONLY=q_label_prop \
  sbt -batch 'runMain graft.Bench' > /tmp/r16_sf10_labelprop.log 2>&1
echo "SF10_LABELPROP_EXIT=$?"

echo "=== [5/7] StreamScale with state telemetry ==="
SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=16 \
  sbt -batch 'runMain graft.StreamScale' > /tmp/r16_stream_scale.log 2>&1
echo "STREAMSCALE_EXIT=$?"

echo "=== [6/7] canonical sf0.1 bench (full headline, 2 sweeps) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ROUND=16 \
  sbt -batch 'runMain graft.Bench' > /tmp/r16_canonical_sf01.log 2>&1
echo "CANONICAL_EXIT=$?"

echo "=== [7/7] FULL-headline sf10 COLD sweep ==="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_TRIALS=1 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_ROUND=16 \
  SPARK_GRAFT_SKIP=q_triangles,q_overlap_sessions \
  sbt -batch 'runMain graft.Bench' > /tmp/r16_sf10_full.log 2>&1
echo "SF10_FULL_EXIT=$?"

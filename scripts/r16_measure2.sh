#!/bin/bash
# Round-16 follow-up measurements (serial, idle box — run AFTER
# r16_measure.sh):
#   A. cold sub-anchors for q_group_split (missed by the first pass:
#      ONLY filters the Headline list and it was not yet a member) +
#      steady re-anchor of q_overlap_counts with the structural
#      checkDisjoint=false caller flag
#   B. COLD sf1 readings for the BPE chain (the TRIALS=2 defaults ride
#      the round-16 memo at trial 2 — decade columns must be cold/cold)
#   C. sf10 isolated re-reads: q_overlap_counts (post-flag),
#      q_image_neardup (x2), q_label_prop (x2 — the VERDICT item 1
#      re-adjudication)
set -x
cd "$(dirname "$0")/.."

SF1=/root/repo/testdata_sf1
SF10=/root/repo/testdata_sf10

echo "=== [A] q_group_split cold + q_overlap_counts steady anchors x3 ==="
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_TRIALS=3 \
    SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=16 \
    SPARK_GRAFT_COLD=1 SPARK_GRAFT_ONLY=q_group_split \
    sbt -batch 'runMain graft.Bench' 2>/dev/null \
    | grep '^{"metric"' | grep -v '"queries":{}' >> bench_runs/anchors_r16_cold.jsonl
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_TRIALS=3 \
    SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=16 \
    SPARK_GRAFT_ONLY=q_overlap_counts,q_group_split \
    sbt -batch 'runMain graft.Bench' 2>/dev/null \
    | grep '^{"metric"' | grep -v '"queries":{}' >> bench_runs/anchors_r16_newops.jsonl
  echo "A_RUN${i}_EXIT=$?"
done

echo "=== [B] COLD sf1 readings for the BPE chain ==="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_TRIALS=2 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=16 \
  SPARK_GRAFT_COLD=1 \
  SPARK_GRAFT_ONLY=q_bpe_merges,q_bpe_apply,q_bpe_encode,q_bpe_encode_counts \
  sbt -batch 'runMain graft.Bench' > /tmp/r16_sf1_bpe_cold.log 2>&1
echo "B_EXIT=$?"

echo "=== [C] sf10 isolated re-reads ==="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_TRIALS=1 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=16 \
  SPARK_GRAFT_ONLY=q_overlap_counts,q_image_neardup \
  sbt -batch 'runMain graft.Bench' > /tmp/r16_sf10_rereads1.log 2>&1
echo "C1_EXIT=$?"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_TRIALS=1 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=16 \
  SPARK_GRAFT_ONLY=q_image_neardup \
  sbt -batch 'runMain graft.Bench' > /tmp/r16_sf10_rereads2.log 2>&1
echo "C2_EXIT=$?"
for i in 1 2; do
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_TRIALS=1 \
    SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=16 \
    SPARK_GRAFT_COLD=1 SPARK_GRAFT_ONLY=q_label_prop \
    sbt -batch 'runMain graft.Bench' > /tmp/r16_sf10_labelprop_$i.log 2>&1
  echo "LP${i}_EXIT=$?"
done

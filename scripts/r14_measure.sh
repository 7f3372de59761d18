#!/bin/bash
# Round-14 measurement chain (run serially — timed runs must never share
# the box with other CPU work):
#   1. sf0.1 isolated fresh-JVM anchors (x3, 3 trials) for the top-k-
#      rewrite family (VERDICT r13 item 3) + the round's new/changed ops:
#      q_knn_hubs q_label_consistency q_ann_recall q_embed_ivf2
#      q_knn_classify q_ppr_seeds q_bpe_merges q_rrf_fusion
#   2. sf1 decade readings for the new/changed ops (same subset)
#   3. TokenMat rehearsal at sf1 (VERDICT item 6)
#   4. streaming restart rehearsal, 7 ops, sf1 tape (VERDICT item 5)
#   5. the FULL-headline sf10 two-decade sweep (VERDICT item 1) —
#      everything except the documented q_triangles exact-wedge skip
#   6. TokenMat rehearsal at sf10
set -x
cd "$(dirname "$0")/.."

SF1=/root/repo/testdata_sf1
SF10=/root/repo/testdata_sf10
ANCH=q_knn_hubs,q_label_consistency,q_ann_recall,q_embed_ivf2,q_knn_classify,q_ppr_seeds,q_bpe_merges,q_rrf_fusion

echo "=== [1/6] sf0.1 anchors x3 (fresh JVM each) ==="
: > bench_runs/anchors_r14_newops.jsonl
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_TRIALS=3 \
    SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=14 \
    SPARK_GRAFT_ONLY=$ANCH \
    sbt -batch 'runMain graft.Bench' 2>/dev/null \
    | grep '^{"metric"' | grep -v '"queries":{}' >> bench_runs/anchors_r14_newops.jsonl
  echo "ANCHOR_RUN${i}_EXIT=$?"
done

echo "=== [2/6] sf1 decade readings for the new/changed ops ==="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_TRIALS=2 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=14 \
  SPARK_GRAFT_ONLY=$ANCH \
  sbt -batch 'runMain graft.Bench' > /tmp/r14_sf1_newops.log 2>&1
echo "SF1_EXIT=$?"

echo "=== [3/6] TokenMat at sf1 ==="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_ROUND=14 \
  sbt -batch "runMain graft.TokenMat $SF1" > /tmp/r14_tokenmat_sf1.log 2>&1
echo "TOKENMAT_SF1_EXIT=$?"

echo "=== [4/6] streaming restart rehearsal (7 ops, sf1 tape) ==="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_ROUND=14 \
  sbt -batch "runMain graft.streaming.RestartRehearsal $SF1 /tmp/r14_restart_sf1" \
  > /tmp/r14_restart_sf1.log 2>&1
echo "RESTART_EXIT=$?"

echo "=== [5/6] FULL-headline sf10 two-decade sweep ==="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_TRIALS=2 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=14 \
  SPARK_GRAFT_SKIP=q_triangles \
  sbt -batch 'runMain graft.Bench' > /tmp/r14_sf10_sweep.log 2>&1
echo "SF10_EXIT=$?"

echo "=== [6/6] TokenMat at sf10 ==="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_ROUND=14 \
  sbt -batch "runMain graft.TokenMat $SF10" > /tmp/r14_tokenmat_sf10.log 2>&1
echo "TOKENMAT_SF10_EXIT=$?"

echo "=== chain done ==="

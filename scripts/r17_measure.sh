#!/bin/bash
# Round-17 measurement chain (run serially — timed runs must never share
# the box with other CPU work):
#   1. plan_audit_r17 (final adaptive plans, every registered query) +
#      strict allowlist check
#   2. sf0.1 isolated fresh-JVM anchors (x3, 3 trials) for the round's
#      new/changed ops: q_image_neardup (signature changed to the
#      pixel-block hash), q_image_neardup_counts q_ann_curve
#      q_html_extract (new)
#   3. sf1 decade readings for the new/changed set (TRIALS=2)
#   4. sf10 decade readings (TRIALS=1) + the q_label_prop isolated COLD
#      re-adjudication x2 (VERDICT r16 item 4: idle-box spread)
#   5. StreamScale with the listener-captured state telemetry (ADVICE
#      r16 item 4) at sf0.1 / sf1 / sf10
#   6. canonical sf0.1 bench (full headline, 2 sweeps)
#   7. FULL-headline sf10 COLD sweep (TRIALS=1; documented skip set)
set -x
cd "$(dirname "$0")/.."

SF1=/root/repo/testdata_sf1
SF10=/root/repo/testdata_sf10
NEWOPS=q_image_neardup,q_image_neardup_counts,q_ann_curve,q_html_extract

echo "=== [1/7] plan audit (strict) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  sbt -batch 'runMain graft.PlanAudit' > bench_runs/plan_audit_r17.jsonl 2>/dev/null
python3 scripts/plan_audit.py --strict bench_runs/plan_audit_r17.jsonl bench_runs/plan_audit_r16.jsonl
echo "PLAN_AUDIT_EXIT=$?"

echo "=== [2/7] sf0.1 anchors x3 (fresh JVM each) ==="
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_TRIALS=3 \
    SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=17 \
    SPARK_GRAFT_ONLY=$NEWOPS \
    sbt -batch 'runMain graft.Bench' 2>/dev/null \
    | grep '^{"metric"' | grep -v '"queries":{}' >> bench_runs/anchors_r17_newops.jsonl
  echo "ANCHOR_RUN${i}_EXIT=$?"
done

echo "=== [3/7] sf1 decade readings ==="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_TRIALS=2 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=17 \
  SPARK_GRAFT_ONLY=$NEWOPS \
  sbt -batch 'runMain graft.Bench' > /tmp/r17_sf1_newops.log 2>&1
echo "SF1_EXIT=$?"

echo "=== [4/7] sf10 decade readings + q_label_prop isolated cold x2 ==="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_TRIALS=1 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=17 \
  SPARK_GRAFT_ONLY=$NEWOPS \
  sbt -batch 'runMain graft.Bench' > /tmp/r17_sf10_newops.log 2>&1
echo "SF10_NEWOPS_EXIT=$?"
for i in 1 2; do
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_TRIALS=2 \
    SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=17 \
    SPARK_GRAFT_COLD=1 SPARK_GRAFT_ONLY=q_label_prop \
    sbt -batch 'runMain graft.Bench' > /tmp/r17_sf10_labelprop_$i.log 2>&1
  echo "SF10_LABELPROP_RUN${i}_EXIT=$?"
done

echo "=== [5/7] StreamScale with listener state telemetry ==="
SPARK_DRIVER_MEM=24g SPARK_GRAFT_ROUND=17 \
  sbt -batch 'runMain graft.StreamScale' > /tmp/r17_stream_scale.log 2>&1
echo "STREAMSCALE_EXIT=$?"

echo "=== [6/7] canonical sf0.1 bench (full headline, 2 sweeps) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ROUND=17 \
  sbt -batch 'runMain graft.Bench' > /tmp/r17_canonical_sf01.log 2>&1
echo "CANONICAL_EXIT=$?"

echo "=== [7/7] FULL-headline sf10 COLD sweep ==="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_TRIALS=1 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_ROUND=17 \
  SPARK_GRAFT_SKIP=q_triangles,q_overlap_sessions \
  sbt -batch 'runMain graft.Bench' > /tmp/r17_sf10_full.log 2>&1
echo "SF10_FULL_EXIT=$?"

#!/bin/bash
# Round-13 measurement chain (run serially — timed runs must never share
# the box with other CPU work):
#   1. the 42-query sf10 sweep re-run (VERDICT r12 item 1; r12 methodology:
#      best-of-2 trials, one sweep, streaming off) — Bench.durableWrite now
#      makes the artifact un-clobberable
#   2. q_knn_hubs x3 isolated fresh-JVM runs WITH per-stage profiles
#      (item 5: pin which stage carries the 162-430 s spread)
#   3. _sliced oracle parity at sf10 (item 3: the adaptive 1/256 slice)
#   4. streaming mid-tape kill/restart rehearsal on the sf1 tape (item 6)
set -x
cd "$(dirname "$0")/.."

SF10=/root/repo/testdata_sf10
Q42=q1_pricing,q3_topk,q5_region,q6_forecast,q9_profit,q_fold_agg,q_moments,q_zonemap,q_zorder,q_diversity,q_asof_join,q_range_join,q_running_stats,q_ewma,q_cusum,q_sessionize,q_dedup_minhash,q_dedup_simhash_pairs,q_minhash_est,q_cdc_chunks,q_sorted_dedup,q_dedup_clusters,q_embed_lsh,q_embed_ivf,q_semdedup,q_knn_hubs,q_embed_quant,q_pq_adc,q_token_count,q_wordcount,q_curation,q_ppl_buckets_scale,q_bm25,q_tfidf_topterms,q_bloom_decontam,q_dup_ngram,q_pagerank,q_bfs_hops,q_triangles_approx,q_funnel,q_retention,q_attribution

echo "=== [1/4] sf10 42-query sweep ==="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_TRIALS=2 \
  SPARK_GRAFT_SWEEPS=1 SPARK_GRAFT_STREAM=0 SPARK_GRAFT_ROUND=13 \
  SPARK_GRAFT_ONLY=$Q42 \
  sbt -batch 'runMain graft.Bench' > /tmp/r13_sf10_sweep.log 2>&1
echo "SWEEP_EXIT=$?"

echo "=== [2/4] q_knn_hubs isolated x3 with stage profile ==="
for i in 1 2 3; do
  SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.StageProfile q_knn_hubs $SF10" \
    > /tmp/r13_knnhubs_run$i.log 2>&1
  echo "KNN_RUN${i}_EXIT=$?"
done

echo "=== [3/4] sliced oracle parity at sf10 ==="
SLICED="q_dedup_clusters_sliced q_group_split_sliced q_dedup_survivors_sliced q_dedup_prio_sliced q_dedup_savings_sliced q_triangles_sliced q_prefix_jaccard_sliced q_copurchase_sliced"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=16 \
  sbt -batch "runMain graft.Verify $SF10 /tmp/r13_verify_sf10 $SLICED" \
  > /tmp/r13_verify_sf10.log 2>&1
echo "VERIFY_EXIT=$?"
python3 scripts/check.py $SF10 /tmp/r13_verify_sf10 $SLICED \
  > /tmp/r13_check_sf10.log 2>&1
echo "CHECK_EXIT=$?"

echo "=== [4/4] sf1 streaming restart rehearsal ==="
SPARK_DRIVER_MEM=16g \
  sbt -batch 'runMain graft.streaming.RestartRehearsal /root/repo/testdata_sf1 /tmp/r13_restart_sf1' \
  > /tmp/r13_restart_sf1.log 2>&1
echo "RESTART_EXIT=$?"

echo "=== chain done ==="

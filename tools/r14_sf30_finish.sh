#!/bin/bash
# Final leg of the round-14 sf30 (300×) probe. Already PASSed at sf30
# (logs /tmp/r14_sf30.log): dedup_pipeline, dedup_ngram, dedup_minhash,
# dedup_incremental, dedup_simhash, ann_lsh_auto. This script runs the
# remaining compares (fresh DuckDB process per entry; JVM never alive
# concurrently), the two stepwise oracles (clusters: re-inlined CTE
# rounds OOM; substrings: single-pipeline explode×window×anti-join OOMs
# at 30× — stage-materialized instead), then the graft sf30 wall-times.
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SF=/tmp/graft_sf30
OUT=/tmp/verify_sf30_r14

echo "== [1/4] fast_compare remaining entries (fresh process each) =="
for e in dedup_embed_auto decontam_overlap ann_ivf_auto dedup_semantic_auto; do
  timeout 7200 python3 tools/fast_compare.py "$OUT" "$SF" "$e" || echo "[compare-rc=$?] $e"
done

echo "== [2/4] dedup_substrings stepwise =="
timeout 7200 python3 tools/stepwise_compare.py "$OUT" "$SF" dedup_substrings || echo "[stepwise-rc=$?] dedup_substrings"

echo "== [3/4] dedup_clusters stepwise =="
timeout 7200 python3 tools/clusters_stepwise.py "$OUT" "$SF" || echo "[clusters-rc=$?]"

echo "== [4/4] graft sf30 wall-times (MicroBench entry, sentinel-bracketed) =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_SENTINEL_SEC=1.0 \
  java -Xmx96g -cp "$CP" graft.ops.MicroBench entry dedup_clusters dedup_pipeline dedup_ngram dedup_minhash dedup_substrings dedup_incremental dedup_simhash ann_lsh_auto dedup_embed_auto dedup_semantic_auto ann_ivf_auto decontam_overlap 2>/dev/null
echo "== sf30 finish done =="

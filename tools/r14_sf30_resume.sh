#!/bin/bash
# Resume of tools/r14_sf30.sh after the 02:23 VM restart killed it
# mid-entry-3: dedup_pipeline and dedup_ngram already PASSED (log
# /tmp/r14_sf30.log); this picks up at dedup_minhash. Same discipline:
# fresh DuckDB process per entry, JVM and DuckDB never alive together.
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SF=/tmp/graft_sf30
OUT=/tmp/verify_sf30_r14
ENTRIES="dedup_minhash dedup_substrings dedup_incremental dedup_simhash ann_lsh_auto dedup_embed_auto dedup_semantic_auto ann_ivf_auto decontam_overlap"

echo "== [1/3] fast_compare per entry (resume; fresh process each) =="
for e in $ENTRIES; do
  timeout 3600 python3 tools/fast_compare.py "$OUT" "$SF" "$e" || echo "[compare-rc=$?] $e"
done

echo "== [2/3] dedup_clusters stepwise compare =="
timeout 5400 python3 tools/clusters_stepwise.py "$OUT" "$SF" || echo "[stepwise-rc=$?]"

echo "== [3/3] graft sf30 wall-times (MicroBench entry, sentinel-bracketed) =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_SENTINEL_SEC=1.0 \
  java -Xmx96g -cp "$CP" graft.ops.MicroBench entry dedup_clusters dedup_pipeline dedup_ngram dedup_minhash dedup_substrings dedup_incremental dedup_simhash ann_lsh_auto dedup_embed_auto dedup_semantic_auto ann_ivf_auto decontam_overlap
echo "== sf30 resume done =="

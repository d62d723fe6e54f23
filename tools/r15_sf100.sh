#!/bin/bash
# Round-15 ask #4: the sf100 (1000×) octave for the top-5 heavy ops.
# Data: ScaleData ×1000 of sf0.1 → /tmp/graft_sf100 (lineitem 600M
# rows, documents 5M, embeddings 20M; 64 files/table, ~18 GB).
#
# Order: wall-times first (quiet machine, sentinel-bracketed), then
# graft dumps (fresh JVM per heavy entry — r12 GC discipline), then
# DuckDB oracles (no JVM alive: RAM-contention OOMs are a known
# failure mode). The two output-quadratic pair ops produce ~1e9-row
# results at this scale — their oracle is checksum_compare.py (the
# streaming sum-of-hashes multiset check; EXCEPT ALL would out-spill
# the disk), clusters uses the stepwise runner, the rest use
# checksum_compare too (validated against fast_compare at sf0.01/sf1).
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SF=/tmp/graft_sf100
OUT=/tmp/verify_sf100_r15

echo "== [1/4] graft sf100 wall-times (MicroBench entry, sentinel-bracketed) =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=28 \
  java -Xmx100g -cp "$CP" graft.ops.MicroBench entry \
  dedup_clusters dedup_pipeline ann_ivf_auto dedup_semantic_auto dedup_embed_auto 2>/dev/null

echo "== [2/4] graft dumps (fresh JVM per entry) =="
for e in dedup_pipeline dedup_clusters ann_ivf_auto dedup_semantic_auto dedup_embed_auto; do
  echo "-- dump $e"
  SPARK_GRAFT_CPUS=28 timeout 3600 java -Xmx100g -cp "$CP" graft.Verify "$SF" "$OUT" "$e" \
    2>&1 | tail -1
done
df -h / | tail -1

echo "== [3/4] DuckDB oracles: checksum_compare per entry (fresh process) =="
for e in dedup_pipeline ann_ivf_auto dedup_semantic_auto dedup_embed_auto; do
  # stderr to a log for post-mortems; no GNU time on this box (r15:
  # the /usr/bin/time -v wrapper rc=127'd), python reports its own rc
  timeout 10800 python3 tools/checksum_compare.py "$OUT" "$SF" "$e" 2>/tmp/cc_${e}_time.log \
    || echo "[compare-rc=$?] $e"
  rm -rf /tmp/duckdb_spill/* 2>/dev/null
done

echo "== [4/4] dedup_clusters stepwise compare =="
timeout 7200 python3 tools/clusters_stepwise.py "$OUT" "$SF" || echo "[clusters-rc=$?]"
echo "== sf100 octave done =="

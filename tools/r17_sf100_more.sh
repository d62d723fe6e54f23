#!/bin/bash
# Round-17 extra: sf100 oracle verdicts for eight more linear-shape
# families (join/pack/sample/kmeans/quantize/text) — widening the
# 1000x-verified set beyond the r16 ask list.
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SF=/tmp/graft_sf100
OUT=/tmp/verify_sf100_r16
ENTRIES="asof_join range_join pack_sequences sample_stratified kmeans_assign embed_quantize text_quality skew_join"
echo "== dumps =="
for e in $ENTRIES; do
  echo "-- dump $e ($(date +%T))"
  SPARK_GRAFT_CPUS=28 timeout 3600 java -Xmx100g -cp "$CP" graft.Verify "$SF" "$OUT" "$e" \
    2>&1 | tail -1
done
echo "== compares (no JVM alive) =="
FREE_GB=$(df --output=avail -BG / | tail -1 | tr -dc 0-9)
SPILL_GB=$((FREE_GB > 12 ? FREE_GB - 8 : 4))
echo "-- free ${FREE_GB}G, spill cap ${SPILL_GB}G"
for e in $ENTRIES; do
  if [ ! -f "$OUT/$e.parquet/_SUCCESS" ]; then
    echo "[skip] $e: dump incomplete (no _SUCCESS) - compare not run"; continue
  fi
  echo "-- checksum $e ($(date +%T))"
  DUCKDB_SPILL="${SPILL_GB}GB" timeout 14400 \
    python3 tools/checksum_compare.py "$OUT" "$SF" "$e" 2>/tmp/cc17b_${e}.log \
    || echo "[compare-rc=$?] $e"
  rm -rf /tmp/duckdb_spill/* 2>/dev/null
done
echo "ALL DONE $(date +%T)"

#!/bin/bash
# Round-17 asks #5/#6/#7:
#   A. fresh-JVM sf10 dumps for the four stale compares
#      (dedup_semantic_auto, pql_ann_brute, pql_dedup_embed,
#      pql_dedup_semantic_auto) + sf100 dumps for dedup_lines and
#      decontam_overlap (two new 1000x families).
#   B. streaming soak at sf10 (the sf3 record's next octave): the
#      three grammar streaming kinds + sessions_capped, 20 files =>
#      21 micro-batches (one extra finalizing trigger), state-rows-vs-watermark evidence.
#   C. oracle compares with NO JVM alive, fresh python per entry,
#      multi-hour budgets (these oracles are the 240s-timeout set).
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SF10=/tmp/graft_sf10
SF100=/tmp/graft_sf100
OUT10=/tmp/verify_sf10_r17
OUT100=/tmp/verify_sf100_r16
STALE="dedup_semantic_auto pql_ann_brute pql_dedup_embed pql_dedup_semantic_auto"

echo "== [A] dumps =="
for e in $STALE; do
  echo "-- dump sf10 $e ($(date +%T))"
  SPARK_GRAFT_CPUS=16 timeout 3600 java -Xmx48g -cp "$CP" graft.Verify "$SF10" "$OUT10" "$e" \
    2>&1 | tail -1
done
for e in dedup_lines decontam_overlap; do
  echo "-- dump sf100 $e ($(date +%T))"
  SPARK_GRAFT_CPUS=28 timeout 3600 java -Xmx100g -cp "$CP" graft.Verify "$SF100" "$OUT100" "$e" \
    2>&1 | tail -1
done

echo "== [B] sf10 soak ($(date +%T)) =="
SPARK_GRAFT_CPUS=24 timeout 5400 java -Xmx64g -cp "$CP" graft.streaming.Soak "$SF10" 20 \
  pql_stream_dedup,pql_stream_dedup_embed,pql_stream_dedup_exact,sessions_capped \
  2>/dev/null | grep -E '^\{'

echo "== [C] compares (no JVM alive; fresh python per entry) =="
FREE_GB=$(df --output=avail -BG / | tail -1 | tr -dc 0-9)
SPILL_GB=$((FREE_GB > 12 ? FREE_GB - 8 : 4))
echo "-- free ${FREE_GB}G, spill cap ${SPILL_GB}G"
for e in pql_dedup_embed dedup_semantic_auto pql_dedup_semantic_auto pql_ann_brute; do
  if [ ! -f "$OUT10/$e.parquet/_SUCCESS" ]; then
    echo "[skip] $e: sf10 dump incomplete (no _SUCCESS) - compare not run"; continue
  fi
  echo "-- fast_compare sf10 $e ($(date +%T))"
  DUCKDB_SPILL="${SPILL_GB}GB" timeout 14400 \
    python3 tools/fast_compare.py "$OUT10" "$SF10" "$e" 2>/tmp/fc17_${e}.log \
    || echo "[compare-rc=$?] $e"
  rm -rf /tmp/duckdb_spill/* 2>/dev/null
done
for e in dedup_lines decontam_overlap; do
  if [ ! -f "$OUT100/$e.parquet/_SUCCESS" ]; then
    echo "[skip] $e: sf100 dump incomplete (no _SUCCESS) - compare not run"; continue
  fi
  echo "-- checksum sf100 $e ($(date +%T))"
  DUCKDB_SPILL="${SPILL_GB}GB" timeout 14400 \
    python3 tools/checksum_compare.py "$OUT100" "$SF100" "$e" 2>/tmp/cc17_${e}.log \
    || echo "[compare-rc=$?] $e"
  rm -rf /tmp/duckdb_spill/* 2>/dev/null
done
echo "ALL DONE $(date +%T)"

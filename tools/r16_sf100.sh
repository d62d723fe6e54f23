#!/bin/bash
# Round-16 asks #2/#6: finish the sf100 (1000×) octave.
#   A. ISOLATED fresh-JVM wall-times for the five heavy ops (r15's
#      upper bounds came from one shared 28-thread JVM running all
#      five back-to-back — sentinel-degraded; one op per JVM is the
#      r14 re-measure discipline), plus the headline four and the two
#      new families (dedup_minhash, dedup_substrings) at 1000×.
#   B. Fresh-JVM dumps for the compare set (the r15 dumps were wiped
#      with /tmp between rounds).
#   C. Oracle compares with NO JVM alive: checksum_compare for the
#      ~1e9-row pair oracles (semantic/embed/ann_ivf_auto — the three
#      pending from r15), stepwise for minhash/substrings.
# Spill budget: DUCKDB_SPILL sized to the actual free disk (the r15
# single-pipeline form died at the 37.2 GiB spill cap; stepwise +
# checksum are the mitigations, but the cap must still be real).
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SF=/tmp/graft_sf100
OUT=/tmp/verify_sf100_r16
HEAVY="dedup_clusters dedup_pipeline ann_ivf_auto dedup_semantic_auto dedup_embed_auto"
NEWFAM="dedup_minhash dedup_substrings"

echo "== [A] isolated wall-times, one op per fresh JVM, sentinel-bracketed =="
for e in $HEAVY $NEWFAM; do
  echo "-- time $e ($(date +%T))"
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=28 \
    timeout 3600 java -Xmx100g -cp "$CP" graft.ops.MicroBench entry "$e" 2>/dev/null
done
echo "-- time headline group ($(date +%T))"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=28 \
  timeout 3600 java -Xmx100g -cp "$CP" graft.ops.MicroBench entry \
  q1_agg q3_shipping q5_local events_windowed 2>/dev/null

echo "== [B] dumps (fresh JVM per entry) =="
for e in dedup_semantic_auto dedup_embed_auto ann_ivf_auto $NEWFAM q1_agg; do
  echo "-- dump $e ($(date +%T))"
  SPARK_GRAFT_CPUS=28 timeout 3600 java -Xmx100g -cp "$CP" graft.Verify "$SF" "$OUT" "$e" \
    2>&1 | tail -1
done
df -h / | tail -1

echo "== [C] oracle compares (no JVM alive; fresh process per entry) =="
FREE_GB=$(df --output=avail -BG / | tail -1 | tr -dc 0-9)
SPILL_GB=$((FREE_GB > 12 ? FREE_GB - 8 : 4))
echo "-- free ${FREE_GB}G, DuckDB spill cap ${SPILL_GB}G"
for e in q1_agg dedup_semantic_auto dedup_embed_auto ann_ivf_auto; do
  echo "-- checksum $e ($(date +%T))"
  DUCKDB_SPILL="${SPILL_GB}GB" timeout 14400 \
    python3 tools/checksum_compare.py "$OUT" "$SF" "$e" 2>/tmp/cc16_${e}.log \
    || echo "[compare-rc=$?] $e"
  rm -rf /tmp/duckdb_spill/* 2>/dev/null
done
for e in $NEWFAM; do
  echo "-- stepwise $e ($(date +%T))"
  DUCKDB_SPILL="${SPILL_GB}GB" timeout 14400 \
    python3 tools/stepwise_compare.py "$OUT" "$SF" "$e" 2>/tmp/sw16_${e}.log \
    || echo "[compare-rc=$?] $e"
  rm -rf /tmp/duckdb_spill/* 2>/dev/null
done
echo "== r16 sf100 octave done ($(date +%T)) =="

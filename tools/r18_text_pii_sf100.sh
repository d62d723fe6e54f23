#!/bin/bash
# Round-18 ask #2: the text_pii sf100 verdict. The op is a shuffle-free
# codegen map (~10 regex passes/row) whose dump exceeded r17's 2400 s
# sweep budget; give it a dedicated slot with a 3 h ceiling.
# Per ADVICE r17: the dump's rc and _SUCCESS marker are checked before
# the compare runs — a partial dump must not feed the checker.
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SF=/tmp/graft_sf100
OUT=/tmp/verify_sf100_r18
mkdir -p "$OUT"
e=text_pii
rm -rf "$OUT/$e.parquet"
echo "-- dump $e ($(date +%T))"
SPARK_GRAFT_CPUS=28 timeout 10800 java -Xmx100g -cp "$CP" graft.Verify "$SF" "$OUT" "$e" \
  2>&1 | tail -2
rc=$?
if [ $rc -ne 0 ] || [ ! -f "$OUT/$e.parquet/_SUCCESS" ]; then
  echo "DUMP FAILED rc=$rc (no compare run)"; exit 1
fi
echo "-- dump ok, checksum $e ($(date +%T))"
FREE_GB=$(df --output=avail -BG / | tail -1 | tr -dc 0-9)
SPILL_GB=$((FREE_GB > 12 ? FREE_GB - 8 : 4))
DUCKDB_SPILL="${SPILL_GB}GB" timeout 10800 \
  python3 tools/checksum_compare.py "$OUT" "$SF" "$e" 2>/tmp/r18_${e}.log \
  || echo "[compare-rc=$?] $e"
SZ=$(du -sm "$OUT/$e.parquet" 2>/dev/null | cut -f1)
if [ "${SZ:-0}" -gt 500 ]; then rm -rf "$OUT/$e.parquet"; echo "-- cleaned $e dump (${SZ}M)"; fi
echo "ALL DONE $(date +%T)"

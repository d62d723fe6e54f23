#!/bin/bash
# Round-17 stretch: near-full gate sweep at sf100. Dump+compare per
# entry (fresh JVM, then standalone DuckDB), big dumps deleted after
# their verdict to protect disk. Excluded: quadratic-form oracles
# (ann_brute/lsh/ivf fixed sentries, the pair ops' full oracles - all
# hold sampled-exact or sf30 verdicts) and the full-width tabular
# pql_* dumps whose outputs are tens of GB at this SF.
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SF=/tmp/graft_sf100
OUT=/tmp/verify_sf100_wide
mkdir -p "$OUT"
ENTRIES="text_tokens text_langid text_fingerprint text_urls text_pii text_repetition \
text_vocab text_lm_score text_chunk text_subwords text_dup_lines text_dup_ngrams \
text_bpe text_classifier_score text_hash_features \
dedup_exact dedup_minhash_corpus decontam_drop decontam_overlap_8 decontam_overlap_13 \
dedup_incremental dedup_incremental_update dedup_incremental_step2 dedup_simhash dedup_ngram \
mixture_sample sample_token_budget sample_token_budget_hist sample_token_budget_auto \
sample_token_budget_auto_coarse embed_project text_distinct_kmv text_distinct_kmv_cut \
shard_manifest asof_join_tolerant sessions_gap mm_features"
FREE_GB=$(df --output=avail -BG / | tail -1 | tr -dc 0-9)
SPILL_GB=$((FREE_GB > 12 ? FREE_GB - 8 : 4))
echo "-- free ${FREE_GB}G, spill cap ${SPILL_GB}G"
for e in $ENTRIES; do
  echo "-- dump $e ($(date +%T))"
  SPARK_GRAFT_CPUS=28 timeout 2400 java -Xmx100g -cp "$CP" graft.Verify "$SF" "$OUT" "$e" \
    2>&1 | tail -1
  if [ ! -f "$OUT/$e.parquet/_SUCCESS" ]; then
    echo "[skip] $e: dump incomplete (no _SUCCESS) - compare not run"; continue
  fi
  echo "-- checksum $e ($(date +%T))"
  DUCKDB_SPILL="${SPILL_GB}GB" timeout 7200 \
    python3 tools/checksum_compare.py "$OUT" "$SF" "$e" 2>/tmp/cw17_${e}.log \
    || echo "[compare-rc=$?] $e"
  rm -rf /tmp/duckdb_spill/* 2>/dev/null
  SZ=$(du -sm "$OUT/$e.parquet" 2>/dev/null | cut -f1)
  if [ "${SZ:-0}" -gt 500 ]; then rm -rf "$OUT/$e.parquet"; echo "-- cleaned $e dump (${SZ}M)"; fi
done
echo "ALL DONE $(date +%T)"

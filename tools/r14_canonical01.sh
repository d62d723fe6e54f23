#!/bin/bash
# Round-14 ask #4 (sf0.1 half of the canonical refresh) + ask #5
# (dedup_simhash adjudication). Quiet machine required. Order:
#   1. graft.Bench (driver harness) at sf0.1 — Bench-to-Bench
#      comparable numbers for BENCH_r12/r13 rows (simhash adjudication).
#   2. MicroBench entry for the canonical op set (per-op BASELINE
#      convention; sentinel-bracketed).
#   3. DuckDB per entry, fresh process, CTAS timing.
# The JVM and DuckDB are never alive at the same time.
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SF=/root/testdata/sf0.1
ORACLES=/tmp/verify_new_sf01   # oracle_sql.json written by r14_sweep.sh phase 1
SET="q1_agg q3_shipping q5_local events_windowed \
dedup_clusters dedup_pipeline dedup_ngram dedup_minhash dedup_substrings \
dedup_incremental dedup_simhash dedup_exact \
ann_brute ann_lsh ann_lsh_auto ann_ivf ann_ivf_auto \
dedup_embed dedup_embed_auto dedup_semantic dedup_semantic_auto \
decontam_overlap text_classifier_score kmeans_assign text_bpe corpus_build \
sample_token_budget sample_token_budget_auto pql_sample_budget"

echo "== [1/3] graft.Bench at sf0.1 (driver harness; Bench-to-Bench) =="
SPARK_GRAFT_SF_DIR="$SF" java -Xmx96g -cp "$CP" graft.Bench 2>/tmp/bench_r14_local.err \
  | tee /tmp/bench_r14_local.json

echo "== [2/3] MicroBench entry, canonical set, sentinel-bracketed =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_SENTINEL_SEC=1.0 \
  java -Xmx96g -cp "$CP" graft.ops.MicroBench entry $SET

echo "== [3/3] DuckDB, fresh process per entry, CTAS =="
for e in $SET; do
  CTAS=1 python3 tools/bench_duckdb.py "$ORACLES" "$SF" "$e" || true
done
echo "== canonical sf0.1 done =="

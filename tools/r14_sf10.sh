#!/bin/bash
# Round-14 measurement debt, phase 1: sf10 Verify dumps for the
# adaptive family + budget entries (correctness at 100x), then graft
# timings (sentinel-bracketed MicroBench entry), then DuckDB timings
# on the same oracles (bench_duckdb.py) — same day, same machine,
# JVM and DuckDB never alive at the same time.
set -euo pipefail
cd /root/repo
SF=/tmp/graft_sf10
OUT=/tmp/verify_sf10_r14
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ENTRIES="ann_ivf ann_ivf_auto ann_lsh_auto dedup_semantic_auto dedup_embed_auto sample_token_budget sample_token_budget_auto pql_sample_budget"

echo "== [1/3] Verify dumps at sf10 =="
SPARK_GRAFT_CPUS=16 java -Xmx48g -cp "$CP" graft.Verify "$SF" "$OUT" $ENTRIES

echo "== [2/3] graft timings (MicroBench entry, warm, sentinel-bracketed) =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_SENTINEL_SEC=1.0 \
  java -Xmx96g -cp "$CP" graft.ops.MicroBench entry $ENTRIES

echo "== [3/3] DuckDB per-entry compare + timings (fresh process each) =="
for e in $ENTRIES; do
  python3 tools/fast_compare.py "$OUT" "$SF" "$e" || true
done
for e in $ENTRIES; do
  CTAS=1 python3 tools/bench_duckdb.py "$OUT" "$SF" "$e" || true
done

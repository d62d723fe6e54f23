#!/bin/bash
# Round-15 asks #1/#2/#10: one FULL-gate sweep at sf0.01 (both
# checkers), sf0.1, and — for the first time since the gate grew past
# r12's 129 entries — at sf1; plus the round-14/15 newest entries at
# the scales their adaptive geometry first diverges (ann trio at
# sf10), plus 4-vs-7-thread determinism double-dumps for the newest
# surface. Run serially on an otherwise-quiet machine.
#
# sf1 discipline (verify skill, round 12): full-gate Verify at big SFs
# runs in ~20-entry BATCHES with a fresh JVM each (a single long-lived
# JVM accumulates heap and the tail entries crawl under GC pressure),
# and at-scale compares run per-entry in fresh python processes.
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
# round-14 entries with no sf1+ record, plus the round-15 entry
NEW="pql_ann_brute pql_ann_lsh pql_ann_ivf pql_stream_dedup pql_sample_budget sample_token_budget_auto_coarse pql_stream_dedup_embed"

echo "== [1/7] Verify ALL entries at sf0.01 =="
SPARK_GRAFT_CPUS=8 java -Xmx16g -cp "$CP" graft.Verify /root/testdata/sf0.01 /tmp/verify_r15_full001 \
  2>&1 | tail -3

echo "== [2/7] checker A (driver-style) at sf0.01 =="
python3 tools/check_correctness.py /tmp/verify_r15_full001 /root/testdata/sf0.01 | tail -5

echo "== [3/7] checker B (DuckDB-native) at sf0.01 =="
python3 tools/fast_compare.py /tmp/verify_r15_full001 /root/testdata/sf0.01 | tail -5

echo "== [4/7] Verify ALL entries at sf0.1 + fast compare =="
SPARK_GRAFT_CPUS=8 java -Xmx16g -cp "$CP" graft.Verify /root/testdata/sf0.1 /tmp/verify_r15_full01 \
  2>&1 | tail -3
python3 tools/fast_compare.py /tmp/verify_r15_full01 /root/testdata/sf0.1 | tail -5

echo "== [5/7] FULL gate at sf1 (ask #2): batched Verify + per-entry compare =="
ALL=$(ls /tmp/verify_r15_full001/*.parquet -d | xargs -n1 basename | sed 's/\.parquet$//' | grep -v oracle)
echo "$ALL" | xargs -n 18 | while read -r batch; do
  echo "-- sf1 batch: $batch"
  SPARK_GRAFT_CPUS=16 java -Xmx48g -cp "$CP" graft.Verify /tmp/graft_sf1 /tmp/verify_r15_full1 \
    $batch 2>&1 | tail -1
done
for e in $ALL; do
  python3 tools/fast_compare.py /tmp/verify_r15_full1 /tmp/graft_sf1 "$e" | tail -1
done 2>&1 | tee /tmp/r15_sf1_compare.log | grep -cv PASS | xargs echo "sf1 non-PASS lines:"
grep -c PASS /tmp/r15_sf1_compare.log | xargs echo "sf1 PASS lines:"

echo "== [6/7] ann trio at sf10 (adaptive geometry diverges here) =="
SPARK_GRAFT_CPUS=16 java -Xmx48g -cp "$CP" graft.Verify /tmp/graft_sf10 /tmp/verify_r15_ann10 \
  pql_ann_brute pql_ann_lsh pql_ann_ivf ann_brute ann_lsh_auto ann_ivf_auto 2>&1 | tail -3
for e in pql_ann_brute pql_ann_lsh pql_ann_ivf ann_brute ann_lsh_auto ann_ivf_auto; do
  python3 tools/fast_compare.py /tmp/verify_r15_ann10 /tmp/graft_sf10 "$e" | tail -1
done

echo "== [7/7] 4-vs-7-thread determinism for the newest entries (sf0.01) =="
SPARK_GRAFT_CPUS=4 java -Xmx8g -cp "$CP" graft.Verify /root/testdata/sf0.01 /tmp/verify_r15_det4 $NEW
SPARK_GRAFT_CPUS=7 java -Xmx8g -cp "$CP" graft.Verify /root/testdata/sf0.01 /tmp/verify_r15_det7 $NEW
python3 tools/dump_equal.py /tmp/verify_r15_det4 /tmp/verify_r15_det7 $NEW
echo "== r15 sweep done =="

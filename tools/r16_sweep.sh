#!/bin/bash
# Round-16 asks #3/#5/#7/#10: the FULL 145-entry gate at sf10 (the
# sf10 full-gate record was r12's 129 entries), full sweeps at sf0.1,
# sf1 + determinism for the three new entries, and the soak surface
# kept congruent with the gate (pql_stream_dedup_exact twin + the sf3
# re-soak). Run serially on an otherwise-quiet machine.
#
# sf10 discipline (round 12): fresh JVM per ~18-entry batch
# (SPARK_GRAFT_CPUS=16, 48g — a single long-lived JVM crawls under GC
# at the tail), per-entry fresh-process DuckDB compares (one OOM
# poisons a shared connection), dedup_clusters via the stepwise
# runner (the unrolled CC oracle re-inlines and OOMs).
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
NEW="pql_sql_dedup_minhash pql_sql_ann_ivf pql_stream_dedup_exact"

echo "== [1/7] FULL gate Verify at sf10, batched ($(date +%T)) =="
ALL=$(ls /tmp/verify_r16_full001/*.parquet -d | xargs -n1 basename | sed 's/\.parquet$//' | grep -v oracle)
echo "$ALL" | xargs -n 18 | while read -r batch; do
  echo "-- sf10 batch ($(date +%T)): $batch"
  SPARK_GRAFT_CPUS=16 java -Xmx48g -cp "$CP" graft.Verify /tmp/graft_sf10 /tmp/verify_r16_full10 \
    $batch 2>&1 | tail -1
done

echo "== [2/7] sf10 compares, fresh process per entry ($(date +%T)) =="
for e in $ALL; do
  if [ "$e" = "dedup_clusters" ]; then continue; fi
  python3 tools/fast_compare.py /tmp/verify_r16_full10 /tmp/graft_sf10 "$e" | tail -1
done 2>&1 | tee /tmp/r16_sf10_compare.log | grep -cv "1 pass" | xargs echo "sf10 non-pass lines:"
grep -c "1 pass / 0 fail" /tmp/r16_sf10_compare.log | xargs echo "sf10 pass lines:"
echo "-- dedup_clusters via stepwise runner"
python3 tools/clusters_stepwise.py /tmp/verify_r16_full10 /tmp/graft_sf10 | tail -2

echo "== [3/7] FULL gate Verify + compare at sf0.1 ($(date +%T)) =="
SPARK_GRAFT_CPUS=8 java -Xmx16g -cp "$CP" graft.Verify /root/testdata/sf0.1 /tmp/verify_r16_full01 \
  2>&1 | tail -3
python3 tools/fast_compare.py /tmp/verify_r16_full01 /root/testdata/sf0.1 | tail -4

echo "== [4/7] new entries at sf1 ($(date +%T)) =="
SPARK_GRAFT_CPUS=16 java -Xmx48g -cp "$CP" graft.Verify /tmp/graft_sf1 /tmp/verify_r16_new1 $NEW 2>&1 | tail -1
for e in $NEW; do
  python3 tools/fast_compare.py /tmp/verify_r16_new1 /tmp/graft_sf1 "$e" | tail -1
done

echo "== [5/7] 4-vs-7-thread determinism for the new entries (sf0.01) ($(date +%T)) =="
SPARK_GRAFT_CPUS=4 java -Xmx8g -cp "$CP" graft.Verify /root/testdata/sf0.01 /tmp/verify_r16_det4 $NEW 2>&1 | tail -1
SPARK_GRAFT_CPUS=7 java -Xmx8g -cp "$CP" graft.Verify /root/testdata/sf0.01 /tmp/verify_r16_det7 $NEW 2>&1 | tail -1
python3 tools/dump_equal.py /tmp/verify_r16_det4 /tmp/verify_r16_det7 $NEW

echo "== [6/7] soak: grammar-exact twin beside the library form, sf1 ($(date +%T)) =="
SPARK_GRAFT_CPUS=16 java -Xmx48g -cp "$CP" graft.streaming.Soak /tmp/graft_sf1 16 \
  stream_dedup_exact,pql_stream_dedup_exact 2>/dev/null | grep soak

echo "== [7/7] sf3 re-soak, all eight workloads ($(date +%T)) =="
SPARK_GRAFT_CPUS=16 java -Xmx48g -cp "$CP" graft.streaming.Soak /tmp/graft_sf3 16 2>/dev/null | grep soak

echo "== r16 sweep done ($(date +%T)) =="

#!/bin/bash
# Round-14 ask #10: full gate re-run after the round's landings —
# every entry at sf0.01 (BOTH checkers: the driver-style pandas
# compare and the DuckDB-native fast compare) and at sf0.1
# (fast compare). Run serially on an otherwise-quiet machine.
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"

echo "== [1/5] Verify ALL entries at sf0.01 =="
SPARK_GRAFT_CPUS=8 java -Xmx16g -cp "$CP" graft.Verify /root/testdata/sf0.01 /tmp/verify_r14_full001 \
  2>&1 | tail -3

echo "== [2/5] checker A (driver-style) at sf0.01 =="
python3 tools/check_correctness.py /tmp/verify_r14_full001 /root/testdata/sf0.01 | tail -5

echo "== [3/5] checker B (DuckDB-native) at sf0.01 =="
python3 tools/fast_compare.py /tmp/verify_r14_full001 /root/testdata/sf0.01 | tail -5

echo "== [4/5] Verify ALL entries at sf0.1 =="
SPARK_GRAFT_CPUS=8 java -Xmx16g -cp "$CP" graft.Verify /root/testdata/sf0.1 /tmp/verify_r14_full01 \
  2>&1 | tail -3

echo "== [5/5] fast compare at sf0.1 =="
python3 tools/fast_compare.py /tmp/verify_r14_full01 /root/testdata/sf0.1 | tail -5
echo "== full gate done =="

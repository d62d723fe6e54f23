#!/bin/bash
# Round-18 ask #4: sf100 verdicts for the wide full-width tabular
# pql_* entries WITHOUT dump materialization — cross-engine row
# hashsum (graft.HashGate ≡ tools/r18_hashgate.py), O(1) memory,
# zero dump bytes. Entries: the four biggest sweep exclusions.
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SF=/tmp/graft_sf100
ENTRIES="pql_where pql_project pql_join_iu pql_join_left"
echo "-- spark side ($(date +%T))"
SPARK_GRAFT_CPUS=28 timeout 7200 java -Xmx100g -cp "$CP" graft.HashGate "$SF" $ENTRIES \
  2>/dev/null > /tmp/r18_hashgate_sf100.json
rc=$?
if [ $rc -ne 0 ]; then echo "SPARK SIDE FAILED rc=$rc"; exit 1; fi
cat /tmp/r18_hashgate_sf100.json
echo "-- duckdb side ($(date +%T))"
timeout 7200 python3 tools/r18_hashgate.py /tmp/verify_r18/oracle_sql.json "$SF" \
  /tmp/r18_hashgate_sf100.json
echo "ALL DONE $(date +%T)"

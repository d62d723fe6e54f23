#!/bin/bash
# Round-18 ask #7: streaming soak octave 5 (sf100) for the three
# grammar streaming kinds. The r14-r17 series (sf1->sf3->sf10->sf30)
# holds state growth <= input growth at every octave; sf100 either
# confirms sublinearity at 100x or finds the bend.
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
echo "-- soak sf100 ($(date +%T))"
SPARK_GRAFT_CPUS=24 timeout 10800 java -Xmx100g -cp "$CP" graft.streaming.Soak /tmp/graft_sf100 20 \
  pql_stream_dedup,pql_stream_dedup_embed,pql_stream_dedup_exact \
  2>/dev/null | grep -E '^\{'
echo "SOAK DONE rc=$? ($(date +%T))"

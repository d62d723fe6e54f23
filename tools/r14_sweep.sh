#!/bin/bash
# Round-14 ask #2: ladder sweep for the entries added in rounds 13-14
# (stream_dedup_embed, pql_asof_join, pql_range_join,
# sample_token_budget_auto, pql_sample_budget, pql_stream_dedup) at
# sf0.1 and sf1, plus the 4-vs-7-thread determinism double-dump at
# sf0.01, plus the positive sf10 histogram-branch proof
# (auto == hist dump, auto vs exact) for the budget crossover.
set -uo pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
NEW="stream_dedup_embed pql_asof_join pql_range_join sample_token_budget_auto pql_sample_budget pql_stream_dedup"

echo "== [1/4] new-entry dumps + compare at sf0.1 =="
SPARK_GRAFT_CPUS=8 java -Xmx16g -cp "$CP" graft.Verify /root/testdata/sf0.1 /tmp/verify_new_sf01 $NEW
python3 tools/fast_compare.py /tmp/verify_new_sf01 /root/testdata/sf0.1 $NEW

echo "== [2/4] new-entry dumps + compare at sf1 =="
SPARK_GRAFT_CPUS=16 java -Xmx24g -cp "$CP" graft.Verify /tmp/graft_sf1 /tmp/verify_new_sf1 $NEW
python3 tools/fast_compare.py /tmp/verify_new_sf1 /tmp/graft_sf1 $NEW

echo "== [3/4] 4-vs-7-thread determinism at sf0.01 =="
SPARK_GRAFT_CPUS=4 java -Xmx8g -cp "$CP" graft.Verify /root/testdata/sf0.01 /tmp/verify_det4 $NEW
SPARK_GRAFT_CPUS=7 java -Xmx8g -cp "$CP" graft.Verify /root/testdata/sf0.01 /tmp/verify_det7 $NEW
python3 tools/dump_equal.py /tmp/verify_det4 /tmp/verify_det7 $NEW

echo "== [4/4] sf10 budget-branch positive proof =="
# verify ALL THREE budget entries here so the phase is standalone —
# the auto/exact dumps are not inherited from r14_sf10.sh (advice,
# round 14: comparing dumps this script never produced)
SPARK_GRAFT_CPUS=16 java -Xmx24g -cp "$CP" graft.Verify /tmp/graft_sf10 /tmp/verify_sf10_r14 \
  sample_token_budget_hist sample_token_budget_auto sample_token_budget
echo "-- auto vs hist at sf10 (must be identical: histogram branch taken) --"
python3 - <<'EOF'
import duckdb
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
base = "/tmp/verify_sf10_r14"
def load(name):
    return f"(SELECT doc_id, source, n_tok FROM parquet_scan('{base}/{name}.parquet/*.parquet'))"
for a, b in [("sample_token_budget_auto", "sample_token_budget_hist"),
             ("sample_token_budget_auto", "sample_token_budget")]:
    d1 = con.execute(f"SELECT count(*) FROM ({load(a)} EXCEPT ALL {load(b)})").fetchone()[0]
    d2 = con.execute(f"SELECT count(*) FROM ({load(b)} EXCEPT ALL {load(a)})").fetchone()[0]
    na = con.execute(f"SELECT count(*) FROM {load(a)}").fetchone()[0]
    nb = con.execute(f"SELECT count(*) FROM {load(b)}").fetchone()[0]
    print(f"{a} vs {b}: rows {na}/{nb}, sym-diff {d1}+{d2}")
EOF
echo "== sweep done =="

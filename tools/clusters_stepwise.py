#!/usr/bin/env python3
"""Stepwise-materialized oracle check for `dedup_clusters` at scale.

DuckDB OOMs on the unrolled 6-round connected-components oracle as
written (each round's CTE is referenced twice; the optimizer re-inlines
the whole upstream signature pipeline exponentially in the round
count — measured >100 GiB at sf3). This runner evaluates the SAME SQL
text round by round into temp tables (one h_i/l_i pair per hop/jump),
which is linear, then does the usual schema/rowcount/EXCEPT-ALL
compare against the Spark dump.

Usage: python3 tools/clusters_stepwise.py <verify_out> <sf_dir>
"""
import json
import os
import sys
import time
from pathlib import Path

import duckdb

ROUNDS = 6  # matches NearDup.clusterIds' fixed hop/jump round count


def main():
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out")
    sf_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")

    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    oracles = {k[:-8] if k.endswith(".parquet") else k: v for k, v in oracles.items()}
    sql = oracles["dedup_clusters"]

    # lift the candidate-pair subquery out of the oracle text verbatim
    start = sql.find("WITH pr AS MATERIALIZED (") + len("WITH pr AS MATERIALIZED (")
    end = sql.find("),\ne AS MATERIALIZED")
    assert start > 24 and end > start, "dedup_clusters oracle shape changed"
    pairs_sql = sql[start:end]

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"SET temp_directory='{os.environ.get('DUCKDB_SPILL_DIR', '/tmp/duckdb_spill')}'")
    p = sf_dir / "documents.parquet"
    src = f"{p}/*.parquet" if p.is_dir() else str(p)
    con.execute(f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{src}')")

    t0 = time.time()
    con.execute(f"CREATE TEMP TABLE pr AS {pairs_sql}")
    print(f"pairs: {con.execute('SELECT count(*) FROM pr').fetchone()[0]} "
          f"({time.time()-t0:.0f}s)")
    con.execute("CREATE TEMP TABLE e AS SELECT id_a AS u, id_b AS v FROM pr "
                "UNION ALL SELECT id_b, id_a FROM pr")
    con.execute("CREATE TEMP TABLE l0 AS SELECT doc_id AS u, doc_id AS root FROM documents")
    for i in range(1, ROUNDS + 1):
        con.execute(f"""CREATE TEMP TABLE h{i} AS
          SELECT l.u, least(l.root, coalesce(m.minn, l.root)) AS root
          FROM l{i-1} l LEFT JOIN (
            SELECT e.u, min(p.root) AS minn FROM e JOIN l{i-1} p ON e.v = p.u GROUP BY e.u
          ) m ON l.u = m.u""")
        con.execute(f"""CREATE TEMP TABLE l{i} AS
          SELECT h.u, least(h.root, coalesce(j.root, h.root)) AS root
          FROM h{i} h LEFT JOIN h{i} j ON h.root = j.u""")
    con.execute(f"CREATE TEMP TABLE __oracle AS "
                f"SELECT u AS doc_id, CAST(root AS BIGINT) AS cluster_id FROM l{ROUNDS}")
    print(f"oracle rows: {con.execute('SELECT count(*) FROM __oracle').fetchone()[0]} "
          f"({time.time()-t0:.0f}s total)")

    dump = out_dir / "dedup_clusters.parquet"
    con.execute(f"CREATE VIEW __dump AS SELECT * FROM parquet_scan('{dump}/*.parquet')")
    diff = con.execute("""SELECT count(*) FROM (
      (SELECT * FROM __dump EXCEPT ALL SELECT * FROM __oracle)
      UNION ALL (SELECT * FROM __oracle EXCEPT ALL SELECT * FROM __dump))""").fetchone()[0]
    nd = con.execute("SELECT count(*) FROM __dump").fetchone()[0]
    ok = diff == 0 and nd > 0
    print(f"dump rows: {nd} diff: {diff} {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""DuckDB side of the bench comparison, at an arbitrary scale dir.

Times the oracle SQL (from a Verify dump's oracle_sql.json) the same
way graft.Bench times the Spark side: two warm-up executions, then the
MEDIAN of three measured runs, results fully materialized (fetchall).

Usage:
  python3 tools/bench_duckdb.py <verify_out_dir> <sf_dir> [key ...]

With no keys, times the four headline queries. Prints one JSON line
compatible with BENCH_r{N}.json's "queries" field.
"""
import json
import statistics
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
HEADLINE = ["q1_agg", "q3_shipping", "q5_local", "events_windowed"]


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = Path(sys.argv[2])
    keys = sys.argv[3:] or HEADLINE

    oracle = {
        k.removesuffix(".parquet"): v
        for k, v in json.loads((out_dir / "oracle_sql.json").read_text()).items()
    }

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            pat = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

    results = {}
    for k in keys:
        sql = oracle[k]
        for _ in range(2):
            con.execute(sql).fetchall()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        results[k] = round(statistics.median(runs), 4)

    total = round(sum(results.values()), 4)
    print(json.dumps({"engine": "duckdb", "sf": str(sf_dir),
                      "queries": results, "total": total}))


if __name__ == "__main__":
    main()

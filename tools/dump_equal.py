#!/usr/bin/env python3
"""Dump-vs-dump row-wise equality inside DuckDB: column sets, row
counts, and symmetric EXCEPT ALL must all agree (multiset equality —
order/partitioning independent, NaN equal under DISTINCT semantics).
Used for the N-vs-M-thread determinism sweeps.

Usage: python3 tools/dump_equal.py <dirA> <dirB> <entry> [entry...]
"""
import sys
from pathlib import Path

import duckdb


def main():
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    entries = sys.argv[3:]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    fails = 0
    for e in entries:
        pa, pb = a / f"{e}.parquet", b / f"{e}.parquet"
        if not pa.exists() or not pb.exists():
            print(f"[MISSING] {e}: {pa.exists()} {pb.exists()}")
            fails += 1
            continue
        ca = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM parquet_scan('{pa}/*.parquet')").fetchall()]
        cb = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM parquet_scan('{pb}/*.parquet')").fetchall()]
        if sorted(ca) != sorted(cb):
            print(f"[FAIL] {e}: column sets differ {ca} vs {cb}")
            fails += 1
            continue
        cols = ", ".join(f'"{c}"' for c in sorted(ca))
        na = con.execute(f"SELECT count(*) FROM parquet_scan('{pa}/*.parquet')").fetchone()[0]
        nb = con.execute(f"SELECT count(*) FROM parquet_scan('{pb}/*.parquet')").fetchone()[0]
        d1 = con.execute(
            f"SELECT count(*) FROM (SELECT {cols} FROM parquet_scan('{pa}/*.parquet') "
            f"EXCEPT ALL SELECT {cols} FROM parquet_scan('{pb}/*.parquet'))").fetchone()[0]
        d2 = con.execute(
            f"SELECT count(*) FROM (SELECT {cols} FROM parquet_scan('{pb}/*.parquet') "
            f"EXCEPT ALL SELECT {cols} FROM parquet_scan('{pa}/*.parquet'))").fetchone()[0]
        ok = na == nb and d1 == 0 and d2 == 0
        if not ok:
            fails += 1
        print(f"[{'ok' if ok else 'FAIL'}] {e}: rows {na}/{nb}, diff {d1}+{d2}")
    print(f"{len(entries) - fails} identical / {fails} differing")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

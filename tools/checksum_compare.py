#!/usr/bin/env python3
"""Streaming multiset compare for result sets too large to EXCEPT —
the sf100 member of the oracle toolbox.

fast_compare.py materializes the oracle into a temp table and runs a
symmetric EXCEPT ALL: exact, but both sides must fit a hash table (or
spill — the sf30 embed oracle spilled ~39 GB for 95M rows; the sf100
pair sets reach ~1e9 rows and would out-spill the disk). This tool
instead verifies in O(1) memory per side:

  - column-name sets must match,
  - row counts must match,
  - the SUM of per-row 64-bit hashes (DuckDB hash() over every
    column, cast to the dump's column types family-wise, summed as
    HUGEINT) must match.

Sum-of-hashes is multiset-exact up to hash collisions summing to the
same total — not adversarially safe, overwhelming for accidental
engine divergence (any single differing row flips the total unless a
second differing row cancels it to 64-bit precision). Both sides are
hashed by the SAME DuckDB session, so the hash function is identical.
Validated against fast_compare.py at sf0.01/sf1 (both verdicts agree
on every entry) before being trusted at sf100.

Usage: python3 tools/checksum_compare.py <verify_out> <sf_dir> [keys...]
"""
import json
import os
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out")
    sf_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")
    only = set(sys.argv[3:])

    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    oracles = {k[:-8] if k.endswith(".parquet") else k: v for k, v in oracles.items()}

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute(f"SET max_temp_directory_size='{os.environ.get('DUCKDB_SPILL', '40GB')}'")
    # an explicit cap forces operators to elect out-of-core execution
    # instead of outgrowing the machine (the sf30 lesson — the kernel
    # OOM-kills the process at the default 80%-of-RAM limit)
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '64GB')}'")
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.is_dir():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

    npass = nfail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        dump = out_dir / f"{name}.parquet"
        if not dump.exists():
            print(f"[!!] {name}: no dump")
            nfail += 1
            continue
        sql = oracles[name]
        try:
            con.execute(
                f"CREATE OR REPLACE VIEW __dump AS SELECT * FROM parquet_scan('{dump}/*.parquet')")
            dcols = con.execute("DESCRIBE __dump").fetchall()
            ocols = con.execute(f"DESCRIBE {sql}").fetchall()
            dnames = sorted(c[0] for c in dcols)
            onames = sorted(c[0] for c in ocols)
            if dnames != onames:
                print(f"[!!] {name}: SCHEMA dump={dnames} oracle={onames}")
                nfail += 1
                continue
            dtypes = {c[0]: c[1] for c in dcols}

            def norm(colname):
                q = f'"{colname}"'
                t = dtypes[colname].upper()
                if "TIMESTAMP" in t:
                    return f"CAST({q} AS TIMESTAMP)"
                return f"CAST({q} AS {dtypes[colname]})"

            hashed = "hash(" + ", ".join(norm(c) for c in dnames) + ")"
            agg = f"count(*), sum(CAST({hashed} AS HUGEINT))"
            nd, hd = con.execute(f"SELECT {agg} FROM __dump").fetchone()
            no, ho = con.execute(f"SELECT {agg} FROM ({sql})").fetchone()
            if nd != no:
                print(f"[!!] {name}: ROWS dump={nd} oracle={no}")
                nfail += 1
            elif hd != ho:
                print(f"[!!] {name}: HASHSUM differs over {nd} rows")
                nfail += 1
            else:
                print(f"[ok] {name}: PASS ({nd} rows, hashsum match)")
                npass += 1
        except Exception as e:
            print(f"[!!] {name}: ERROR {type(e).__name__}: {e}")
            nfail += 1

    print(f"\n{npass} pass / {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()

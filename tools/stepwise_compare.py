#!/usr/bin/env python3
"""Stepwise-materialized oracle compare for entries whose single-pipeline
evaluation OOMs DuckDB at big SFs.

fast_compare.py materializes each oracle ONCE (CREATE TEMP TABLE AS),
which fixed the re-inlined-CTE blowups — but some oracles still OOM at
sf30 because ONE pipeline holds several hash joins + a window + list
explosions live at the same time (dedup_substrings: token explode ×
row_number over shingle hash × anti-join, measured OOM at 30× in
128 GB). This runner evaluates the SAME oracle text stage by stage:
each top-level CTE becomes its own TEMP TABLE (so every stage can
spill to temp_directory independently and its upstream is a finished
table, not a live pipeline), then the final SELECT runs over those
tables, then the usual schema / rowcount / symmetric EXCEPT ALL
compare runs against the Spark dump — identical semantics to
fast_compare.py, including the family-wise casts.

Usage: python3 tools/stepwise_compare.py <verify_out> <sf_dir> <entry>
"""
import json
import os
import re
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def split_ctes(sql):
    """Parse `WITH a AS (...), b AS (...) <final>` into ([(name, body)], final).

    Tracks paren depth and single-quoted strings; handles the optional
    MATERIALIZED keyword. Only top-level CTEs are split — nested WITHs
    stay inside their stage body.
    """
    s = sql.strip()
    m = re.match(r"WITH\s+", s, re.IGNORECASE)
    assert m, "oracle does not start with WITH"
    i = m.end()
    ctes = []
    while True:
        m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(?:MATERIALIZED\s+)?\(",
                     s[i:], re.IGNORECASE)
        assert m, f"expected CTE definition at: {s[i:i+60]!r}"
        name = m.group(1)
        j = i + m.end()  # position just after the opening paren
        depth, k, in_str = 1, j, False
        while depth:
            c = s[k]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        ctes.append((name, s[j:k - 1]))
        m2 = re.match(r"\s*,", s[k:])
        if m2:
            i = k + m2.end()
        else:
            return ctes, s[k:].strip()


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = Path(sys.argv[2])
    entry = sys.argv[3]

    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    oracles = {k[:-8] if k.endswith(".parquet") else k: v for k, v in oracles.items()}
    ctes, final = split_ctes(oracles[entry])

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"SET temp_directory='{os.environ.get('DUCKDB_SPILL_DIR', '/tmp/duckdb_spill')}'")
    con.execute(f"SET max_temp_directory_size='{os.environ.get('DUCKDB_SPILL', '120GB')}'")
    if os.environ.get('DUCKDB_MEM'):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.is_dir():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

    t0 = time.time()
    for name, body in ctes:
        con.execute(f"CREATE TEMP TABLE {name} AS {body}")
        n = con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
        print(f"  stage {name}: {n} rows ({time.time()-t0:.0f}s)", flush=True)
    con.execute(f"CREATE TEMP TABLE __oracle AS {final}")
    print(f"oracle: {con.execute('SELECT count(*) FROM __oracle').fetchone()[0]} rows "
          f"({time.time()-t0:.0f}s total)", flush=True)

    dump = out_dir / f"{entry}.parquet"
    con.execute(f"CREATE VIEW __dump AS SELECT * FROM parquet_scan('{dump}/*.parquet')")
    dcols = con.execute("DESCRIBE __dump").fetchall()
    ocols = con.execute("DESCRIBE __oracle").fetchall()
    dnames = sorted(c[0] for c in dcols)
    onames = sorted(c[0] for c in ocols)
    if dnames != onames:
        print(f"[!!] {entry}: SCHEMA dump={dnames} oracle={onames}")
        sys.exit(1)
    dtypes = {c[0]: c[1] for c in dcols}

    def norm(colname, coltype):
        q = f'"{colname}"'
        if "TIMESTAMP" in coltype.upper():
            return f"CAST({q} AS TIMESTAMP) AS {q}"
        return f"CAST({q} AS {coltype}) AS {q}"

    sel = ", ".join(norm(c, dtypes[c]) for c in dnames)
    nd = con.execute("SELECT count(*) FROM __dump").fetchone()[0]
    no = con.execute("SELECT count(*) FROM __oracle").fetchone()[0]
    if nd != no:
        print(f"[!!] {entry}: ROWS dump={nd} oracle={no}")
        sys.exit(1)
    diff = con.execute(
        f"SELECT count(*) FROM ("
        f"(SELECT {sel} FROM __dump EXCEPT ALL SELECT {sel} FROM __oracle)"
        f" UNION ALL "
        f"(SELECT {sel} FROM __oracle EXCEPT ALL SELECT {sel} FROM __dump))"
    ).fetchone()[0]
    ok = diff == 0 and nd > 0
    print(f"[{'ok' if ok else '!!'}] {entry}: dump={nd} diff={diff} "
          f"{'PASS' if ok else 'FAIL'} ({time.time()-t0:.0f}s)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

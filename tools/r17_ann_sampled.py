#!/usr/bin/env python3
"""Round-17 ask #2: output-targeted sf100 verification of ann_ivf_auto.

The full DuckDB oracle needs an n x nCells argmax cross join (2M x 1414
at sf100) that exhausted the verification engine's spill budget in
round 16. This script verifies the dumped OUTPUT instead, for a
deterministic sample of queries, which is exact for every sampled row:

  1. recompute the hash-seeded centroid set and the query's nProbe=2
     probe cells with the oracle's own fixed-order arithmetic;
  2. recompute each reported neighbor's cosine -> must equal the dumped
     cos_sim BIT-FOR-BIT, and ranks must sort by (cos DESC, vec_id ASC);
  3. assign each reported neighbor's own cell -> must lie in the
     query's probed set;
  4. COMPLETENESS: scan the full corpus with DuckDB's native
     list_dot_product (float, margin 1e-3), keep every vector with
     cos >= reported-5th - margin, re-score those candidates with the
     exact fixed-order arithmetic, cell-assign the strictly-better ones
     (cos > c5, or cos == c5 and vec_id < v5), and require every
     strictly-better candidate whose cell is probed to BE a reported
     row. With (2)+(3) this proves the reported rows are exactly the
     in-probe top-5 for each sampled query.
  5. recall vs the exact global top-5 (informational, not a gate --
     IVF is approximate by design).

Usage: r17_ann_sampled.py <verify_out> <sf_dir> [n_queries]
"""
import json
import sys

import duckdb

DIM = 64
NPROBE = 2
K = 5
MARGIN = 1e-3

FIXDOT_AB = ("list_reduce(list_transform(generate_series(1, %d), i -> a.v[i] * b.v[i]),"
             " (x, y) -> x + y)" % DIM)


def main() -> int:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    spill = __import__("os").environ.get("DUCKDB_SPILL")
    if spill:
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
        con.execute(f"SET max_temp_directory_size='{spill}'")

    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet/*.parquet'")
    con.execute(f"CREATE VIEW outp AS SELECT * FROM '{out_dir}/ann_ivf_auto.parquet/*.parquet'")

    n = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    cells = max(4, min(65536, round(n ** 0.5)))
    print(f"corpus n={n}  cells={cells}  sampling {n_q} queries")

    # exact double vectors + fixed-order norms (the oracle's sqlEmbedBase)
    con.execute("""CREATE TABLE nd AS
      SELECT vec_id, v, sqrt(list_reduce(list_transform(generate_series(1, 64),
          i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings)""")

    # hash-seeded centroids, exactly the oracle's rule
    con.execute(f"""CREATE TABLE ct AS
      SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS c, v AS cv
      FROM (SELECT vec_id, v,
              ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS h
            FROM nd ORDER BY h, vec_id LIMIT {cells})""")

    # deterministic query sample from the OUTPUT
    con.execute(f"""CREATE TABLE qs AS
      SELECT query_id FROM (SELECT DISTINCT query_id FROM outp)
      ORDER BY md5(CAST(query_id AS VARCHAR)) LIMIT {n_q}""")
    con.execute("""CREATE TABLE qv AS
      SELECT q.query_id, nd.v AS qv, nd.nrm AS qn
      FROM qs q JOIN nd ON nd.vec_id = q.query_id""")

    # [1] probe cells for the sampled queries (fixed-order seed dots)
    con.execute(f"""CREATE TABLE probes AS
      SELECT query_id, c FROM (
        SELECT q.query_id, ct.c,
          row_number() OVER (PARTITION BY q.query_id ORDER BY
            list_reduce(list_transform(generate_series(1, {DIM}),
              i -> q.qv[i] * ct.cv[i]), (x, y) -> x + y) DESC, ct.c) AS r
        FROM qv q CROSS JOIN ct)
      WHERE r <= {NPROBE}""")
    n_probe_rows = con.execute("SELECT count(*) FROM probes").fetchone()[0]
    print(f"[1] probe cells recomputed: {n_probe_rows} rows "
          f"({n_probe_rows / n_q:.1f} per query, expect {NPROBE})")

    # sampled reported rows
    con.execute("""CREATE TABLE rep AS
      SELECT o.query_id, o.vec_id, o.cos_sim, o.rank
      FROM outp o JOIN qs USING (query_id)""")
    per_q = con.execute(
        "SELECT min(cnt), max(cnt) FROM (SELECT count(*) AS cnt FROM rep GROUP BY query_id)"
    ).fetchone()
    print(f"[sample] reported rows per query: min={per_q[0]} max={per_q[1]}")

    # [2] bit-exact cosine recompute + rank-order law
    bad_cos = con.execute(f"""SELECT count(*) FROM rep r
      JOIN nd a ON a.vec_id = r.vec_id
      JOIN (SELECT query_id, qv AS v, qn FROM qv) b ON b.query_id = r.query_id
      WHERE {FIXDOT_AB} / (a.nrm * b.qn) <> r.cos_sim""").fetchone()[0]
    bad_rank = con.execute("""SELECT count(*) FROM (
      SELECT query_id, rank,
        row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rr
      FROM rep) WHERE rank <> rr""").fetchone()[0]
    print(f"[2] cosine bit-mismatches: {bad_cos}  rank-order violations: {bad_rank}")

    # [3] each reported neighbor's own cell must be probed
    con.execute(f"""CREATE TABLE rep_cell AS
      SELECT r.query_id, r.vec_id, r.cos_sim, r.rank, cc.c AS cell
      FROM rep r JOIN (
        SELECT vec_id, c FROM (
          SELECT a.vec_id, ct.c,
            row_number() OVER (PARTITION BY a.vec_id ORDER BY
              list_reduce(list_transform(generate_series(1, {DIM}),
                i -> a.v[i] * ct.cv[i]), (x, y) -> x + y) DESC, ct.c) AS r
          FROM (SELECT DISTINCT nd.vec_id, nd.v FROM rep JOIN nd USING (vec_id)) a
          CROSS JOIN ct) WHERE r = 1) cc
      ON cc.vec_id = r.vec_id""")
    bad_cell = con.execute("""SELECT count(*) FROM rep_cell r
      WHERE NOT EXISTS (SELECT 1 FROM probes p
                        WHERE p.query_id = r.query_id AND p.c = r.cell)""").fetchone()[0]
    print(f"[3] reported neighbors outside the probed cells: {bad_cell}")

    # [4] completeness: native-margin scan, then exact re-score
    con.execute("""CREATE TABLE thr AS
      SELECT query_id, arg_max(cos_sim, rank) AS c5, arg_max(vec_id, rank) AS v5
      FROM rep GROUP BY query_id""")
    con.execute("""CREATE TABLE ebn AS
      SELECT vec_id, embedding,
             sqrt(list_dot_product(embedding, embedding)) AS fn
      FROM embeddings""")
    con.execute("""CREATE TABLE qf AS
      SELECT t.query_id, e.embedding AS qe, e.fn AS qfn, t.c5, t.v5
      FROM thr t JOIN ebn e ON e.vec_id = t.query_id""")
    con.execute(f"""CREATE TABLE cand AS
      SELECT q.query_id, b.vec_id
      FROM qf q, ebn b
      WHERE b.vec_id <> q.query_id
        AND list_dot_product(b.embedding, q.qe) >= (q.c5 - {MARGIN}) * b.fn * q.qfn""")
    n_cand = con.execute("SELECT count(*) FROM cand").fetchone()[0]
    print(f"[4] margin-scan candidates: {n_cand} ({n_cand / n_q:.1f} per query)")

    # exact re-score of candidates; keep the strictly-better ones
    con.execute(f"""CREATE TABLE better AS
      SELECT c.query_id, c.vec_id, {FIXDOT_AB} / (a.nrm * b.qn) AS cos_exact
      FROM cand c
      JOIN nd a ON a.vec_id = c.vec_id
      JOIN (SELECT query_id, qv AS v, qn FROM qv) b ON b.query_id = c.query_id
      JOIN thr t ON t.query_id = c.query_id
      WHERE {FIXDOT_AB} / (a.nrm * b.qn) > t.c5
         OR ({FIXDOT_AB} / (a.nrm * b.qn) = t.c5 AND c.vec_id < t.v5)""")
    n_better = con.execute("SELECT count(*) FROM better").fetchone()[0]
    print(f"[4] exactly-better-than-reported-5th candidates: {n_better}")
    if n_better > 200000:
        print("FAIL guard: better-set too large to cell-assign; rerun with fewer queries")
        return 2
    missed = con.execute(f"""SELECT count(*) FROM (
      SELECT bt.query_id, bt.vec_id FROM better bt
      JOIN (SELECT vec_id, c FROM (
              SELECT a.vec_id, ct.c,
                row_number() OVER (PARTITION BY a.vec_id ORDER BY
                  list_reduce(list_transform(generate_series(1, {DIM}),
                    i -> a.v[i] * ct.cv[i]), (x, y) -> x + y) DESC, ct.c) AS r
              FROM (SELECT DISTINCT nd.vec_id, nd.v FROM better JOIN nd USING (vec_id)) a
              CROSS JOIN ct) WHERE r = 1) cc ON cc.vec_id = bt.vec_id
      WHERE EXISTS (SELECT 1 FROM probes p
                    WHERE p.query_id = bt.query_id AND p.c = cc.c)
        AND NOT EXISTS (SELECT 1 FROM rep r
                        WHERE r.query_id = bt.query_id AND r.vec_id = bt.vec_id))""").fetchone()[0]
    print(f"[4] in-probe better candidates MISSING from the output: {missed}")

    # [5] recall vs exact global top-5 (informational)
    recall = con.execute(f"""WITH exact5 AS (
        SELECT query_id, vec_id FROM (
          SELECT c.query_id, c.vec_id, {FIXDOT_AB} / (a.nrm * b.qn) AS ce
          FROM cand c
          JOIN nd a ON a.vec_id = c.vec_id
          JOIN (SELECT query_id, qv AS v, qn FROM qv) b ON b.query_id = c.query_id
          QUALIFY row_number() OVER (PARTITION BY c.query_id ORDER BY ce DESC, c.vec_id) <= {K}))
      SELECT avg(hit) FROM (
        SELECT CASE WHEN EXISTS (SELECT 1 FROM rep r
                                 WHERE r.query_id = e.query_id AND r.vec_id = e.vec_id)
               THEN 1.0 ELSE 0.0 END AS hit FROM exact5 e)""").fetchone()[0]
    print(f"[5] recall@5 vs exact global top-5 (sampled queries): {recall:.4f}")

    ok = bad_cos == 0 and bad_rank == 0 and bad_cell == 0 and missed == 0 \
        and per_q[0] == K and n_probe_rows == n_q * NPROBE
    print(json.dumps({
        "entry": "ann_ivf_auto", "n": n, "cells": cells, "sampled_queries": n_q,
        "cos_bit_mismatches": bad_cos, "rank_violations": bad_rank,
        "neighbors_outside_probes": bad_cell, "in_probe_better_missing": missed,
        "recall_at_5": recall, "verdict": "PASS" if ok else "FAIL"}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

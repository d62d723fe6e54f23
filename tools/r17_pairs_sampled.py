#!/usr/bin/env python3
"""Round-17 ask #2: sampled-exact sf100 verification of the two pair ops
whose full DuckDB oracles are quadratic forms the verification engine
cannot finish at 1000x (dedup_embed_auto ~1.05e9 output rows,
dedup_semantic_auto ~1.0e9).

Two checks per entry, both exact for every row they touch:

  SAMPLE  — a deterministic hash-sample (~1,000 pairs) of the OUTPUT:
            recompute the cosine with the oracle's fixed-order
            arithmetic (must match the dumped cos_sim BIT-FOR-BIT and
            clear the 0.4 threshold), and verify the candidate
            predicate — band collision (embed) / same recomputed
            Voronoi cell (semantic) — for each pair.
  SLICE   — COMPLETENESS on a corpus slice (vec_id % slice_mod == 0,
            1% by default => ~0.01% of all pairs): recompute the
            entire operator restricted to the slice (signatures /
            cell assignment + exact cosine filter) and require the
            result to equal output ∩ slice as a SET, cosines
            bit-exact. A pair the engine wrongly emitted or silently
            dropped inside the slice fails this check.

Cell assignment for the 31,250-seed semantic form runs as a numpy
float64 matmul argmax (the only tractable route); a near-tie guard
counts slice vectors whose top-2 DISTINCT-seed margin is < 1e-9 — any
flagged vector is re-scored with the exact fixed-order SQL before the
verdict (ties between IDENTICAL replicated seeds are exact in any
summation order and resolve to the lower cell index in both engines).

Usage: r17_pairs_sampled.py <verify_out> <sf_dir> <entry> [slice_mod]
"""
import json
import os
import sys

import duckdb
import numpy as np

DIM = 64
MIN_COS = 0.4

PLANE = "(((1103515245 * ({idx}) + 12345) % 2147483648) / 2147483648.0) - 0.5"
FIXDOT = ("list_reduce(list_transform(generate_series(1, %d), i -> a.v[i] * b.v[i]),"
          " (x, y) -> x + y)" % DIM)


def connect():
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    spill = os.environ.get("DUCKDB_SPILL")
    if spill:
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
        con.execute(f"SET max_temp_directory_size='{spill}'")
    return con


def sig_expr(planes):
    """Exact fixed-order sign-LSH signature over double list v.

    NaN-free-input assumption (r17 advice): DuckDB orders NaN above all
    numbers (NaN >= 0 is TRUE, bit set) where PackedSignSig's Java
    `NaN >= 0` is FALSE (bit clear). The synthetic corpora contain no
    NaNs; the isnan() guard below makes the verifier match the engine
    on NaN-bearing vectors anyway.
    """
    terms = []
    for p in range(planes):
        d = ("list_reduce(list_transform(generate_series(0, %d), j -> v[j+1] * (%s)),"
             " (x, y) -> x + y)" % (DIM - 1, PLANE.format(idx=f"{p} * {DIM} + j")))
        terms.append(f"CASE WHEN isnan({d}) THEN 0 WHEN {d} >= 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END")
    return " + ".join(terms)


def embed_params(n, occupancy=64):
    buckets = max(1, (n + occupancy - 1) // occupancy - 1)
    bits = next(b for b in range(1, 32) if buckets < (1 << b))
    nb = max(2, min(4, 62 // bits))
    return bits, nb


def load_seeds(con, cells):
    con.execute(f"""CREATE TABLE ct AS
      SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS c, v AS cv
      FROM (SELECT vec_id, v,
              ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS h
            FROM nd ORDER BY h, vec_id LIMIT {cells})""")
    rows = con.execute("SELECT c, cv FROM ct ORDER BY c").fetchall()
    return np.array([r[1] for r in rows], dtype=np.float64)


def assign_cells(con, seeds, id_table):
    """numpy argmax cell assignment for the vec_ids in `id_table`;
    returns (ids, cells, n_flagged) with flagged near-ties re-scored
    exactly in SQL."""
    rows = con.execute(
        f"SELECT nd.vec_id, nd.v FROM nd JOIN {id_table} s ON s.vec_id = nd.vec_id "
        f"ORDER BY nd.vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    vecs = np.array([r[1] for r in rows], dtype=np.float64)
    flagged_total = 0
    cells = np.empty(len(ids), dtype=np.int64)
    for lo in range(0, len(ids), 4096):
        d = vecs[lo:lo + 4096] @ seeds.T          # (chunk, nCells)
        best = np.argmax(d, axis=1)               # first max -> lowest c
        cells[lo:lo + 4096] = best
        dmax = d[np.arange(d.shape[0]), best]
        # near-tie guard: a row is only trustworthy if every seed whose
        # dot is within 1e-9 of the max is IDENTICAL to the argmax seed
        # (identical replicated seeds tie exactly under any summation
        # order and resolve to the lower index in both engines); any
        # other close seed could flip under reordering -> exact re-score
        n_close = (dmax[:, None] - d < 1e-9).sum(axis=1)
        for i in np.nonzero(n_close > 1)[0]:
            close = np.nonzero(dmax[i] - d[i] < 1e-9)[0]
            if not np.all(seeds[close] == seeds[best[i]]):
                flagged_total += 1
                vid = int(ids[lo + i])
                exact = con.execute(f"""SELECT ct.c FROM ct, nd a
                  WHERE a.vec_id = {vid}
                  ORDER BY list_reduce(list_transform(generate_series(1, {DIM}),
                    i -> a.v[i] * ct.cv[i]), (x, y) -> x + y) DESC, ct.c
                  LIMIT 1""").fetchone()[0]
                cells[lo + i] = exact
    return ids, cells, flagged_total


def main() -> int:
    out_dir, sf_dir, entry = sys.argv[1], sys.argv[2], sys.argv[3]
    slice_mod = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    con = connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet/*.parquet'")
    con.execute(f"CREATE VIEW outp AS SELECT * FROM '{out_dir}/{entry}.parquet/*.parquet'")
    n = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    n_out = con.execute("SELECT count(*) FROM outp").fetchone()[0]
    con.execute("""CREATE TABLE nd AS
      SELECT vec_id, v, sqrt(list_reduce(list_transform(generate_series(1, 64),
          i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings)""")
    print(f"{entry}: corpus n={n}, output rows={n_out}, slice_mod={slice_mod}")

    # ---- deterministic output sample (~1000 pairs) ----
    mod = max(1, n_out // 1000)
    con.execute(f"""CREATE TABLE samp AS
      SELECT * FROM outp WHERE hash(id_a, id_b) % {mod} = 0""")
    n_samp = con.execute("SELECT count(*) FROM samp").fetchone()[0]

    bad_cos = con.execute(f"""SELECT count(*) FROM samp s
      JOIN nd a ON a.vec_id = s.id_a JOIN nd b ON b.vec_id = s.id_b
      WHERE {FIXDOT} / (a.nrm * b.nrm) <> s.cos_sim""").fetchone()[0]
    below = con.execute(f"SELECT count(*) FROM samp WHERE cos_sim < {MIN_COS}").fetchone()[0]
    print(f"[sample] {n_samp} pairs: cosine bit-mismatches={bad_cos}, below-threshold={below}")

    results = {"entry": entry, "n": n, "output_rows": n_out, "sampled_pairs": n_samp,
               "sample_cos_bit_mismatches": bad_cos, "sample_below_threshold": below}

    if entry == "dedup_embed_auto":
        bits, nb = embed_params(n)
        print(f"geometry: bits={bits} bands={nb} (planes used={nb * bits})")
        sig = sig_expr(nb * bits)

        # [sample] band collision for each sampled pair
        con.execute("""CREATE TABLE samp_ids AS
          SELECT DISTINCT vec_id FROM (
            SELECT id_a AS vec_id FROM samp UNION SELECT id_b FROM samp)""")
        con.execute(f"""CREATE TABLE ssig AS
          SELECT nd.vec_id, {sig} AS sig
          FROM nd JOIN samp_ids USING (vec_id)""")
        no_collide = con.execute(f"""SELECT count(*) FROM samp s
          JOIN ssig sa ON sa.vec_id = s.id_a JOIN ssig sb ON sb.vec_id = s.id_b
          WHERE NOT EXISTS (SELECT 1 FROM generate_series(0, {nb - 1}) t(bi)
            WHERE (sa.sig >> CAST(bi * {bits} AS INT)) % (CAST(1 AS BIGINT) << {bits})
                = (sb.sig >> CAST(bi * {bits} AS INT)) % (CAST(1 AS BIGINT) << {bits}))
          """).fetchone()[0]
        print(f"[sample] pairs with NO band collision: {no_collide}")
        results["sample_predicate_violations"] = no_collide

        # [slice] full recompute on the slice
        con.execute(f"""CREATE TABLE slice_sig AS
          SELECT vec_id, {sig} AS sig FROM nd WHERE vec_id % {slice_mod} = 0""")
        n_slice = con.execute("SELECT count(*) FROM slice_sig").fetchone()[0]
        con.execute(f"""CREATE TABLE slice_expected AS
          SELECT cd.id_a, cd.id_b, {FIXDOT} / (a.nrm * b.nrm) AS cos_sim
          FROM (SELECT DISTINCT sa.vec_id AS id_a, sb.vec_id AS id_b
                FROM slice_sig sa, slice_sig sb, generate_series(0, {nb - 1}) t(bi)
                WHERE sa.vec_id < sb.vec_id
                  AND (sa.sig >> CAST(bi * {bits} AS INT)) % (CAST(1 AS BIGINT) << {bits})
                    = (sb.sig >> CAST(bi * {bits} AS INT)) % (CAST(1 AS BIGINT) << {bits})) cd
          JOIN nd a ON a.vec_id = cd.id_a JOIN nd b ON b.vec_id = cd.id_b
          WHERE {FIXDOT} / (a.nrm * b.nrm) >= {MIN_COS}""")
        con.execute(f"""CREATE TABLE slice_out AS
          SELECT id_a, id_b, cos_sim FROM outp
          WHERE id_a % {slice_mod} = 0 AND id_b % {slice_mod} = 0""")
        diff = con.execute("""SELECT
          (SELECT count(*) FROM (SELECT * FROM slice_expected EXCEPT SELECT * FROM slice_out)),
          (SELECT count(*) FROM (SELECT * FROM slice_out EXCEPT SELECT * FROM slice_expected)),
          (SELECT count(*) FROM slice_out)""").fetchone()
        print(f"[slice] {n_slice} vectors, {diff[2]} output pairs in slice: "
              f"missing={diff[0]} extra={diff[1]}")
        results.update({"slice_vectors": n_slice, "slice_output_pairs": diff[2],
                        "slice_missing": diff[0], "slice_extra": diff[1]})
        ok = bad_cos == 0 and below == 0 and no_collide == 0 and diff[0] == 0 and diff[1] == 0

    elif entry == "dedup_semantic_auto":
        cells = max(1, min(65536, (n + 63) // 64))
        print(f"geometry: cells={cells}")
        seeds = load_seeds(con, cells)

        # [sample] both endpoints must assign to the reported cell
        con.execute("""CREATE TABLE samp_ids AS
          SELECT DISTINCT vec_id FROM (
            SELECT id_a AS vec_id FROM samp UNION SELECT id_b FROM samp)""")
        ids, cc, flagged_s = assign_cells(con, seeds, "samp_ids")
        con.execute("CREATE TABLE samp_cell (vec_id BIGINT, cell INT)")
        con.executemany("INSERT INTO samp_cell VALUES (?, ?)",
                        [(int(i), int(c)) for i, c in zip(ids, cc)])
        bad_cell = con.execute("""SELECT count(*) FROM samp s
          JOIN samp_cell ca ON ca.vec_id = s.id_a
          JOIN samp_cell cb ON cb.vec_id = s.id_b
          WHERE ca.cell <> s.cell OR cb.cell <> s.cell""").fetchone()[0]
        print(f"[sample] endpoint-cell mismatches: {bad_cell} (near-tie re-scored: {flagged_s})")
        results["sample_predicate_violations"] = bad_cell
        results["sample_near_ties_rescored"] = flagged_s

        # [slice] full recompute on the slice
        con.execute(f"""CREATE TABLE slice_ids AS
          SELECT vec_id FROM nd WHERE vec_id % {slice_mod} = 0""")
        sids, scells, flagged = assign_cells(con, seeds, "slice_ids")
        con.execute("CREATE TABLE slice_cell (vec_id BIGINT, cell INT)")
        con.executemany("INSERT INTO slice_cell VALUES (?, ?)",
                        [(int(i), int(c)) for i, c in zip(sids, scells)])
        con.execute(f"""CREATE TABLE slice_expected AS
          SELECT pr.id_a, pr.id_b, pr.cell, {FIXDOT} / (a.nrm * b.nrm) AS cos_sim
          FROM (SELECT ca.vec_id AS id_a, cb.vec_id AS id_b, ca.cell
                FROM slice_cell ca JOIN slice_cell cb
                  ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id) pr
          JOIN nd a ON a.vec_id = pr.id_a JOIN nd b ON b.vec_id = pr.id_b
          WHERE {FIXDOT} / (a.nrm * b.nrm) >= {MIN_COS}""")
        con.execute(f"""CREATE TABLE slice_out AS
          SELECT id_a, id_b, cell, cos_sim FROM outp
          WHERE id_a % {slice_mod} = 0 AND id_b % {slice_mod} = 0""")
        diff = con.execute("""SELECT
          (SELECT count(*) FROM (SELECT * FROM slice_expected EXCEPT SELECT * FROM slice_out)),
          (SELECT count(*) FROM (SELECT * FROM slice_out EXCEPT SELECT * FROM slice_expected)),
          (SELECT count(*) FROM slice_out)""").fetchone()
        print(f"[slice] {len(sids)} vectors, {diff[2]} output pairs in slice: "
              f"missing={diff[0]} extra={diff[1]} (near-tie re-scored: {flagged})")
        results.update({"slice_vectors": len(sids), "slice_output_pairs": diff[2],
                        "slice_missing": diff[0], "slice_extra": diff[1],
                        "slice_near_ties_rescored": flagged})
        ok = bad_cos == 0 and below == 0 and bad_cell == 0 and diff[0] == 0 and diff[1] == 0
    else:
        print(f"unknown entry {entry}")
        return 2

    results["verdict"] = "PASS" if ok else "FAIL"
    print(json.dumps(results))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
